"""Pytest config: force an 8-virtual-device CPU backend before jax imports.

This is the TPU-native answer to "test multi-device without a cluster"
(SURVEY.md §4): the data-parallel mesh, collectives, and pjit shardings are
exercised on virtual CPU devices; numerics match TPU up to float tolerance.
"""
import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()
# keep test compile times sane
os.environ.setdefault('JAX_ENABLE_X64', '0')
