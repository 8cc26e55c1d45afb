"""Pytest config: force an 8-virtual-device CPU backend before jax imports.

This is the TPU-native answer to "test multi-device without a cluster"
(SURVEY.md §4): the data-parallel mesh, collectives, and pjit shardings are
exercised on virtual CPU devices; numerics match TPU up to float tolerance.
Tests must be fast and hermetic, so we override any ambient JAX_PLATFORMS
(e.g. the axon TPU tunnel) unconditionally.
"""
import os
import sys

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()
# keep test compile times sane
os.environ.setdefault('JAX_ENABLE_X64', '0')

# In this image jax is pre-imported at interpreter startup (sitecustomize),
# so JAX_PLATFORMS from the ambient env (e.g. the axon TPU tunnel) is already
# baked into jax.config — override it directly before any backend is created.
if 'jax' in sys.modules:
    import jax
    jax.config.update('jax_platforms', 'cpu')
    assert not jax._src.xla_bridge._backends, \
        'a JAX backend was initialised before conftest could select CPU'
