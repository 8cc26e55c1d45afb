"""Make the repo importable when running scripts directly.

Also honors ``VD3D_PLATFORM`` (e.g. ``cpu``) so the CLIs can run on hosts
where a preloaded sitecustomize pins ``JAX_PLATFORMS`` before argv is seen;
``jax.config.update`` works as long as no backend has been touched yet.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_platform = os.environ.get('VD3D_PLATFORM')
if _platform:
    import jax
    jax.config.update('jax_platforms', _platform)
