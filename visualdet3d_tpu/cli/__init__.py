"""Command-line entry points (console scripts in pyproject.toml).

TPU-native re-design of the reference's ``scripts/`` launchers
(reference scripts/train.py, eval.py, imdb_precompute_3d.py, ...).
Thin ``scripts/*.py`` shims remain at the repo root for uninstalled use.

Importing this package honors ``VD3D_PLATFORM`` (e.g. ``cpu``) so the
CLIs can run on hosts where a preloaded sitecustomize pins
``JAX_PLATFORMS`` before argv is seen; ``jax.config.update`` works as
long as no backend has been touched yet.
"""
import os as _os

_platform = _os.environ.get('VD3D_PLATFORM')
if _platform:
    import jax as _jax
    _jax.config.update('jax_platforms', _platform)
