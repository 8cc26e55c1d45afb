"""Config system: attribute-dicts + executable-Python config files.

Mirrors the reference's user-facing config API (reference:
visualDet3D/utils/utils.py:137-152 ``cfg_from_file`` and the
``config/*_example`` files), without depending on the ``easydict`` package:
config files are plain Python defining a module-level ``cfg`` EasyDict.
"""
from __future__ import annotations

import importlib.util
import os
import sys
from typing import Any


class EasyDict(dict):
    """dict subclass with attribute access; recursively wraps nested dicts."""

    def __init__(self, d=None, **kwargs):
        super().__init__()
        if d is None:
            d = {}
        d = dict(d)
        d.update(kwargs)
        for k, v in d.items():
            self[k] = v

    @staticmethod
    def _wrap(value: Any) -> Any:
        if isinstance(value, dict) and not isinstance(value, EasyDict):
            return EasyDict(value)
        if isinstance(value, (list, tuple)):
            wrapped = [EasyDict._wrap(v) for v in value]
            return type(value)(wrapped) if isinstance(value, tuple) else wrapped
        return value

    def __setitem__(self, key, value):
        super().__setitem__(key, EasyDict._wrap(value))

    def __setattr__(self, key, value):
        self[key] = value

    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def __delattr__(self, key):
        try:
            del self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def update(self, other=None, **kwargs):  # keep wrapping on update
        if other is not None:
            for k, v in dict(other).items():
                self[k] = v
        for k, v in kwargs.items():
            self[k] = v

    def copy(self):
        return EasyDict(self)


def cfg_from_file(cfg_filename: str) -> EasyDict:
    """Import a Python config file and return its module-level ``cfg``.

    The file is imported by path (no tempfile round-trip needed), so configs
    can live anywhere. The loaded module is not cached in ``sys.modules``.
    """
    assert cfg_filename.endswith('.py'), f'config must be a .py file, got {cfg_filename}'
    cfg_filename = os.path.abspath(cfg_filename)
    module_name = '_visualdet3d_cfg_' + os.path.splitext(os.path.basename(cfg_filename))[0]
    spec = importlib.util.spec_from_file_location(module_name, cfg_filename)
    module = importlib.util.module_from_spec(spec)
    # make the module importable during its own exec (for dataclasses etc.)
    sys.modules[module_name] = module
    try:
        spec.loader.exec_module(module)
        cfg = getattr(module, 'cfg')
    finally:
        sys.modules.pop(module_name, None)
    assert isinstance(cfg, dict), 'config file must define a dict-like `cfg`'
    if not isinstance(cfg, EasyDict):
        cfg = EasyDict(cfg)
    return cfg
