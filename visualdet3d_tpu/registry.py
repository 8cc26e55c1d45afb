"""Registry: name -> class/function maps powering the plugin architecture.

The public API mirrors the reference framework's registry pattern
(reference: visualDet3D/networks/utils/registry.py:1-50): config files carry
*names*, entry points resolve names to classes at runtime, and registration
happens at import time via the ``@X_DICT.register_module`` decorator.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Iterator, Optional


class Registry:
    """A simple name -> object registry.

    Usage::

        MY_DICT = Registry('my')

        @MY_DICT.register_module
        class Foo: ...

        @MY_DICT.register_module(name='bar_alias')
        def bar(): ...

        MY_DICT['Foo']  # -> Foo
    """

    def __init__(self, name: str = ''):
        self.name = name
        self._module_dict: Dict[str, Any] = {}

    def __len__(self) -> int:
        return len(self._module_dict)

    def __contains__(self, key: str) -> bool:
        return key in self._module_dict

    def __getitem__(self, key: str) -> Any:
        if key not in self._module_dict:
            raise KeyError(
                f"'{key}' is not registered in registry '{self.name}'. "
                f"Available: {sorted(self._module_dict)}")
        return self._module_dict[key]

    def __iter__(self) -> Iterator[str]:
        return iter(self._module_dict)

    def keys(self):
        return self._module_dict.keys()

    def get(self, key: str, default: Any = None) -> Any:
        return self._module_dict.get(key, default)

    def _register(self, module: Any, name: Optional[str] = None, force: bool = False) -> Any:
        key = name if name is not None else module.__name__
        if not force and key in self._module_dict:
            raise KeyError(f"'{key}' already registered in registry '{self.name}'")
        self._module_dict[key] = module
        return module

    def register_module(self, module: Any = None, *, name: Optional[str] = None,
                        force: bool = False) -> Callable:
        # used as a plain decorator: @REG.register_module
        if module is not None:
            return self._register(module, name=name, force=force)

        # used with arguments: @REG.register_module(name='x')
        def _decorator(mod):
            return self._register(mod, name=name, force=force)
        return _decorator

    def build(self, cfg, *args, **kwargs) -> Any:
        """Instantiate ``cfg.type_name`` with ``cfg.keywords`` (if present)."""
        type_name = cfg['type_name'] if 'type_name' in cfg else cfg['name']
        keywords = dict(cfg.get('keywords', {}))
        keywords.update(kwargs)
        return self[type_name](*args, **keywords)


# The six global registries forming the de-facto public API surface
# (reference: visualDet3D/networks/utils/registry.py:45-50).
DATASET_DICT = Registry('datasets')
BACKBONE_DICT = Registry('backbones')
DETECTOR_DICT = Registry('detectors')
PIPELINE_DICT = Registry('pipelines')
AUGMENTATION_DICT = Registry('augmentations')
SAMPLER_DICT = Registry('samplers')
