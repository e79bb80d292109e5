"""Name -> class registries used to wire YAML `type:` strings to implementations.

Capability parity with the reference registry system
(/root/reference/basicsr/utils/registry.py:4-83): decorator registration,
duplicate detection, and lookup with a helpful error message. The TPU rebuild
keeps the same four registries (DATASET, ARCH, MODEL, LOSS) plus METRIC.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterator, Optional, Tuple


class Registry:
    """A string -> object mapping supporting decorator-style registration.

    Example:
        >>> ARCH_REGISTRY = Registry('arch')
        >>> @ARCH_REGISTRY.register()
        ... class FeMaSRNet: ...
        >>> ARCH_REGISTRY.get('FeMaSRNet')
    """

    def __init__(self, name: str):
        self._name = name
        self._obj_map: Dict[str, Any] = {}

    def _do_register(self, name: str, obj: Any) -> None:
        if name in self._obj_map:
            raise KeyError(
                f"An object named '{name}' was already registered in "
                f"'{self._name}' registry!")
        self._obj_map[name] = obj

    def register(self, obj: Optional[Any] = None, name: Optional[str] = None) -> Callable:
        """Register `obj` (or use as decorator when obj is None)."""
        if obj is None:
            def deco(func_or_class: Any) -> Any:
                self._do_register(name or func_or_class.__name__, func_or_class)
                return func_or_class
            return deco
        self._do_register(name or obj.__name__, obj)
        return obj

    def get(self, name: str) -> Any:
        ret = self._obj_map.get(name)
        if ret is None:
            raise KeyError(
                f"No object named '{name}' found in '{self._name}' registry! "
                f"Available: {sorted(self._obj_map)}")
        return ret

    def __contains__(self, name: str) -> bool:
        return name in self._obj_map

    def __iter__(self) -> Iterator[Tuple[str, Any]]:
        return iter(self._obj_map.items())

    def keys(self):
        return self._obj_map.keys()


DATASET_REGISTRY = Registry('dataset')
ARCH_REGISTRY = Registry('arch')
MODEL_REGISTRY = Registry('model')
LOSS_REGISTRY = Registry('loss')
METRIC_REGISTRY = Registry('metric')
