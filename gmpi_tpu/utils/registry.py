"""Component registry — named factories for models / datasets / renderers
(``gmpi/utils/registry.py`` analogue, habitat-style singleton)."""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional


class Registry:
    def __init__(self):
        self._groups: Dict[str, Dict[str, Any]] = {}

    def register(self, group: str, name: Optional[str] = None):
        def deco(obj):
            key = name or getattr(obj, "__name__", str(obj))
            self._groups.setdefault(group, {})[key] = obj
            return obj

        return deco

    def get(self, group: str, name: str):
        try:
            return self._groups[group][name]
        except KeyError:
            known = sorted(self._groups.get(group, {}))
            raise KeyError(f"{group}/{name} not registered; known: {known}") from None

    def list(self, group: str):
        return sorted(self._groups.get(group, {}))


registry = Registry()

# convenience decorators matching the reference's API shape
register_model = lambda name=None: registry.register("model", name)
register_dataset = lambda name=None: registry.register("dataset", name)
register_renderer = lambda name=None: registry.register("renderer", name)
