"""Global name -> class registry.

TPU-native analogue of the reference's registry
(reference: src/lavis/common/registry.py:9-329): a plain mapping from
(kind, name) to classes/callables so that YAML configs and CLIs can resolve
models, processors, datasets and lr schedules by name. Unlike the reference we
keep one flat class with explicit kinds instead of one decorator per kind.
"""

from __future__ import annotations

from typing import Any, Callable, Dict


class Registry:
    KINDS = (
        "model",
        "processor",
        "dataset",
        "lr_schedule",
        "task",
        "runner",
        "path",
    )

    def __init__(self) -> None:
        self._maps: Dict[str, Dict[str, Any]] = {k: {} for k in self.KINDS}

    def _register(self, kind: str, name: str, obj: Any, override: bool = False) -> Any:
        table = self._maps[kind]
        if name in table and not override and table[name] is not obj:
            raise KeyError(f"{kind} '{name}' already registered to {table[name]!r}")
        table[name] = obj
        return obj

    def register(self, kind: str, name: str, *, override: bool = False) -> Callable[[Any], Any]:
        """Decorator: ``@registry.register("model", "blip2_cir_align_prompt")``."""
        if kind not in self._maps:
            raise KeyError(f"unknown registry kind '{kind}' (have {list(self._maps)})")

        def deco(obj: Any) -> Any:
            return self._register(kind, name, obj, override=override)

        return deco

    # convenience decorators mirroring the reference API surface
    def register_model(self, name: str, **kw: Any) -> Callable[[Any], Any]:
        return self.register("model", name, **kw)

    def register_processor(self, name: str, **kw: Any) -> Callable[[Any], Any]:
        return self.register("processor", name, **kw)

    def register_dataset(self, name: str, **kw: Any) -> Callable[[Any], Any]:
        return self.register("dataset", name, **kw)

    def register_lr_schedule(self, name: str, **kw: Any) -> Callable[[Any], Any]:
        return self.register("lr_schedule", name, **kw)

    def get(self, kind: str, name: str) -> Any:
        try:
            return self._maps[kind][name]
        except KeyError:
            raise KeyError(
                f"no {kind} named '{name}'; registered: {sorted(self._maps[kind])}"
            ) from None

    def get_model_class(self, name: str) -> Any:
        return self.get("model", name)

    def get_processor_class(self, name: str) -> Any:
        return self.get("processor", name)

    def get_dataset_class(self, name: str) -> Any:
        return self.get("dataset", name)

    def get_lr_schedule(self, name: str) -> Any:
        return self.get("lr_schedule", name)

    def list(self, kind: str) -> list[str]:
        return sorted(self._maps[kind])

    # simple key/value paths (cache dirs etc.), mirroring registry paths in
    # the reference (src/lavis/common/registry.py mapping + configs/default.yaml)
    def register_path(self, name: str, path: str) -> None:
        self._maps["path"][name] = path

    def get_path(self, name: str, default: str | None = None) -> str | None:
        return self._maps["path"].get(name, default)


registry = Registry()
