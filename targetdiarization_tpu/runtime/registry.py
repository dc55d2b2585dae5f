"""Model registry with checkpoint-embedded polymorphic loading.

Equivalent capability to the reference's look2hear registry
(look2hear/models/__init__.py:34-66 `register_model`/`get`) and
`BaseModel.from_pretrain` name dispatch (base_model.py:52-64): the call
site never needs to know the concrete class stored in a checkpoint.
"""

from __future__ import annotations

_REGISTRY: dict = {}


def register_model(cls=None, *, name: str | None = None):
    """Class decorator: @register_model or @register_model(name=...)."""

    def _register(c):
        key = name or c.__name__
        if key in _REGISTRY and _REGISTRY[key] is not c:
            raise ValueError(f"duplicate model registration: {key}")
        _REGISTRY[key] = c
        return c

    if cls is None:
        return _register
    return _register(cls)


def get_model_cls(name: str):
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown model {name!r}; registered: {sorted(_REGISTRY)}"
        ) from None


def list_models() -> list:
    return sorted(_REGISTRY)


def from_pretrained(path: str):
    """Load (model, params) from a checkpoint dir, dispatching on the
    checkpoint's own `model_name` — the class named at the call site is
    irrelevant, mirroring the reference behavior where
    `ConvTasNet.from_pretrain(mossformer2_ckpt)` yields a MossFormer2
    (SURVEY.md §2.2)."""
    from .params import load_checkpoint, upgrade_scan_layout

    params, meta = load_checkpoint(path)
    cls = get_model_cls(meta["model_name"])
    model = cls(**meta.get("model_args", {}))
    params = upgrade_scan_layout(meta["model_name"], params)
    return model, params
