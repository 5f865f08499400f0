"""Name -> factory registries for backbones and heads.

Replaces the reference's string-``eval`` factory (models/build_models.py:27-29)
with explicit dict registries: no eval, typo-safe, introspectable.

Each backbone entry is a callable ``(**kwargs) -> (flax.linen.Module, channels)``
where ``channels`` is the list of feature-pyramid channel widths the module's
``__call__`` returns (mirrors the reference's ``.channels`` attribute protocol,
e.g. /root/reference/models/backbones/mit.py:176).

Each head entry is a callable
``(channels, num_classes, embed_dim, **kwargs) -> flax.linen.Module``.
"""

from __future__ import annotations

from typing import Callable, Dict

BACKBONES: Dict[str, Callable] = {}
HEADS: Dict[str, Callable] = {}


def register_backbone(name: str):
    """Decorator: register a backbone factory under ``name`` (lowercase)."""

    def deco(fn: Callable) -> Callable:
        key = name.lower()
        if key in BACKBONES:
            raise KeyError(f"backbone {key!r} already registered")
        BACKBONES[key] = fn
        return fn

    return deco


def register_head(name: str):
    """Decorator: register a decode-head factory under ``name`` (lowercase)."""

    def deco(fn: Callable) -> Callable:
        key = name.lower()
        if key in HEADS:
            raise KeyError(f"head {key!r} already registered")
        HEADS[key] = fn
        return fn

    return deco


def _ensure_zoo_imported() -> None:
    """Import the model zoo packages for their registration side effects."""
    import segmentation_factory_tpu.models.backbones  # noqa: F401
    import segmentation_factory_tpu.models.heads  # noqa: F401


def get_backbone(name: str, **kwargs):
    _ensure_zoo_imported()
    key = name.lower()
    if key not in BACKBONES:
        raise KeyError(
            f"unknown backbone {name!r}; available: {sorted(BACKBONES)}"
        )
    return BACKBONES[key](**kwargs)


def get_head(name: str, **kwargs):
    _ensure_zoo_imported()
    key = name.lower()
    if key not in HEADS:
        raise KeyError(f"unknown head {name!r}; available: {sorted(HEADS)}")
    return HEADS[key](**kwargs)
