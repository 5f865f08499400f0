"""Activation registry (parity with /root/reference/models/layers/act.py:15-30)."""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp


def hardswish(x):
    return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def relu6(x):
    return jnp.clip(x, 0.0, 6.0)


def star_relu(x, scale: float = 0.8944, bias: float = -0.4472):
    """StarReLU from MetaFormer (reference metaformer.py:224-242): s*relu(x)^2+b."""
    r = jax.nn.relu(x)
    return scale * r * r + bias


ACTIVATIONS: dict[str, Callable] = {
    "relu": jax.nn.relu,
    "relu6": relu6,
    "hswish": hardswish,
    "hardswish": hardswish,
    "silu": jax.nn.silu,
    "swish": jax.nn.silu,
    "gelu": partial(jax.nn.gelu, approximate=True),
    "gelu_exact": partial(jax.nn.gelu, approximate=False),
    "sigmoid": jax.nn.sigmoid,
    "hsigmoid": jax.nn.hard_sigmoid,
    "star_relu": star_relu,
    "identity": lambda x: x,
}


def build_act(name: Optional[str]) -> Optional[Callable]:
    """Name -> activation fn; None/'' -> None (mirrors build_act act.py:24-30)."""
    if not name:
        return None
    key = name.lower()
    if key not in ACTIVATIONS:
        raise KeyError(f"unknown activation {name!r}; available: {sorted(ACTIVATIONS)}")
    return ACTIVATIONS[key]
