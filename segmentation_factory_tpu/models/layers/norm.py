"""Norm layers + registry.

TPU-native counterpart of /root/reference/models/layers/norm.py. All feature
maps are NHWC, so "LayerNorm2d" (channels-first LN in the reference,
norm.py:19-25) is just LayerNorm over the trailing channel axis here — the
layout that XLA prefers on TPU.

BatchNorm supports cross-replica moment syncing (SyncBN) by passing
``axis_name='data'`` — flax's BatchNorm pmeans batch statistics over that
mesh axis inside the jitted step, replacing torch SyncBN process groups.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax.numpy as jnp


class BatchNorm(nn.Module):
    """BatchNorm2d equivalent over NHWC with optional cross-replica sync.

    The reference relies on per-replica torch BatchNorm (README.md:64-65 warns
    batch>=2 per GPU); set ``axis_name`` to sync moments over the mesh.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = None
    axis_name: Optional[str] = None
    frozen: bool = False  # torchvision FrozenBatchNorm2d semantics

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.frozen:
            # same scope name as the unfrozen path, so param/stat trees (and
            # converted checkpoints) are interchangeable
            return FrozenBatchNorm(
                epsilon=self.epsilon, dtype=self.dtype, name="BatchNorm_0"
            )(x)
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.epsilon,
            dtype=self.dtype,
            axis_name=self.axis_name if train else None,
        )(x)


class FrozenBatchNorm(nn.Module):
    """torchvision FrozenBatchNorm2d equivalent (ref resnet.py:5): running
    statistics are never updated AND the affine scale/bias receive no
    gradients (lax.stop_gradient; being 1-D they are also excluded from
    weight decay by the timm mask). Parameter/stat tree matches
    nn.BatchNorm (scale/bias + mean/var), so converted checkpoints load
    either way."""

    momentum: float = 0.9  # unused; kept for signature parity
    epsilon: float = 1e-5
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        import jax

        c = x.shape[-1]
        scale = jax.lax.stop_gradient(
            self.param("scale", nn.initializers.ones, (c,))
        )
        bias = jax.lax.stop_gradient(
            self.param("bias", nn.initializers.zeros, (c,))
        )
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        ).value
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        ).value
        inv = (scale / jnp.sqrt(var + self.epsilon)).astype(x.dtype)
        return x * inv + (bias - mean * scale / jnp.sqrt(var + self.epsilon)).astype(
            x.dtype
        )


class LayerNorm(nn.Module):
    """LayerNorm over the channel (last) axis of NHWC / NLC tensors."""

    epsilon: float = 1e-6
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        return nn.LayerNorm(epsilon=self.epsilon, dtype=self.dtype)(x)


class GroupNorm(nn.Module):
    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        return nn.GroupNorm(
            num_groups=self.num_groups, epsilon=self.epsilon, dtype=self.dtype
        )(x)


class GRN(nn.Module):
    """Global Response Normalization (ConvNeXtV2, reference convnextv2.py:68-80).

    NHWC: gx = ||x||_2 over (H, W) per channel; nx = gx / mean_c(gx).
    """

    epsilon: float = 1e-6
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.zeros, (dim,))
        beta = self.param("beta", nn.initializers.zeros, (dim,))
        xf = x.astype(jnp.float32)
        gx = jnp.sqrt(jnp.sum(xf * xf, axis=(1, 2), keepdims=True) + 1e-12)
        nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + self.epsilon)
        out = gamma * (xf * nx) + beta + xf
        return out.astype(x.dtype)


NORMS: dict[str, Callable] = {
    "bn": BatchNorm,
    "bn2d": BatchNorm,
    # under jit with the batch sharded over 'data', plain BatchNorm already
    # computes GLOBAL batch moments (XLA reduces across devices) — i.e. the
    # default IS SyncBN, unlike torch's per-replica BN. The axis_name variant
    # exists for shard_map contexts where reductions are per-shard.
    "sync_bn": BatchNorm,
    "sync_bn_shardmap": lambda **kw: BatchNorm(axis_name="data", **kw),
    "ln": LayerNorm,
    "ln2d": LayerNorm,  # NHWC: channel-last LN == the reference's LayerNorm2d
    "gn": GroupNorm,
    "frozen_bn": lambda **kw: BatchNorm(frozen=True, **kw),
}


import contextlib


@contextlib.contextmanager
def set_norm_eps(eps: float):
    """Override the epsilon of EVERY norm layer built inside the context.

    Equivalent of the reference's ``set_norm_eps(model, eps)``
    (/root/reference/models/layers/norm.py:138-142), which mutates
    ``m.eps`` on all norm modules in place — used for finetune/export
    numerical robustness. Flax modules are immutable and reconstructed on
    every ``apply``, so the TPU-native form is a construction-time override:
    wrap the TRACE (an ``apply``, a ``jax.jit`` compile, or an export) —

        with set_norm_eps(1e-3):
            y = model.apply(variables, x, train=False)
            # or: exported = export_model(model, variables, ...)

    Anything compiled inside the context bakes the new eps; programs
    compiled outside are unaffected (do not flip eps between calls of one
    already-jitted function — jit caches by shape, not by this override).
    Covers raw ``nn.LayerNorm``/``nn.BatchNorm``/``nn.GroupNorm``/
    ``nn.RMSNorm`` construction sites as well as the wrappers above.
    """
    global _EPS_OVERRIDE
    classes = [nn.LayerNorm, nn.BatchNorm, nn.GroupNorm]
    if hasattr(nn, "RMSNorm"):
        classes.append(nn.RMSNorm)
    classes += [BatchNorm, FrozenBatchNorm, LayerNorm, GroupNorm, GRN]
    originals = {}
    prev_override = _EPS_OVERRIDE
    try:
        for c in classes:
            orig = c.__post_init__
            originals[c] = orig

            def patched(self, _orig=orig):
                _orig(self)
                if hasattr(self, "epsilon"):
                    object.__setattr__(self, "epsilon", eps)

            c.__post_init__ = patched
        _EPS_OVERRIDE = eps
        yield
    finally:
        _EPS_OVERRIDE = prev_override
        for c, orig in originals.items():
            c.__post_init__ = orig


_EPS_OVERRIDE: Optional[float] = None


def current_norm_eps(default: float) -> float:
    """The eps a norm built RIGHT NOW would get: the set_norm_eps() override
    if one is active, else ``default``. For fused kernels that apply the
    normalization themselves (ops/pallas_head_tail.py) and therefore never
    construct a norm module for the patched __post_init__ to adjust."""
    return _EPS_OVERRIDE if _EPS_OVERRIDE is not None else default


def build_norm(name: Optional[str], **kwargs) -> Optional[nn.Module]:
    """Name -> norm module instance; None -> None (ref norm.py:36-46)."""
    if not name:
        return None
    key = name.lower()
    if key not in NORMS:
        raise KeyError(f"unknown norm {name!r}; available: {sorted(NORMS)}")
    return NORMS[key](**kwargs)
