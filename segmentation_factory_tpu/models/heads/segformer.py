"""SegFormer all-MLP decode head, TPU-native.

Parity with /root/reference/models/heads/segformer.py:32-58: per-level linear
projection to ``embed_dim``, bilinear upsample of all levels to the 1/4-scale
map, channel concat (reversed order, top level first), 1x1 conv+BN+ReLU fuse,
dropout, 1x1 classifier. NHWC: the per-level "MLP" is a Dense over the channel
axis — a single MXU matmul per level.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from segmentation_factory_tpu.models.layers import (
    DenseParams as _DenseParams,
    resize_like,
)
from segmentation_factory_tpu.models.layers.norm import build_norm
from segmentation_factory_tpu.registry import register_head


class _Conv1x1Kernel(nn.Module):
    """Bare (1,1,in,out) conv kernel param — path-compatible with the
    ``Conv_0`` inside ConvModule so converted/old checkpoints load as-is."""

    in_ch: int
    out_ch: int

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, 1, self.in_ch, self.out_ch),
        )


class _BNRawInner(nn.Module):
    """Raw BatchNorm scale/bias + running stats with nn.BatchNorm's exact
    variable tree — for the fused tail kernel, which applies the
    normalization itself (ops/pallas_head_tail.py)."""

    ch: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones_init(), (self.ch,))
        b = self.param("bias", nn.initializers.zeros_init(), (self.ch,))
        m = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.ch,), jnp.float32)
        )
        v = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.ch,), jnp.float32)
        )
        return s, b, m, v


class _BNRaw(nn.Module):
    """Wrapper matching layers.norm.BatchNorm's scope nesting
    (linear_fuse/BatchNorm_0/BatchNorm_0/...), so fused-tail and classic
    paths share one variable tree."""

    ch: int

    @nn.compact
    def __call__(self):
        return _BNRawInner(self.ch, name="BatchNorm_0")()


class _LevelFuse(nn.Module):
    """Per-level projection + fuse 1x1 conv, folded and computed BEFORE
    upsampling.

    Two linear maps back to back commute and compose:

    1. The 1x1 fuse conv commutes with bilinear resize (both linear; one
       mixes channels, the other pixels), so
       ``conv1x1(concat_i(resize(y_i)))  ==  sum_i resize(y_i @ W_i)``.
    2. Each level's projection (``linear_ci``: C_i -> E) then composes with
       its fuse slice (E -> E) into ONE effective (C_i -> E) matmul:
       ``(f K + b) W  ==  f (K W) + b W`` — the (K W) product costs a
       negligible (C_i, E) @ (E, E) per step.

    Together the head's big matmuls shrink from
    ``sum_i N_i*C_i*E + (sum_i N_i)*E*E + 4N_1*4E*E`` to
    ``sum_i N_i*C_i*E`` (~25 GF instead of ~232 GF forward for B2 at 512²),
    and neither the (B, H/4, W/4, 4E) concat nor the per-level E-wide
    pre-fuse maps ever reach HBM. Parameter tree is identical to the
    unfused formulation (linear_ci Dense + Conv_0/kernel (1,1,4E,E) +
    BatchNorm_0), so converters and checkpoints are unaffected."""

    features: int
    norm: str = "bn"
    dtype: Any = None
    fused: bool = True

    @nn.compact
    def __call__(self, levels, projs, target, train: bool = False,
                 tail=None):
        # levels/projs in concat order (top level first); projs[i] = (K, b)
        e = self.features
        kernel = _Conv1x1Kernel(len(levels) * e, e, name="Conv_0")()
        w = kernel[0, 0]  # (L*E, E)
        dt = self.dtype or w.dtype
        if not self.fused:
            # reference formulation (ref segformer.py:47-55): project each
            # level to E, upsample, concat 4E-wide, then the fuse matmul at
            # stride-4 resolution. Numerically equal to the fold (both are
            # compositions of the same linear maps); kept as the FLOP-count
            # anchor for bench.py's baseline derivation and as the fold's
            # correctness oracle (tests/test_heads.py).
            ups = []
            for y, (pk, pb) in zip(levels, projs):
                z = y.astype(dt) @ pk.astype(dt) + pb.astype(dt)
                ups.append(resize_like(z, target))
            acc = jnp.concatenate(ups, axis=-1) @ w.astype(dt)
        else:
            from segmentation_factory_tpu.ops.pallas_resize_sum import (
                resize_sum,
            )

            zs = []
            for i, (y, (pk, pb)) in enumerate(zip(levels, projs)):
                wi = w[i * e : (i + 1) * e].astype(jnp.float32)
                m = (pk.astype(jnp.float32) @ wi).astype(dt)  # (C_i, E)
                c = (pb.astype(jnp.float32) @ wi).astype(dt)  # (E,)
                zs.append(y.astype(dt) @ m + c)
            # single fused upsample+sum pass on TPU (ops/pallas_resize_sum);
            # XLA composition elsewhere
            acc = resize_sum(zs)
        if tail is not None:
            # fused tail (train, norm=bn): BN+ReLU+channel-dropout+classifier
            # in ONE kernel pass over the fuse tensor, with the BN batch
            # stats and running-stat update handled here
            # (ops/pallas_head_tail.py). tail = (dmask, wcls, bcls).
            from segmentation_factory_tpu.ops.pallas_head_tail import (
                head_tail_train,
            )

            sc, bi, ra_m, ra_v = _BNRaw(
                self.features, name="BatchNorm_0")()
            dmask, wcls, bcls = tail
            # the fused kernel applies the BN itself, so honor any active
            # set_norm_eps() override and the norm class's momentum default
            # here (a constructed norm module would pick these up via
            # __post_init__; the kernel path must ask explicitly)
            from segmentation_factory_tpu.models.layers.norm import (
                NORMS,
                current_norm_eps,
            )

            norm_cls = NORMS[self.norm]
            eps = current_norm_eps(getattr(norm_cls, "epsilon", 1e-5))
            mom = getattr(norm_cls, "momentum", 0.9)
            logits, mu, var = head_tail_train(
                acc, sc, bi, dmask, wcls, bcls, eps)
            if self.is_mutable_collection("batch_stats"):
                ra_m.value = mom * ra_m.value + (1.0 - mom) * mu
                ra_v.value = mom * ra_v.value + (1.0 - mom) * var
            return logits
        acc = build_norm(self.norm, dtype=self.dtype)(acc, train=train)
        return nn.relu(acc)


class SegFormerHead(nn.Module):
    channels: Sequence[int]
    num_classes: int
    embed_dim: int = 256
    dropout: float = 0.1
    norm: str = "bn"
    dtype: Any = jnp.bfloat16
    # fused=False runs the reference dataflow (project -> upsample -> concat
    # -> fuse conv) with the SAME param tree; see _LevelFuse
    fused: bool = True

    @nn.compact
    def __call__(self, feats, train: bool = False):
        from segmentation_factory_tpu.ops.pallas_head_tail import (
            shape_ok as _tail_shape_ok,
            use_pallas_default as _tail_on,
        )
        from segmentation_factory_tpu.parallel.mesh import tp_mesh_active

        assert len(feats) == len(self.channels)
        projs = [
            _DenseParams(c, self.embed_dim, name=f"linear_c{i + 1}")()
            for i, c in enumerate(self.channels)
        ]
        fuse = _LevelFuse(
            self.embed_dim, norm=self.norm, dtype=self.dtype,
            fused=self.fused, name="linear_fuse"
        )
        b, th, tw = feats[0].shape[0], feats[0].shape[1], feats[0].shape[2]
        use_tail = (
            train
            and self.fused
            and self.norm == "bn"
            and _tail_on()
            and not tp_mesh_active()
            and _tail_shape_ok((b, th, tw, self.embed_dim), self.num_classes)
        )
        if use_tail:
            # fused tail: classifier params declared raw (same tree as the
            # nn.Dense below); channel-dropout mask generated here with the
            # same semantics as nn.Dropout(broadcast_dims=(1, 2))
            wp, bp = _DenseParams(
                self.embed_dim, self.num_classes, name="linear_pred")()
            if self.dropout > 0.0:
                keep = 1.0 - self.dropout
                mask = jax.random.bernoulli(
                    self.make_rng("dropout"), keep, (b, self.embed_dim))
                dmask = mask.astype(jnp.float32) / keep
            else:
                dmask = jnp.ones((b, self.embed_dim), jnp.float32)
            return fuse(feats[::-1], projs[::-1], feats[0], train=True,
                        tail=(dmask, wp, bp))
        # fold projection+fuse and apply at native per-level resolution (see
        # _LevelFuse); reversed order matches the reference's concat (top
        # level first)
        x = fuse(feats[::-1], projs[::-1], feats[0], train=train)
        # ref uses nn.Dropout2d: whole-CHANNEL dropout, not per-pixel
        x = nn.Dropout(self.dropout, broadcast_dims=(1, 2))(
            x, deterministic=not train
        )
        # classifier in fp32: tiny matmul, keeps logits accurate for the loss
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="linear_pred")(
            x.astype(jnp.float32)
        )


@register_head("segformerhead")
def _segformer_head(channels, num_classes, embed_dim=256, **kwargs):
    return SegFormerHead(
        channels=list(channels), num_classes=num_classes, embed_dim=embed_dim, **kwargs
    )
