"""Fused [bilinear upsample -> CE / OHEM-CE + dice] Pallas TPU kernels.

The reference trains with the loss at INPUT resolution: logits leave the
decode head at stride 4 and are bilinearly upsampled 4x before CE+dice
(ref build_models.py:65 + engine.py:10-15). XLA materializes the upsampled
(B, H, W, C) fp32 logits (796 MB for the flagship), reads them for CE and
again for dice (two hi-res softmax passes), and materializes the hi-res
cotangent in the backward — ~2.4 GB of HBM traffic plus doubled
transcendentals per step. These kernels upsample IN VMEM (polyphase, exact
align_corners=False semantics), compute the per-pixel CE loss map and the
per-image dice partial sums in one pass, and in the backward regenerate
the softmax per tile and emit the LOW-RES cotangent directly (the linear
transpose of the upsample) — hi-res logits never reach HBM.

Layout: channels are PADDED to a multiple of 8 and placed on sublanes, W
on lanes (lo logits pre-transposed to (B, H_lo, Cp, W_lo) by one cheap XLA
pass); pad channels hold -1e30 so softmax/lse ignore them naturally. The
hi-res W axis is kept PHASE-BLOCKED — maps are laid out (B, H, s, W_lo)
with out[b, h, m, w] the true pixel (b, h, w*s + m)... (a pure column
permutation: loss values, sums, and the OHEM threshold comparison are
order-independent, and forward/backward use the same convention).

Scalar semantics match losses.cross_entropy / ohem_cross_entropy /
dice_loss exactly (up to fp reassociation): the VJP treats the OHEM keep
set and the valid mask as constants, exactly like autodiff through the
unfused composition.

Parity: tests/test_pallas_loss.py (interpret mode + XLA twin); compiled
on TPU via tools/tpu_parity_check.py.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_VMEM_LIMIT = 100 * 1024 * 1024
_NEG = -1e30


def _phase_taps(s: int):
    """(shift d, w_lo, w_hi) per phase: out[s*t + m] = w_lo*src[t+d] +
    w_hi*src[t+d+1] (align_corners=False, clamped at the image edge)."""
    taps = []
    for m in range(s):
        g = (m + 0.5) / s - 0.5
        if g >= 0:
            taps.append((0, 1.0 - g, g))
        else:
            taps.append((-1, -g, 1.0 + g))
    return taps


def _shift_lanes_clamp(x, d):
    """x shifted by d in the last axis with edge clamp (d in {-1, 0, +1})."""
    if d == 0:
        return x
    if d == -1:  # out[w] = x[w-1], out[0] = x[0]
        return jnp.concatenate([x[..., :1], x[..., :-1]], axis=-1)
    return jnp.concatenate([x[..., 1:], x[..., -1:]], axis=-1)


def _shift_lanes_zero(x, d):
    """x shifted by d in the last axis with zero fill."""
    if d == 0:
        return x
    z = jnp.zeros_like(x[..., :1])
    if d == -1:
        return jnp.concatenate([z, x[..., :-1]], axis=-1)
    return jnp.concatenate([x[..., 1:], z], axis=-1)


def _upsample_h(src_ext, s):
    """(R+2, Cp, W) halo-extended -> (R*s, Cp, W): H-axis polyphase.

    src_ext rows are [prev, center..., next]; phase taps with d=-1 read
    (prev-shifted) rows, d=0 the center alignment."""
    r = src_ext.shape[0] - 2
    phases = []
    for d, w_lo, w_hi in _phase_taps(s):
        a = src_ext[1 + d : 1 + d + r]
        b = src_ext[2 + d : 2 + d + r]
        phases.append(w_lo * a + w_hi * b)
    return jnp.stack(phases, axis=1).reshape(r * s, *src_ext.shape[1:])


def _hi_phase_w(hi_h, m, s):
    """W-axis polyphase: hi values of column-phase m, (TH, Cp, W_lo)."""
    d, w_lo, w_hi = _phase_taps(s)[m]
    return w_lo * _shift_lanes_clamp(hi_h, d) + w_hi * _shift_lanes_clamp(
        hi_h, d + 1
    )


def _softmax_parts(hi, labels_m, ignore_index):
    """Per-pixel lse, picked logit, softmax p, one-hot y, valid — over the
    sublane (channel) axis. hi: (TH, Cp, W); labels_m: (TH, W) int32."""
    cp = hi.shape[1]
    m = jnp.max(hi, axis=1, keepdims=True)
    e = jnp.exp(hi - m)
    se = jnp.sum(e, axis=1, keepdims=True)
    lse = (m + jnp.log(se))[:, 0]  # (TH, W)
    p = e / se
    valid = labels_m != ignore_index
    safe = jnp.where(valid, labels_m, 0)
    cls = jax.lax.broadcasted_iota(jnp.int32, (1, cp, 1), 1)
    y = (safe[:, None, :] == cls).astype(jnp.float32)  # (TH, Cp, W)
    picked = jnp.sum(hi * y, axis=1)  # (TH, W)
    return lse, picked, p, y, valid


def _fwd_kernel(s, ignore_index, lo_ref, lop_ref, lon_ref, lab_ref,
                loss_ref, part_ref):
    i = pl.program_id(1)
    src = jnp.concatenate(
        [lop_ref[0], lo_ref[0], lon_ref[0]], axis=0
    ).astype(jnp.float32)  # (TS+2, Cp, W_lo)
    hi_h = _upsample_h(src, s)  # (TH, Cp, W_lo)

    acc_i = jnp.zeros(part_ref.shape[1:], jnp.float32)  # (3, Cp, W_lo)
    for m in range(s):
        hi = _hi_phase_w(hi_h, m, s)
        labels_m = lab_ref[0, :, m, :]
        lse, picked, p, y, valid = _softmax_parts(hi, labels_m, ignore_index)
        loss_ref[0, :, m, :] = lse - picked
        vf = valid.astype(jnp.float32)[:, None, :]
        pv = p * vf
        acc_i = acc_i + jnp.stack(
            [jnp.sum(pv * y, axis=0), jnp.sum(pv, axis=0),
             jnp.sum(y * vf, axis=0)],
            axis=0,
        )

    @pl.when(i == 0)
    def _init():
        part_ref[0] = acc_i

    @pl.when(i > 0)
    def _acc():
        part_ref[0] = part_ref[0] + acc_i


def _bwd_kernel(s, ignore_index, lo_ref, lop_ref, lon_ref, lab_ref,
                w_ref, dc_ref, dlo_ref, halo_ref):
    src = jnp.concatenate(
        [lop_ref[0], lo_ref[0], lon_ref[0]], axis=0
    ).astype(jnp.float32)
    hi_h = _upsample_h(src, s)
    th, cp, wl = hi_h.shape
    di = dc_ref[0, 0][None]  # (1, Cp, W_lo) — dL/dI per class
    dp = dc_ref[0, 1][None]  # (1, Cp, W_lo) — dL/dP per class

    dhi_h = jnp.zeros((th, cp, wl), jnp.float32)
    for m in range(s):
        hi = _hi_phase_w(hi_h, m, s)
        labels_m = lab_ref[0, :, m, :]
        _, _, p, y, valid = _softmax_parts(hi, labels_m, ignore_index)
        vf = valid.astype(jnp.float32)[:, None, :]
        wce = w_ref[0, :, m, :][:, None, :]  # per-pixel CE weight
        # dice per-pixel: q_c = valid*(dI_c*y_c + dP_c); softmax vjp
        q = vf * (di * y + dp)
        inner = jnp.sum(q * p, axis=1, keepdims=True)
        dhi = wce * (p - y) + p * (q - inner)
        # W-transpose: dhi_m[w] came from lo lanes (w+d, w+d+1); scatter
        # back with opposite shifts (zero fill) + explicit edge-clamp adds
        d, w_lo, w_hi = _phase_taps(s)[m]
        t0 = _shift_lanes_zero(dhi, -d) * w_lo
        t1 = _shift_lanes_zero(dhi, -d - 1) * w_hi
        # clamp corrections: fwd read lane 0 for out-of-range w+d < 0
        # (d=-1 at w=0) and lane W-1 for w+d+1 > W-1 (d=0 at w=W-1)
        lane = jax.lax.broadcasted_iota(jnp.int32, dhi.shape, 2)
        if d == -1:
            t0 = t0 + jnp.where(lane == 0, dhi * w_lo, 0.0)
        if d + 1 == 1:
            t1 = t1 + jnp.where(lane == wl - 1, dhi * w_hi, 0.0)
        dhi_h = dhi_h + t0 + t1

    # H-transpose: deinterleave phases, scatter rows t+d, t+d+1 into the
    # (TS+2)-row extended cotangent; rows 0 and TS+1 go to the halo output
    ts = th // s
    g = dhi_h.reshape(ts, s, cp, wl)
    dext = jnp.zeros((ts + 2, cp, wl), jnp.float32)
    for m, (d, w_lo, w_hi) in enumerate(_phase_taps(s)):
        gm = g[:, m]  # (TS, Cp, W)
        # fwd: out[s*t+m] = w_lo*src_ext[1+d+t] + w_hi*src_ext[2+d+t]
        for start, wgt in ((1 + d, w_lo), (2 + d, w_hi)):
            # start in {0, 1, 2}; skip zero-size pads — Mosaic rejects
            # zero-size vector broadcasts (jnp.zeros((0, ...)) lowers fine
            # in interpret mode but fails pallas_call TPU compilation)
            parts = []
            if start > 0:
                parts.append(jnp.zeros((start, cp, wl), jnp.float32))
            parts.append(gm * wgt)
            if 2 - start > 0:
                parts.append(jnp.zeros((2 - start, cp, wl), jnp.float32))
            dext = dext + (
                jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
            )
    dlo_ref[0] = dext[1 : ts + 1].astype(dlo_ref.dtype)
    halo_ref[0, 0] = dext[0].astype(halo_ref.dtype)
    halo_ref[0, 1] = dext[ts + 1].astype(halo_ref.dtype)


def _pad_channels(c: int) -> int:
    return ((c + 7) // 8) * 8


def _pick_tile(hl: int, s: int, cp: int, wl: int) -> int:
    """LO-res rows per tile: divides hl, and the hi-res working set
    (~10 live (ts*s, Cp, W_lo) f32 arrays) stays under budget."""
    budget = 24 * 1024 * 1024
    ts = hl
    while ts > 1 and ts % 2 == 0 and ts * s * cp * wl * 4 * 10 > budget:
        ts //= 2
    return ts


def _transpose_pad(lo, cp):
    """Transpose lo to (B, H_lo, Cp, W_lo) with -1e30 channel padding (pad
    channels vanish under softmax/lse/argmax naturally)."""
    c = lo.shape[-1]
    lo_t = jnp.transpose(lo.astype(jnp.float32), (0, 1, 3, 2))
    if cp != c:
        lo_t = jnp.pad(lo_t, ((0, 0), (0, 0), (0, cp - c), (0, 0)),
                       constant_values=_NEG)
    return lo_t


def _prep(lo, labels, s):
    """Host-side XLA prep: transposed/padded lo plus labels in the
    phase-blocked (B, H, s, W_lo) layout."""
    b, hl, wl, c = lo.shape
    lo_t = _transpose_pad(lo, _pad_channels(c))
    lab = labels.reshape(b, hl * s, wl, s).transpose(0, 1, 3, 2)
    return lo_t, lab.astype(jnp.int32)


def _specs(b, hl, cp, wl, ts):
    lo_spec = pl.BlockSpec((1, ts, cp, wl), lambda bb, i: (bb, i, 0, 0),
                           memory_space=pltpu.VMEM)
    prev = pl.BlockSpec(
        (1, 1, cp, wl),
        lambda bb, i, ts=ts: (bb, jnp.maximum(i * ts - 1, 0), 0, 0),
        memory_space=pltpu.VMEM)
    nxt = pl.BlockSpec(
        (1, 1, cp, wl),
        lambda bb, i, ts=ts, last=hl - 1: (
            bb, jnp.minimum(i * ts + ts, last), 0, 0),
        memory_space=pltpu.VMEM)
    return lo_spec, prev, nxt


def _forward(lo_t, lab, s, ignore_index, ts):
    b, hl, cp, wl = lo_t.shape
    th = ts * s
    grid = (b, hl // ts)
    lo_spec, prev, nxt = _specs(b, hl, cp, wl, ts)
    map_spec = pl.BlockSpec((1, th, s, wl), lambda bb, i: (bb, i, 0, 0),
                            memory_space=pltpu.VMEM)
    part_spec = pl.BlockSpec((1, 3, cp, wl), lambda bb, i: (bb, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, s, ignore_index),
        grid=grid,
        in_specs=[lo_spec, prev, nxt, map_spec],
        out_specs=(map_spec, part_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, hl * s, s, wl), jnp.float32),
            jax.ShapeDtypeStruct((b, 3, cp, wl), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=30 * b * hl * s * s * wl * cp,
            bytes_accessed=2 * lo_t.size * 4 + b * hl * s * s * wl * 8,
            transcendentals=b * hl * s * s * wl * cp,
        ),
        compiler_params=pltpu.CompilerParams(
            # dice partials accumulate across row tiles: i is sequential
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
    )(lo_t, lo_t, lo_t, lab)


def _backward(lo_t, lab, wmap, dcoef, s, ignore_index, ts):
    b, hl, cp, wl = lo_t.shape
    th = ts * s
    grid = (b, hl // ts)
    nh = hl // ts
    lo_spec, prev, nxt = _specs(b, hl, cp, wl, ts)
    map_spec = pl.BlockSpec((1, th, s, wl), lambda bb, i: (bb, i, 0, 0),
                            memory_space=pltpu.VMEM)
    dc_spec = pl.BlockSpec((1, 2, cp, wl), lambda bb, i: (bb, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    halo_spec = pl.BlockSpec((1, 2, cp, wl), lambda bb, i: (bb, i, 0, 0),
                             memory_space=pltpu.VMEM)
    dlo, halo = pl.pallas_call(
        functools.partial(_bwd_kernel, s, ignore_index),
        grid=grid,
        in_specs=[lo_spec, prev, nxt, map_spec, map_spec, dc_spec],
        out_specs=(lo_spec, halo_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, hl, cp, wl), jnp.float32),
            jax.ShapeDtypeStruct((b, nh * 2, cp, wl), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=40 * b * hl * s * s * wl * cp,
            bytes_accessed=3 * lo_t.size * 4 + b * hl * s * s * wl * 8,
            transcendentals=b * hl * s * s * wl * cp,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
    )(lo_t, lo_t, lo_t, lab, wmap, dcoef)
    # fold the per-tile halo rows back in: tile i's row -1 / row TS land on
    # global rows i*ts - 1 / i*ts + ts, CLAMPED at the image edge (the
    # clamp-add is the exact transpose of the forward's edge replication)
    up = halo[:, 0::2]  # (B, nh, Cp, W) — contributions to row i*ts - 1
    dn = halo[:, 1::2]  # (B, nh, Cp, W) — contributions to row i*ts + ts
    dlo = dlo.at[:, 0].add(up[:, 0])
    if nh > 1:
        idx_up = np.arange(1, nh) * ts - 1
        dlo = dlo.at[:, idx_up].add(up[:, 1:])
        idx_dn = np.arange(0, nh - 1) * ts + ts
        dlo = dlo.at[:, idx_dn].add(dn[:, :-1])
    dlo = dlo.at[:, hl - 1].add(dn[:, nh - 1])
    return dlo


def _argmax_kernel(s, lo_ref, lop_ref, lon_ref, o_ref):
    """Forward-only: upsample in VMEM and emit the hi-res argmax directly
    (the eval/predict path — hi-res logits never reach HBM)."""
    src = jnp.concatenate(
        [lop_ref[0], lo_ref[0], lon_ref[0]], axis=0
    ).astype(jnp.float32)
    hi_h = _upsample_h(src, s)
    cp = hi_h.shape[1]
    cls = jax.lax.broadcasted_iota(jnp.int32, (1, cp, 1), 1)
    for m in range(s):
        hi = _hi_phase_w(hi_h, m, s)
        mx = jnp.max(hi, axis=1, keepdims=True)
        # first max index — matches jnp.argmax tie semantics
        idx = jnp.min(
            jnp.where(hi == mx, cls, jnp.int32(cp)), axis=1
        )
        o_ref[0, :, m, :] = idx.astype(jnp.int32)


def _shape_gate_ok(lo_shape, out_hw, use_pallas: bool) -> bool:
    """Shared fused-path eligibility: dyadic scale, lane-aligned W, tile
    divides H, working set within the VMEM budget."""
    b, hl, wl, c = lo_shape
    hh, wh = out_hw
    s = hh // max(hl, 1)
    cp = _pad_channels(c)
    ts = _pick_tile(hl, s, cp, wl) if hl else 1
    return (
        use_pallas
        and s in (2, 4, 8)
        and hl * s == hh
        and wl * s == wh
        and wl % 128 == 0
        and hl % ts == 0
        # odd hl can stop the tile halving above budget — refuse, fall back
        and ts * s * cp * wl * 4 * 10 <= 32 * 1024 * 1024
    )


def resize_argmax_to(lo: Array, out_hw, use_pallas: bool | None = None):
    """argmax(resize(lo, out_hw)) — fused when out_hw is a dyadic multiple.

    Exact same prediction as ``jnp.argmax(resize(lo, out_hw), -1)`` (up to
    fp reassociation at measure-zero ties); hi-res logits stay in VMEM."""
    b, hl, wl, c = lo.shape
    hh, wh = out_hw
    if use_pallas is None:
        use_pallas = use_pallas_default()
    if not _shape_gate_ok(lo.shape, out_hw, use_pallas):
        from segmentation_factory_tpu.models.layers import resize

        return jnp.argmax(resize(lo, (hh, wh)), axis=-1).astype(jnp.int32)
    s = hh // hl
    cp = _pad_channels(c)
    ts = _pick_tile(hl, s, cp, wl)
    lo_t = _transpose_pad(lo, cp)
    th = ts * s
    grid = (b, hl // ts)
    lo_spec, prev, nxt = _specs(b, hl, cp, wl, ts)
    map_spec = pl.BlockSpec((1, th, s, wl), lambda bb, i: (bb, i, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_argmax_kernel, s),
        grid=grid,
        in_specs=[lo_spec, prev, nxt],
        out_specs=map_spec,
        out_shape=jax.ShapeDtypeStruct((b, hh, s, wl), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * hh * s * wl * cp,
            bytes_accessed=lo_t.size * 4 + b * hh * s * wl * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
    )(lo_t, lo_t, lo_t)
    # un-permute the phase-blocked columns to true raster order
    return out.transpose(0, 1, 3, 2).reshape(b, hh, wh)


# ---------------------------------------------------------------------------
# scalar glue (shared by the fused path and its XLA twin)


def _dice_from_partials(inter, psum, ysum, smooth=1e-6):
    """losses.dice_loss:160-174 from per-image per-class sums."""
    sets_sum = psum + ysum
    sets_sum = jnp.where(sets_sum == 0.0, 2.0 * inter, sets_sum)
    dice = (2.0 * inter + smooth) / (sets_sum + smooth)
    return 1.0 - jnp.mean(dice)


def _dice_coefs(inter, psum, ysum, smooth=1e-6):
    """d(dice_loss)/dI and /dP per (image, class) — the keep-set-constant
    VJP of _dice_from_partials (Y has no logits gradient)."""
    b, c = inter.shape
    sets = psum + ysum
    zero = sets == 0.0
    sets_sum = jnp.where(zero, 2.0 * inter, sets)
    denom = sets_sum + smooth
    num = 2.0 * inter + smooth
    ddice_di = 2.0 / denom - num / (denom * denom) * jnp.where(zero, 2.0, 0.0)
    ddice_dp = -num / (denom * denom) * jnp.where(zero, 0.0, 1.0)
    scale = -1.0 / (b * c)
    return scale * ddice_di, scale * ddice_dp


def _ce_scalar_and_weights(loss_map, valid, loss_type, lab=None,
                           class_weights=None, thresh=0.7,
                           min_kept_ratio=1.0 / 16.0):
    """CE / OHEM-CE scalar from the per-pixel loss map, plus the per-pixel
    weight map the backward uses (keep-set treated as constant — identical
    to autodiff through losses.cross_entropy / ohem_cross_entropy).
    ``class_weights`` (CE only, like torch F.cross_entropy weight=) scales
    each pixel by its label's weight; normalization is the weighted sum."""
    flat = loss_map.reshape(-1)
    vflat = valid.reshape(-1).astype(jnp.float32)
    if class_weights is not None:
        cw = jnp.asarray(class_weights, jnp.float32)
        safe = jnp.where(valid, lab, 0).reshape(-1)
        vflat = vflat * cw[safe]
    if loss_type in ("ohem", "ohemcrossentropy"):
        loss_thresh = -jnp.log(jnp.asarray(thresh, jnp.float32))
        masked = jnp.where(vflat > 0, flat, -jnp.inf)
        n_valid = jnp.sum(vflat)
        n_min = (n_valid * min_kept_ratio).astype(jnp.int32)
        # exact kth value via 32 count passes (losses.kth_largest) — the
        # full jnp.sort measured ~3.3 ms at the 1024^2 north-star shape
        from segmentation_factory_tpu.losses import kth_largest

        kth = kth_largest(masked, n_min)
        keep_topk = (masked >= kth) & (n_min > 0)
        keep = (vflat > 0) & ((flat > loss_thresh) | keep_topk)
        w = keep.astype(jnp.float32)
    else:
        w = vflat
    wsum = jnp.maximum(jnp.sum(w), 1.0)
    scalar = jnp.sum(flat * w) / wsum
    return scalar, (w / wsum).reshape(loss_map.shape)


# ---------------------------------------------------------------------------
# public entry


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _fused_loss(lo, labels, s, loss_type, use_dice, ignore_index,
                class_weights=None):
    out, _ = _fused_fwd(lo, labels, s, loss_type, use_dice, ignore_index,
                        class_weights)
    return out


def _fused_fwd(lo, labels, s, loss_type, use_dice, ignore_index,
               class_weights=None):
    c = lo.shape[-1]
    lo_t, lab = _prep(lo, labels, s)
    _, hl, cp, wl = lo_t.shape
    ts = _pick_tile(hl, s, cp, wl)
    loss_map, parts = _forward(lo_t, lab, s, ignore_index, ts)
    valid = lab != ignore_index
    ce, wmap = _ce_scalar_and_weights(loss_map, valid, loss_type, lab=lab,
                                      class_weights=class_weights)
    total = ce
    inter = psum = ysum = None
    if use_dice:
        # lane/channel partials -> per-image per-class sums (trim pads)
        inter = jnp.sum(parts[:, 0, :c, :], axis=-1)
        psum = jnp.sum(parts[:, 1, :c, :], axis=-1)
        ysum = jnp.sum(parts[:, 2, :c, :], axis=-1)
        total = total + _dice_from_partials(inter, psum, ysum)
    # token: zero-size array whose SHAPE carries the true channel count and
    # whose dtype carries lo's dtype (residual leaves must be JAX types)
    token = jnp.zeros((0, c), lo.dtype)
    return total, (lo_t, lab, wmap, inter, psum, ysum, token)


def _fused_bwd(s, loss_type, use_dice, ignore_index, class_weights,
               res, g):
    del class_weights  # already folded into the saved wmap
    lo_t, lab, wmap, inter, psum, ysum, token = res
    c, lo_dtype = token.shape[1], token.dtype
    b, hl, cp, wl = lo_t.shape
    if use_dice:
        di, dp = _dice_coefs(inter, psum, ysum)  # (B, C)
        di = jnp.pad(di, ((0, 0), (0, cp - c)))
        dp = jnp.pad(dp, ((0, 0), (0, cp - c)))
        dcoef = jnp.stack([di, dp], axis=1)[..., None]  # (B, 2, Cp, 1)
        dcoef = jnp.broadcast_to(dcoef, (b, 2, cp, wl))
    else:
        dcoef = jnp.zeros((b, 2, cp, wl), jnp.float32)
    ts = _pick_tile(hl, s, cp, wl)
    dlo_t = _backward(lo_t, lab, wmap, dcoef, s, ignore_index, ts)
    dlo = jnp.transpose(dlo_t[:, :, :c, :], (0, 1, 3, 2))
    dlo = (dlo * g.astype(jnp.float32)).astype(lo_dtype)
    # labels are integer: the cotangent type is float0 (original (B, H, W))
    dlabels = np.zeros(
        (lab.shape[0], lab.shape[1], lab.shape[2] * lab.shape[3]),
        jax.dtypes.float0,
    )
    return dlo, dlabels


_fused_loss.defvjp(_fused_fwd, _fused_bwd)


def _xla_twin(lo, labels, s, loss_type, use_dice, ignore_index,
              class_weights=None):
    """The unfused composition: resize then losses.* — the exact math the
    fused path replaces (and the fallback on non-TPU backends). Resizes to
    the LABELS' spatial shape (what the model-side resize produced), which
    also covers non-divisible stride geometries."""
    from segmentation_factory_tpu import losses as L
    from segmentation_factory_tpu.models.layers import resize

    del s
    hi = resize(lo, (labels.shape[1], labels.shape[2]))
    return L.criterion(hi, labels, ignore_index, use_dice=use_dice,
                       loss_type=loss_type, class_weights=class_weights)


def use_pallas_default() -> bool:
    if os.environ.get("SFT_NO_PALLAS") or os.environ.get(
        "SFT_NO_PALLAS_LOSS"
    ):
        return False
    # Mosaic-validated on hardware (TPU v5e, tools/tpu_parity_check.py —
    # TPU_PARITY.txt: CE/OHEM scalar + grad parity to ~1e-7, argmax exact),
    # so on by default; SFT_PALLAS_V2=0 is the explicit opt-out.
    if os.environ.get("SFT_PALLAS_V2", "1") == "0":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def lowres_criterion(
    logits_lo: Array,
    labels: Array,
    ignore_index: int = 255,
    use_dice: bool = True,
    loss_type: str = "ce",
    use_pallas: bool | None = None,
    class_weights=None,
) -> Array:
    """criterion() over LOW-RES logits: fused upsample+loss on TPU when the
    shapes allow, the explicit resize->criterion composition elsewhere."""
    hl = logits_lo.shape[1]
    hh, wh = labels.shape[1], labels.shape[2]
    if use_pallas is None:
        use_pallas = use_pallas_default()
    s = hh // max(hl, 1)
    key = loss_type.lower().replace("_", "")
    # class weights ride the CE glue only; the reference never combines
    # them with OHEM (engine.py criterion is plain CE) — fall back there.
    # Traced (non-concrete) weight arrays also fall back: the fused VJP
    # needs them static.
    cw = None
    cw_fusable = class_weights is None
    if class_weights is not None and key in ("ce", "crossentropy"):
        try:
            cw = tuple(float(x) for x in class_weights)
            cw_fusable = True
        except (TypeError, jax.errors.ConcretizationTypeError,
                jax.errors.TracerArrayConversionError):
            cw_fusable = False
    ok = (
        key in ("ce", "crossentropy", "ohem", "ohemcrossentropy")
        and cw_fusable
        and not (class_weights is not None
                 and key in ("ohem", "ohemcrossentropy"))
        and _shape_gate_ok(logits_lo.shape, (hh, wh), use_pallas)
    )
    if ok:
        return _fused_loss(logits_lo, labels, s, key, use_dice,
                           ignore_index, cw)
    return _xla_twin(logits_lo, labels, hh // hl if hl else 1,
                     loss_type, use_dice, ignore_index, class_weights)
