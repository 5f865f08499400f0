"""Op-level bisect of the Mask2Former TPU worker crash (VERDICT r3 #3).

Round-4 fact base: BENCH run r4 crashed the worker on the
mit_b2_mask2former_512 config even on its CE (mask_loss=False) path —
so the crash is NOT specific to the Hungarian mask loss.

r4 BISECT RESULT (each row its own process, backend liveness probed):
  ms_deform_attn_fast fwd (3 lvls, 8 heads, 4 pts) .... OK, live
  MSDeformAttnPixelDecoder n_layers=1 fwd ............. OK, live
  MSDeformAttnPixelDecoder n_layers=6 fwd ............. OK (cold compile
      run once left the worker WEDGED; warm rerun clean — the wedge is a
      flaky program-load phenomenon, distinct from the crash)
  MultiScaleMaskedTransformerDecoder fwd+bwd .......... OK, live
  MSDeformAttnPixelDecoder n_layers=6 fwd+BWD ......... **WORKER CRASH**
      ("TPU worker process crashed ... kernel fault"), reproducible from
      a live backend
  full M2F train step (CE path) ....................... WORKER CRASH
=> the crash locus is the PIXEL DECODER BACKWARD at 512^2 b4. The prime
suspect inside it is the deform gather's autodiff (a scatter-add over the
multi-level value tensor) — see piece_msdeform_bwd. Everything passes on
CPU meshes, and fwd values match live torch (PARITY.md): this is a
backend/toolchain fault, not an application math bug.

Each piece runs as its OWN process (`python tools/bisect_m2f.py <piece>`)
so a worker crash is contained and attributable; drive with
`for p in ...; do timeout 560 python tools/bisect_m2f.py $p; <liveness>; done`.

Pieces (all b4 512^2 flagship shapes, bf16, jitted, value-fetch synced):
  head_fwd          full M2F head forward (CE path)
  head_bwd          head fwd+bwd (grads wrt head params)
  pixdec_fwd        MSDeformAttnPixelDecoder forward alone
  pixdec_bwd        pixel decoder fwd+bwd
  maskdec_fwd       MultiScaleMaskedTransformerDecoder forward alone
  maskdec_bwd       masked decoder fwd+bwd
  seminf_bwd        semantic_inference + log + CE fwd+bwd (tail alone)
  full_step         the exact crashing bench program (model train step)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, IMG, NC = 4, 512, 19
CH = [64, 128, 320, 512]  # MiT-B2 pyramid channels


def _feats(rng):
    return [
        jnp.asarray(rng.normal(size=(B, IMG // s, IMG // s, c)) * 0.5,
                    jnp.bfloat16)
        for s, c in zip((4, 8, 16, 32), CH)
    ]


def _fetch(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def _grad_fetch(loss_fn, params):
    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    gs = sum(float(jnp.sum(jnp.abs(t.astype(jnp.float32))))
             for t in jax.tree_util.tree_leaves(grads))
    return float(loss), gs


def head_modules():
    from segmentation_factory_tpu.models.heads.mask2former import (
        Mask2FormerHead,
    )

    return Mask2FormerHead(channels=CH, num_classes=NC)


def piece_head_fwd():
    rng = np.random.default_rng(0)
    feats = _feats(rng)
    head = head_modules()
    v = jax.jit(lambda: head.init(jax.random.PRNGKey(0), feats, train=False))()
    out = jax.jit(lambda v, f: head.apply(v, f, train=False))(v, feats)
    print("head_fwd OK", _fetch(out))


def piece_head_bwd():
    rng = np.random.default_rng(0)
    feats = _feats(rng)
    label = jnp.asarray(rng.integers(0, NC, (B, IMG, IMG)), jnp.int32)
    head = head_modules()
    v = jax.jit(lambda: head.init(jax.random.PRNGKey(0), feats, train=False))()

    from segmentation_factory_tpu.losses import criterion

    def loss_fn(params):
        logits = head.apply({"params": params}, feats, train=False)
        return criterion(logits, label, 255, use_dice=True, loss_type="ce")

    print("head_bwd OK", _grad_fetch(loss_fn, v["params"]))


def _pixdec():
    from segmentation_factory_tpu.models.layers.msdeformattn import (
        MSDeformAttnPixelDecoder,
    )

    return MSDeformAttnPixelDecoder(channels=CH, dim=256, mask_dim=256,
                                    n_layers=6, dtype=jnp.bfloat16)


def piece_pixdec_fwd():
    rng = np.random.default_rng(0)
    feats = _feats(rng)
    mod = _pixdec()
    v = jax.jit(lambda: mod.init(jax.random.PRNGKey(0), feats))()
    mf, ms = jax.jit(lambda v, f: mod.apply(v, f))(v, feats)
    print("pixdec_fwd OK", _fetch(mf), len(ms))


def piece_pixdec_bwd():
    rng = np.random.default_rng(0)
    feats = _feats(rng)
    mod = _pixdec()
    v = jax.jit(lambda: mod.init(jax.random.PRNGKey(0), feats))()

    def loss_fn(params):
        mf, ms = mod.apply({"params": params}, feats)
        return (jnp.sum(mf.astype(jnp.float32) ** 2)
                + sum(jnp.sum(m.astype(jnp.float32) ** 2) for m in ms))

    print("pixdec_bwd OK", _grad_fetch(loss_fn, v["params"]))


def _maskdec():
    from segmentation_factory_tpu.models.layers.mask_decoders import (
        MultiScaleMaskedTransformerDecoder,
    )

    return MultiScaleMaskedTransformerDecoder(
        num_classes=NC, dim=256, num_queries=100, num_layers=9,
        mask_dim=256, dtype=jnp.bfloat16)


def _maskdec_inputs(rng):
    ms = [
        jnp.asarray(rng.normal(size=(B, IMG // s, IMG // s, 256)) * 0.5,
                    jnp.bfloat16)
        for s in (32, 16, 8)
    ]
    mf = jnp.asarray(rng.normal(size=(B, IMG // 4, IMG // 4, 256)) * 0.5,
                     jnp.bfloat16)
    return ms, mf


def piece_maskdec_fwd():
    rng = np.random.default_rng(0)
    ms, mf = _maskdec_inputs(rng)
    mod = _maskdec()
    v = jax.jit(lambda: mod.init(jax.random.PRNGKey(0), ms, mf,
                                 deterministic=True))()
    out = jax.jit(lambda v: mod.apply(v, ms, mf, deterministic=True))(v)
    print("maskdec_fwd OK", _fetch(out["pred_logits"]),
          _fetch(out["pred_masks"]))


def piece_maskdec_bwd():
    rng = np.random.default_rng(0)
    ms, mf = _maskdec_inputs(rng)
    mod = _maskdec()
    v = jax.jit(lambda: mod.init(jax.random.PRNGKey(0), ms, mf,
                                 deterministic=True))()

    def loss_fn(params):
        out = mod.apply({"params": params}, ms, mf, deterministic=True)
        return (jnp.sum(out["pred_logits"].astype(jnp.float32) ** 2)
                + jnp.sum(out["pred_masks"].astype(jnp.float32) ** 2))

    print("maskdec_bwd OK", _grad_fetch(loss_fn, v["params"]))


def piece_seminf_bwd():
    from segmentation_factory_tpu.models.heads.mask2former import (
        semantic_inference,
    )
    from segmentation_factory_tpu.losses import criterion

    rng = np.random.default_rng(0)
    pl_ = jnp.asarray(rng.normal(size=(B, 100, NC + 1)), jnp.float32)
    pm = jnp.asarray(rng.normal(size=(B, 100, IMG // 4, IMG // 4)),
                     jnp.float32)  # (B, Q, H, W) — semantic_inference layout
    label = jnp.asarray(rng.integers(0, NC, (B, IMG, IMG)), jnp.int32)

    def loss_fn(args):
        pl2, pm2 = args
        sem = semantic_inference(pl2, pm2)
        logits = jnp.log(jnp.clip(sem, 1e-6, 1.0))
        return criterion(logits, label, 255, use_dice=True, loss_type="ce")

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))((pl_, pm))
    print("seminf_bwd OK", float(loss))


def piece_full_step():
    from bench import _build_state
    from segmentation_factory_tpu.engine import make_train_step

    state, data, sched = _build_state("mit_b2", "mask2formerhead", B, IMG)
    step = jax.jit(make_train_step(learning_rate_fn=sched, loss_type="ce"))
    state, m = step(state, data, jax.random.PRNGKey(1))
    print("full_step OK", float(m["loss"]))




def piece_full_step_scan(k: int):
    """r5: the bench path chains steps in ONE jitted lax.scan — the k10/k20
    bench runs died there (k10 never returned in 25 min; k20 crashed the
    worker) while the UNSCANNED full_step completes OK post-VJP-fix. This
    piece isolates the scan length: the same compiled shape as bench's
    make_k_steps at length=k."""
    from bench import _build_state
    from segmentation_factory_tpu.engine import make_train_step

    state, data, sched = _build_state("mit_b2", "mask2formerhead", B, IMG)
    step_fn = make_train_step(learning_rate_fn=sched, loss_type="ce")
    key = jax.random.PRNGKey(1)

    def k_steps(state, data, key):
        def body(st, _):
            st, m = step_fn(st, data, key)
            return st, m["loss"]

        st, losses = jax.lax.scan(body, state, None, length=k)
        return st, losses[-1]

    import time
    t0 = time.perf_counter()
    compiled = jax.jit(k_steps, donate_argnums=0).lower(
        state, data, key).compile()
    print(f"scan{k} compiled in {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    state, last = compiled(state, data, key)
    v = float(last)
    print(f"full_step_scan{k} OK loss={v} "
          f"exec {time.perf_counter() - t0:.1f}s", flush=True)


def piece_full_step_seq(k: int):
    """Fallback for the k-consecutive-steps criterion WITHOUT lax.scan:
    k async dispatches of the single jitted train step (donated state),
    one value fetch at the end. Also a valid fetch-synced timing method:
    dispatch is async, so total wall = k*step + one RTT."""
    import time

    from bench import _build_state
    from segmentation_factory_tpu.engine import make_train_step

    state, data, sched = _build_state("mit_b2", "mask2formerhead", B, IMG)
    step = jax.jit(make_train_step(learning_rate_fn=sched, loss_type="ce"),
                   donate_argnums=0)
    key = jax.random.PRNGKey(1)
    state, m = step(state, data, key)  # compile + warm
    print("seq warm loss", float(m["loss"]), flush=True)
    for rep in range(3):
        t0 = time.perf_counter()
        for i in range(k):
            state, m = step(state, data, jax.random.fold_in(key, i))
        v = float(m["loss"])
        dt = (time.perf_counter() - t0) / k
        print(f"full_step_seq{k} rep{rep} OK loss={v} "
              f"{dt * 1e3:.2f} ms/step ({B / dt:.2f} img/s)", flush=True)


def piece_pixdec_bwd_scan(k: int):
    """Scan-of-k of the pixel-decoder f+b alone (narrows a scan-program
    fault to the pixel decoder vs the rest of the step)."""
    rng = np.random.default_rng(0)
    feats = _feats(rng)
    mod = _pixdec()
    v = jax.jit(lambda: mod.init(jax.random.PRNGKey(0), feats))()

    def loss_fn(params, scale):
        mf, ms = mod.apply({"params": params}, jax.tree_util.tree_map(
            lambda f: f * scale, feats))
        return (jnp.sum(mf.astype(jnp.float32) ** 2)
                + sum(jnp.sum(m.astype(jnp.float32) ** 2) for m in ms))

    grad = jax.value_and_grad(loss_fn)

    def k_steps(params):
        def body(c, _):
            l, g = grad(params, c)
            leaves = jax.tree_util.tree_leaves(g)
            return c + l * 1e-20 + sum(
                jnp.sum(jnp.abs(t.astype(jnp.float32))) * 1e-20
                for t in leaves), l

        c, ls = jax.lax.scan(body, jnp.float32(1.0), None, length=k)
        return ls[-1]

    out = jax.jit(k_steps)(v["params"])
    print(f"pixdec_bwd_scan{k} OK", float(out), flush=True)


def piece_msdeform():
    """The deform patch-gather alone at the pixel-decoder's 512^2 shapes
    (3 levels /8,/16,/32, dim 256, 8 heads, 4 points) — r4 narrowing: the
    pixdec FORWARD completes but leaves the worker wedged."""
    from segmentation_factory_tpu.ops.msdeform import ms_deform_attn_fast

    rng = np.random.default_rng(0)
    shapes = [(IMG // 8, IMG // 8), (IMG // 16, IMG // 16),
              (IMG // 32, IMG // 32)]
    s = sum(h * w for h, w in shapes)
    m, d, p = 8, 32, 4
    q = s
    value = jnp.asarray(rng.normal(size=(B, s, m, d)), jnp.bfloat16)
    loc = jnp.asarray(rng.random((B, q, m, len(shapes), p, 2)), jnp.float32)
    aw = jnp.asarray(rng.random((B, q, m, len(shapes), p)), jnp.float32)
    aw = aw / aw.sum(axis=(-2, -1), keepdims=True)
    out = jax.jit(ms_deform_attn_fast, static_argnums=(1,))(
        value, tuple(shapes), loc, aw)
    print("msdeform OK", _fetch(out))


def piece_pixdec1():
    """Pixel decoder with n_layers=1 (isolates layer count vs structure)."""
    from segmentation_factory_tpu.models.layers.msdeformattn import (
        MSDeformAttnPixelDecoder,
    )

    rng = np.random.default_rng(0)
    feats = _feats(rng)
    mod = MSDeformAttnPixelDecoder(channels=CH, dim=256, mask_dim=256,
                                   n_layers=1, dtype=jnp.bfloat16)
    v = jax.jit(lambda: mod.init(jax.random.PRNGKey(0), feats))()
    mf, ms = jax.jit(lambda v, f: mod.apply(v, f))(v, feats)
    print("pixdec1 OK", _fetch(mf), len(ms))




def piece_msdeform_bwd():
    """The deform patch-gather fwd+BWD alone (the gather's autodiff is a
    scatter-add at 512^2 shapes — narrowing pixdec_bwd's worker crash)."""
    from segmentation_factory_tpu.ops.msdeform import ms_deform_attn_fast

    rng = np.random.default_rng(0)
    shapes = [(IMG // 8, IMG // 8), (IMG // 16, IMG // 16),
              (IMG // 32, IMG // 32)]
    s = sum(h * w for h, w in shapes)
    m, d, p = 8, 32, 4
    q = s
    value = jnp.asarray(rng.normal(size=(B, s, m, d)), jnp.bfloat16)
    loc = jnp.asarray(rng.random((B, q, m, len(shapes), p, 2)), jnp.float32)
    aw = jnp.asarray(rng.random((B, q, m, len(shapes), p)), jnp.float32)
    aw = aw / aw.sum(axis=(-2, -1), keepdims=True)

    def loss_fn(args):
        v, l2, a2 = args
        out = ms_deform_attn_fast(v, tuple(shapes), l2, a2)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))((value, loc, aw))
    print("msdeform_bwd OK", float(loss))


if __name__ == "__main__":
    piece = sys.argv[1]
    # scan/seq pieces take a trailing length arg: `full_step_scan 2`
    fn = globals()[f"piece_{piece}"]
    if len(sys.argv) > 2:
        fn(int(sys.argv[2]))
    else:
        fn()
