"""r5 ad hoc measurements (run each probe in its OWN process).

Usage: python tools/r5_probes.py <probe>

Probes:
  tail_off_1024   north-star config with SFT_PALLAS_TAIL=0 (head-tail kernel
                  attribution at 1024^2 — VERDICT r4 weak #4)
  b8_remat_1024   batch-scaling lever: b8 + --remat at 1024^2 OHEM
  b4_remat_1024   b4 + remat (isolates remat cost at the measured b4 point)
  kvasir_mnv4     BASELINE pinned config #3: MobileNetV4-medium + FPNHead,
                  binary, 224^2 b4 (reference datasets/kvasir.py img_size=224,
                  train_gpu.py batch default 4) — first-ever wall-clock
  synapse_b2      BASELINE pinned config #4: Synapse 9-class Dice+CE at
                  224^2 b4 (train_gpu.py defaults; loss = CE+dice as the
                  reference engine always applies) — first-ever wall-clock

Each prints bench.py-style milestone JSON lines (timing_reliable honesty
checks included); artifacts are recorded in PERF.md / BENCH_LOCAL_r05.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    which = sys.argv[1]
    if which == "tail_off_1024":
        os.environ["SFT_PALLAS_TAIL"] = "0"
    from bench import bench_config

    if which == "tail_off_1024":
        r = bench_config("lever_1024_ohem_tail_off", batch=2, img=1024,
                         loss_type="ohem", ref_anchor=False)
    elif which == "b8_remat_1024":
        r = bench_config("lever_1024_ohem_b8_remat", batch=8, img=1024,
                         loss_type="ohem", k=20, remat=True,
                         ref_anchor=False)
    elif which == "b4_remat_1024":
        r = bench_config("lever_1024_ohem_b4_remat", batch=4, img=1024,
                         loss_type="ohem", k=20, remat=True,
                         ref_anchor=False)
    elif which == "kvasir_mnv4":
        r = bench_config("mnv4_medium_fpn_kvasir_224", batch=4, img=224,
                         loss_type="ce", backbone="mobilenetv4_medium",
                         head="fpnhead", nc=2, k=40)
    elif which == "synapse_b2":
        r = bench_config("mit_b2_segformer_synapse_224", batch=4, img=224,
                         loss_type="ce", nc=9, k=40)
    elif which == "synapse_b32":
        # supplementary capability number: the pinned 224^2 b4 is
        # fixed-overhead-dominated on one chip; b32 shows the op mix's
        # real per-chip rate (labeled supplementary in PERF.md)
        r = bench_config("mit_b2_segformer_synapse_224_b32", batch=32,
                         img=224, loss_type="ce", nc=9, k=40)
    elif which == "m2f_k20":
        # VERDICT r4 #3 done-criterion: K>=20 CONSECUTIVE M2F train steps
        # complete on the real chip at 512^2 (one 20-step chained scan, not
        # repeated shorter programs)
        r = bench_config("mit_b2_mask2former_512_k20", batch=4, img=512,
                         loss_type="ce", k=20, reps=3,
                         head="mask2formerhead", ref_anchor=False)
    elif which == "infer_argmax":
        r = _infer_argmax()
    else:
        raise SystemExit(f"unknown probe {which}")
    print(json.dumps(r))


def _infer_argmax(batch=16, img=512, k=20, reps=3):
    """Serving-path probe: the REAL predict dataflow (head-res logits ->
    fused upsample+argmax -> int class map, infer.predict_step) vs the
    bench_infer full-res fp32-logits forward. Quantifies what a serving
    deployment actually gets per chip."""
    import time
    import statistics

    import jax
    import jax.numpy as jnp
    import numpy as np

    from segmentation_factory_tpu.models import build_model
    from segmentation_factory_tpu.ops.pallas_loss import resize_argmax_to

    model = build_model("mit_b2", "segformerhead", num_classes=19)
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, img, img, 3), jnp.float32))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, img, img, 3)), jnp.float32)

    def k_pred(v, x):
        def body(c, _):
            # engine.steps._predict_map dataflow: head-res logits ->
            # fused upsample+argmax (full-res fp32 logits never hit HBM)
            logits = model.apply(v, c, train=False, resize_output=False)
            y = resize_argmax_to(logits, (img, img)).astype(jnp.int32)
            c = c + 0.0 * jnp.max(y).astype(c.dtype)
            return c, jnp.sum(y)

        _, ys = jax.lax.scan(body, x, None, length=k)
        return ys[-1]

    compiled = jax.jit(k_pred).lower(variables, x).compile()
    float(compiled(variables, x))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        y = compiled(variables, x)
        float(y)
        times.append(time.perf_counter() - t0)
    dt = statistics.median(times) / k
    return {"name": "infer_argmax_mit_b2_512_b16",
            "images_per_sec": round(batch / dt, 2),
            "ms_per_batch": round(dt * 1e3, 2),
            "timing_method": f"median of {reps} x {k}-step chained scan, "
                             "fetch-synced"}


if __name__ == "__main__":
    main()
