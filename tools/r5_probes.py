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
    else:
        raise SystemExit(f"unknown probe {which}")
    print(json.dumps(r))


if __name__ == "__main__":
    main()
