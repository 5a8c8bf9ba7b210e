#!/usr/bin/env python
"""On-chip phase split at 60x coverage (the reference paper's regime).

The bench phase split (RESULTS.md) is measured at 10x; config 5 runs at
60x where the depth mix, the k2 retry rate, and the front-half realign
cost all differ.  This prints the RunLog phase summary for a 30kb @60x
dataset so optimization effort at the 40-60x regime targets the real
wall (VERDICT r3 item 1's "re-state conclusions from the 60x number").
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.run_configs import prepare, log  # noqa: E402


def main():
    from daccord_tpu.pipeline.runner import run_tpu
    from daccord_tpu.pipeline.warmup import warm_step_variants
    from daccord_tpu.utils.config import DaccordConfig

    cachedir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_cache", "configs")
    os.makedirs(cachedir, exist_ok=True)
    c = dict(name="deep-phase-60x", genome=30_000, cov=60.0, feats=[])
    db, las, nreads = prepare(c, 1.0, cachedir)
    cfg = DaccordConfig(batch_windows=256)
    t0 = time.time()
    warm_step_variants(cfg, log=log)
    run_tpu(db, las, cfg)                      # full warm pass
    log(f"warm {time.time()-t0:.1f}s; timed passes:")
    for i in range(2):
        t0 = time.time()
        recs, stats = run_tpu(db, las, cfg.replace(V=1))
        dt = time.time() - t0
        log(f"pass {i+1}: {stats.reads} reads / {stats.windows} windows "
            f"in {dt:.2f}s -> {stats.reads/dt:.2f} reads/s, "
            f"{stats.windows/dt:.0f} windows/s "
            f"(ok={stats.windows_ok}, k2={stats.k2_retries})")


if __name__ == "__main__":
    main()
