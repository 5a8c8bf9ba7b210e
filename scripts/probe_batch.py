#!/usr/bin/env python
"""Probe batch_windows sizing on the real chip (SURVEY §7 perf loop).

Per-batch dispatch overhead is fixed; as the consensus step gets faster the
overhead share grows, so re-probe larger batches whenever the step speeds
up.  Runs the bench dataset end-to-end (warm pass + 2 timed passes) per
candidate size.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import ensure_dataset
from daccord_tpu.pipeline.runner import run_tpu
from daccord_tpu.utils.config import DaccordConfig


def main():
    sizes = [int(s) for s in (sys.argv[1:] or ["256", "512", "1024"])]
    db, las = ensure_dataset()
    for bw in sizes:
        cfg = DaccordConfig(batch_windows=bw)
        t0 = time.time()
        run_tpu(db, las, cfg.replace(I=(0, 2)))       # compile + device load
        print(f"bw={bw}: warm {time.time()-t0:.1f}s", flush=True)
        best = None
        for it in range(2):
            t0 = time.time()
            recs, stats = run_tpu(db, las, cfg)
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            print(f"bw={bw} pass {it+1}: {stats.reads} reads in {dt:.2f}s "
                  f"-> {stats.reads/dt:.2f} reads/s "
                  f"({stats.batches} batches)", flush=True)
        print(f"bw={bw}: best {best:.2f}s", flush=True)


if __name__ == "__main__":
    main()
