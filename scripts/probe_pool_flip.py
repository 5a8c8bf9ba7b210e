#!/usr/bin/env python
"""Pin the front-half pool flip point with data (VERDICT r4 weak item 5).

The runner's auto heuristic (-t 0) fans the front half out to a process
pool when the mean pile depth (las.novl / nreads) >= 20 overlaps/read.
This probe measures inline vs pool wall time — INCLUDING pool startup,
the cost the heuristic exists to avoid paying pointlessly — across
coverages spanning the flip region, on this host's cores.

Writes one JSON line with the per-coverage table and the measured
break-even depth."""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coverages", default="10,15,20,25,30")
    ap.add_argument("--genome", type=int, default=30_000)
    ap.add_argument("--passes", type=int, default=3)
    args = ap.parse_args()

    import statistics

    from daccord_tpu.formats.dazzler_db import DazzlerDB
    from daccord_tpu.formats.las import open_piles
    from daccord_tpu.oracle.consensus import select_read_ids
    from daccord_tpu.pipeline.runner import _pp_front, _pp_init
    from daccord_tpu.sim import SimConfig, simulate
    from daccord_tpu.utils.config import DaccordConfig

    cachedir = os.path.join(REPO, ".bench_cache", "poolflip")
    os.makedirs(cachedir, exist_ok=True)
    cfg = DaccordConfig()
    try:
        ncores = len(os.sched_getaffinity(0))
    except AttributeError:
        ncores = os.cpu_count() or 1
    nw = min(ncores, 16)

    import concurrent.futures as cf
    import multiprocessing as mp

    rows = []
    for cov in [float(x) for x in args.coverages.split(",")]:
        db_path = os.path.join(cachedir, f"pf{cov:g}.db")
        las_path = os.path.join(cachedir, f"pf{cov:g}.las")
        if not os.path.exists(las_path):
            ds = simulate(SimConfig(seed=7, genome_len=args.genome,
                                    coverage=cov, read_len=(1800, 2600)))
            ds.write(db_path, las_path)
        db = DazzlerDB.open(db_path)
        las = open_piles(las_path)
        las.build_index()
        depth = las.novl / max(1, db.nreads)
        jobs = list(enumerate(select_read_ids(db, cfg)))

        os.environ["DACCORD_NATIVE_THREADS"] = "1"
        _pp_init(db_path, las_path, cfg)
        ts = []
        for _ in range(args.passes):
            t0 = time.time()
            for sa in jobs:
                _pp_front(sa)
            ts.append(time.time() - t0)
        t_inline = statistics.median(ts)

        ts = []
        for _ in range(args.passes):
            t0 = time.time()            # INCLUDES pool fork + teardown
            ctx = mp.get_context("fork")
            with cf.ProcessPoolExecutor(
                    max_workers=nw, mp_context=ctx, initializer=_pp_init,
                    initargs=(db_path, las_path, cfg)) as ex:
                for _ in ex.map(_pp_front, jobs, chunksize=8):
                    pass
            ts.append(time.time() - t0)
        t_pool = statistics.median(ts)
        rows.append(dict(coverage=cov, depth=round(depth, 1),
                         reads=len(jobs), inline_s=round(t_inline, 3),
                         pool_s=round(t_pool, 3),
                         pool_speedup=round(t_inline / t_pool, 2)))
        log(f"cov={cov:g} depth={depth:.1f} reads={len(jobs)} "
            f"inline={t_inline:.2f}s pool({nw}w incl startup)={t_pool:.2f}s "
            f"speedup={t_inline / t_pool:.2f}x")

    flip = None
    for r in rows:
        if r["pool_speedup"] > 1.0:
            flip = r["depth"]
            break
    print(json.dumps(dict(ncores=ncores, workers=nw, rows=rows,
                          break_even_depth=flip)))


if __name__ == "__main__":
    main()
