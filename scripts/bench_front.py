#!/usr/bin/env python
"""Front-half scaling benchmark (host pile realign + row extraction only).

Measures the process-pool front half in isolation — the part of the
pipeline that must outrun the device at pod scale (SURVEY §7.3 item 5) —
across worker counts and IPC transports:

  pickle: ReadRows arrays pickled through the executor result pipe
  shm:    arrays written to a per-read SharedMemory segment; only the
          segment name + header crosses the pipe (VERDICT r3 item 8)

Usage: python scripts/bench_front.py [--repeat 4] [--workers 1,2,4]
"""

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
    ap.add_argument("--repeat", type=int, default=4,
                    help="workload multiplier over the bench read set")
    ap.add_argument("--workers", default="1,2,4")
    ap.add_argument("--transports", default="pickle,shm")
    ap.add_argument("--passes", type=int, default=3)
    args = ap.parse_args()

    import bench
    db_path, las_path = bench.ensure_dataset()

    from daccord_tpu.formats.dazzler_db import DazzlerDB
    from daccord_tpu.formats.las import open_piles
    from daccord_tpu.oracle.consensus import select_read_ids
    from daccord_tpu.pipeline.runner import (
        _pp_front, _pp_front_shm, _pp_init,
    )
    from daccord_tpu.pipeline.rows import rows_from_shm
    from daccord_tpu.utils.config import DaccordConfig

    cfg = DaccordConfig()
    db = DazzlerDB.open(db_path)
    las = open_piles(las_path)
    las.build_index()
    read_ids = list(select_read_ids(db, cfg)) * args.repeat
    jobs = list(enumerate(read_ids))
    log(f"bench_front: {len(jobs)} reads ({args.repeat}x bench set)")

    import concurrent.futures as cf
    import multiprocessing as mp

    results = {}

    import statistics

    # serial reference: same code path as -t1 (native DP single-threaded,
    # matching the worker env so the comparison is thread-for-thread fair)
    os.environ["DACCORD_NATIVE_THREADS"] = "1"
    _pp_init(db_path, las_path, cfg)
    ts = []
    for _ in range(args.passes):
        t0 = time.time()
        acc = 0
        for sa in jobs:
            slot, rr = _pp_front(sa)
            acc += rr.nwin
        ts.append(time.time() - t0)
    dt_serial = statistics.median(ts)
    results["serial"] = round(dt_serial, 3)
    log(f"bench_front: serial {dt_serial:.2f}s "
        f"(spread {min(ts):.2f}-{max(ts):.2f}, {acc} windows)")

    for transport in args.transports.split(","):
        fn = _pp_front if transport == "pickle" else _pp_front_shm
        for nw in [int(x) for x in args.workers.split(",")]:
            ctx = mp.get_context("fork")
            with cf.ProcessPoolExecutor(
                    max_workers=nw, mp_context=ctx, initializer=_pp_init,
                    initargs=(db_path, las_path, cfg)) as ex:
                # warm the pool (fork + first-touch) outside the timing
                list(ex.map(fn, jobs[:nw], chunksize=1))
                ts = []
                for _ in range(args.passes):
                    t0 = time.time()
                    nwin = 0
                    for slot, payload in ex.map(fn, jobs, chunksize=8):
                        rr = (payload if transport == "pickle"
                              else rows_from_shm(payload))
                        nwin += rr.nwin
                    ts.append(time.time() - t0)
            dt = statistics.median(ts)
            key = f"{transport}_{nw}w"
            results[key] = round(dt, 3)
            results[key + "_speedup"] = round(dt_serial / dt, 2)
            log(f"bench_front: {key}: {dt:.2f}s (spread {min(ts):.2f}-"
                f"{max(ts):.2f}, speedup {dt_serial / dt:.2f}x)")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
