#!/usr/bin/env python
"""Robust C++ CPU baseline measurement (VERDICT r3 item 1).

The north-star denominator (10x the C++ daccord analog's reads/s) was
previously a one-shot measurement cached forever; three captures of the
same benchmark disagreed 9-61 reads/s because the runs were contended
(TPU-attached parent threads; front-half native threads defaulting to 4
even in the "1 thread" run).  This harness pins the protocol:

- every (config, nthreads) cell runs in a FRESH subprocess with
  PALLAS_AXON_POOL_IPS stripped, JAX_PLATFORMS=cpu and
  DACCORD_NATIVE_THREADS=<nthreads> (so "1 thread" is truly serial
  end-to-end, front half included);
- >= 3 timed passes per cell; the MEDIAN is the reported number and the
  min/max spread is recorded next to it;
- a thread-scaling sanity check: if median(mt)/median(1t) < half the
  core count the cell pair is re-measured once, and if still low the
  result is marked "contended": true — consumers (bench.py) must refuse
  to cache a contended measurement;
- a load guard: each cell waits (up to --load-wait s) for 1-min loadavg
  to drop below 0.5 so a busy host is detected up front, not discovered
  in the spread.

Usage:
  python scripts/cpu_baseline.py --configs bench,1,2,3,4,5 --passes 3 \
      [--out CPU_BASELINE.json]
  python scripts/cpu_baseline.py --worker --db X --las a.las[,b.las] \
      --threads N --passes 3        # internal: one measurement cell

Reference parity: measures the same full pipeline as gt1/daccord's
`daccord -t<n>` (SURVEY §3.1) — pile realign + window consensus (native
C++ sparse DBG, cpu_consensus.cpp) + stitch + FASTA emission.
"""

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(m):
    print(m, file=sys.stderr, flush=True)


# ---------------------------------------------------------------- worker

def worker_main(args):
    """One measurement cell: --passes timed full-pipeline runs at a fixed
    thread count, in THIS process (the parent spawned us with a clean env).
    Prints one JSON line."""
    os.environ["DACCORD_NATIVE_THREADS"] = str(args.threads)
    from daccord_tpu.pipeline.cpu_runner import run_cpu
    from daccord_tpu.utils.config import DaccordConfig

    las = args.las.split(",") if "," in args.las else args.las
    cfg = DaccordConfig()
    profile = None
    if args.subset:
        # bounded-duration cell: measure reads/s on the first N reads (the
        # simulator places reads uniformly, so a read-id prefix is a
        # representative sample; reads/s is a per-read rate).  The error
        # profile is estimated ONCE, untimed: in a full run its cost is
        # amortized over every read (~0 per read), so leaving it inside a
        # subset-timed pass would deflate the C++ rate and flatter
        # vs_baseline.  The timed region is the steady-state per-read work
        # (pile realign + window consensus + stitch + emit), same as the
        # reference's -t loop.
        cfg = cfg.replace(I=(0, args.subset))
        from daccord_tpu.formats.dazzler_db import DazzlerDB
        from daccord_tpu.formats.las import open_piles
        from daccord_tpu.oracle.eprof import estimate_error_profile_v2
        profile = estimate_error_profile_v2(
            DazzlerDB.open(args.db), open_piles(las), cfg)
    rps, reads, windows = [], 0, 0
    for _ in range(args.passes):
        t0 = time.time()
        recs, stats = run_cpu(args.db, las, cfg, profile=profile,
                              nthreads=args.threads)
        dt = time.time() - t0
        rps.append(stats.reads / dt)
        reads, windows = stats.reads, stats.windows
    import hashlib
    h = hashlib.sha256(repr(recs).encode()).hexdigest()[:16]
    print(json.dumps({"threads": args.threads, "passes": [round(x, 3) for x in rps],
                      "reads": reads, "windows": windows, "records_hash": h}))


# ---------------------------------------------------------------- driver

def _clean_env():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    return env


def wait_for_idle(max_wait: float, thresh: float = 0.5):
    t0 = time.time()
    while time.time() - t0 < max_wait:
        load = os.getloadavg()[0]
        if load < thresh:
            return load
        log(f"cpu_baseline: loadavg {load:.2f} >= {thresh}, waiting ...")
        time.sleep(5.0)
    return os.getloadavg()[0]


def run_cell(db, las, threads, passes, load_wait, subset=0):
    load = wait_for_idle(load_wait)
    cmd = [sys.executable, os.path.abspath(__file__), "--worker",
           "--db", db, "--las", las if isinstance(las, str) else ",".join(las),
           "--threads", str(threads), "--passes", str(passes),
           "--subset", str(subset)]
    r = subprocess.run(cmd, env=_clean_env(), capture_output=True, text=True)
    if r.returncode != 0:
        raise RuntimeError(f"cpu_baseline worker failed:\n{r.stderr[-2000:]}")
    d = json.loads(r.stdout.strip().splitlines()[-1])
    d["loadavg_at_start"] = round(load, 2)
    return d


def measure_config(db, las, passes, load_wait, subset=0):
    """Measure 1t and all-core cells with the scaling sanity check."""
    ncores = os.cpu_count() or 1
    for attempt in range(2):
        c1 = run_cell(db, las, 1, passes, load_wait, subset)
        cm = run_cell(db, las, ncores, passes, load_wait, subset)
        med1 = statistics.median(c1["passes"])
        medm = statistics.median(cm["passes"])
        ratio = medm / med1 if med1 > 0 else 0.0
        contended = ratio < 0.5 * ncores
        log(f"cpu_baseline: 1t={med1:.2f} (spread {min(c1['passes']):.2f}-"
            f"{max(c1['passes']):.2f})  {ncores}t={medm:.2f} (spread "
            f"{min(cm['passes']):.2f}-{max(cm['passes']):.2f})  "
            f"scaling={ratio:.2f}x{' CONTENDED' if contended else ''}")
        if not contended or attempt == 1:
            break
        log("cpu_baseline: scaling sanity failed, re-measuring the cell pair")
    if c1["records_hash"] != cm["records_hash"]:
        raise RuntimeError("C++ baseline output differs across thread counts "
                           f"({c1['records_hash']} vs {cm['records_hash']}) — "
                           "determinism invariant violated")
    return {
        "ncores": ncores,
        "subset": subset,
        "reads": cm["reads"], "windows": cm["windows"],
        "rps_1t": round(med1, 3),
        "rps_1t_passes": c1["passes"],
        "rps_mt": round(medm, 3),
        "rps_mt_passes": cm["passes"],
        "scaling_1t_to_mt": round(ratio, 2),
        "contended": contended,
        "records_hash": cm["records_hash"],
    }


def dataset_for(name, cachedir):
    """Resolve a config name to (db, las) paths, simulating on first touch."""
    if name == "bench":
        import bench
        return bench.ensure_dataset()
    from run_configs import CONFIGS, prepare
    idx = int(name)
    db, las, _ = prepare(CONFIGS[idx], 1.0, cachedir)
    return db, las


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--db")
    ap.add_argument("--las")
    ap.add_argument("--threads", type=int, default=1)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--subset", type=int, default=0)
    ap.add_argument("--subsets", default="",
                    help="per-config read-count caps, e.g. 3=400,4=300,5=250"
                         " (0/absent = full config)")
    ap.add_argument("--configs", default="bench")
    ap.add_argument("--load-wait", type=float, default=120.0)
    ap.add_argument("--out", default=None)
    ap.add_argument("--cache", default=os.path.join(
        REPO, ".bench_cache", "configs"))
    args = ap.parse_args()
    if args.worker:
        return worker_main(args)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    os.makedirs(args.cache, exist_ok=True)
    subsets = {}
    for part in args.subsets.split(","):
        if "=" in part:
            nm, val = part.split("=")
            subsets[nm] = int(val)
    results = {}
    for name in args.configs.split(","):
        db, las = dataset_for(name, args.cache)
        sub = subsets.get(name, args.subset)
        log(f"cpu_baseline: config {name}: {db} (subset={sub or 'full'})")
        results[name] = measure_config(db, las, args.passes, args.load_wait,
                                       sub)
        print(json.dumps({"config": name, **results[name]}), flush=True)
    if args.out:
        json.dump(results, open(args.out, "w"), indent=1)
        log(f"cpu_baseline: wrote {args.out}")


if __name__ == "__main__":
    main()
