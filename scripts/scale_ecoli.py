#!/usr/bin/env python
"""Reference-scale run: E. coli-sized genome (4.6 Mb) at 30x coverage
through the full TPU pipeline (VERDICT r4 item 5 — convert config 2's
"stand-in" to the actual named scale).

Streams output to a FASTA file (bounded memory), records throughput, RSS
peak, the C++ CPU denominator on a read-id-prefix subset, and writes
SCALE_r5.json at the repo root.  ~125k reads; budget ~1 h on the
tunneled chip at current rates.
"""

import json
import os
import resource
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.run_configs import log, prepare  # noqa: E402


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome", type=int, default=4_600_000)
    ap.add_argument("--cov", type=float, default=30.0)
    ap.add_argument("--cpu-subset", type=int, default=400,
                    help="reads for the C++ denominator subset (0=skip)")
    ap.add_argument("--out", default=os.path.join(REPO, "SCALE_r5.json"))
    args = ap.parse_args()

    from daccord_tpu.pipeline.runner import run_tpu
    from daccord_tpu.pipeline.warmup import warm_step_variants
    from daccord_tpu.utils.config import DaccordConfig
    from daccord_tpu.utils.jaxsetup import setup_compilation_cache

    cachedir = os.path.join(REPO, ".bench_cache", "scale")
    os.makedirs(cachedir, exist_ok=True)
    c = dict(name="ecoli-full-30x", genome=args.genome, cov=args.cov,
             feats=[])
    db, las, nreads = prepare(c, 1.0, cachedir)
    log(f"scale: dataset ready ({nreads} reads)")
    cfg = DaccordConfig(batch_windows=256)
    setup_compilation_cache()

    t0 = time.time()
    warm_step_variants(cfg, log=log)
    run_tpu(db, las, cfg.replace(I=(0, 300)))
    warm_s = time.time() - t0
    log(f"scale: warm {warm_s:.1f}s")

    fasta = os.path.join(cachedir, "ecoli30x.fasta")
    nrec = [0]
    t0 = time.time()
    with open(fasta, "w") as f:
        def sink(name, seq):
            f.write(f">{name}\n{seq}\n")
            nrec[0] += 1
        recs, stats = run_tpu(db, las, cfg, sink=sink)
    dt = time.time() - t0
    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2 ** 20
    rps = stats.reads / dt
    wps = stats.windows / dt
    log(f"scale: {stats.reads} reads / {stats.windows} windows in "
        f"{dt:.0f}s -> {rps:.2f} reads/s, {wps:.0f} windows/s, "
        f"RSS {rss_gb:.2f} GB, {nrec[0]} records, k2={stats.k2_retries}")

    out = dict(genome=args.genome, coverage=args.cov, reads=stats.reads,
               windows=stats.windows, seconds=round(dt, 1),
               reads_per_s=round(rps, 2), windows_per_s=round(wps, 1),
               rss_gb=round(rss_gb, 2), warm_s=round(warm_s, 1),
               records=nrec[0], k2_retries=stats.k2_retries,
               windows_ok=stats.windows_ok, batches=stats.batches)

    if args.cpu_subset:
        log(f"scale: C++ denominator on {args.cpu_subset}-read subset ...")
        from daccord_tpu.pipeline.cpu_runner import run_cpu
        sub = cfg.replace(I=(0, args.cpu_subset))
        t0 = time.time()
        recs_c, stats_c = run_cpu(db, las, sub,
                                  nthreads=os.cpu_count() or 1)
        dt_c = time.time() - t0
        out["cpu_cxx_subset_reads"] = args.cpu_subset
        out["cpu_cxx_reads_per_s"] = round(stats_c.reads / dt_c, 2)
        out["vs_baseline"] = round(rps / (10.0 * stats_c.reads / dt_c), 3)
        log(f"scale: C++ {stats_c.reads / dt_c:.2f} reads/s @ all cores "
            f"-> vs_baseline {out['vs_baseline']}")

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
