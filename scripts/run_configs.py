#!/usr/bin/env python
"""Run the five BASELINE benchmark configs (synthetic stand-ins).

BASELINE.json names five configs (E. coli 10x subset ... human chr20 60x).
Real genomes are not available in this environment (zero egress), so each
config is a *synthetic stand-in* that preserves the config's structural
features — coverage, adaptive-k, multi-.las piles, sharded DB, multi-part
(2-host model) execution, pod-slice mesh — at a tractable genome size
(documented scale factors).  Usage:

    python scripts/run_configs.py [--configs 1,2,3] [--scale 1.0]

Prints one JSON line per config with throughput and correctness info.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def log(m):
    print(m, file=sys.stderr, flush=True)


CONFIGS = {
    1: dict(name="ecoli-10x-subset", genome=30_000, cov=10.0, feats=[]),
    2: dict(name="ecoli-30x-adaptive-k", genome=30_000, cov=30.0,
            feats=["adaptive_k"]),
    3: dict(name="yeast-40x-multilas", genome=60_000, cov=40.0,
            feats=["multilas"]),
    4: dict(name="dmel-50x-2host", genome=80_000, cov=50.0,
            feats=["parts2"]),
    5: dict(name="chr20-60x-podslice", genome=1_000_000, cov=60.0,
            feats=["mesh"]),
    # config 5 runs at a 1 Mb stand-in genome since round 4 (~27k reads /
    # ~6M windows at 60x — VERDICT r3 item 3 asked for >= 1 Mb; rounds 1-3
    # used 100 kb).  reads/s is a per-read rate, so round-3 numbers remain
    # comparable; the 1 Mb run additionally proves bounded-memory streaming
    # at scale (see scripts/stress_stream.py for the RSS-asserted variant).
}


_SIM_SNIPPET = """
import sys, json
sys.path.insert(0, {repo!r})
from daccord_tpu.sim import SimConfig, simulate
from daccord_tpu.formats.las import write_las
ds = simulate(SimConfig(seed=1234, genome_len={g}, coverage={cov},
                        read_len=(1800, 2600)))
ds.write({db!r}, {las!r})
las_files = [{las!r}]
if {multilas}:
    ev = [o for o in ds.overlaps if o.bread % 2 == 0]
    od = [o for o in ds.overlaps if o.bread % 2 == 1]
    la, lb = {las!r} + ".a", {las!r} + ".b"
    write_las(la, ds.cfg.tspace, ev)
    write_las(lb, ds.cfg.tspace, od)
    las_files = [la, lb]
json.dump({{"nreads": len(ds.reads), "las": las_files}}, open({meta!r}, "w"))
"""


def prepare(c, scale, cachedir):
    g = int(c["genome"] * scale)
    tag = f"{c['name']}-{g}-{c['cov']}"
    db = os.path.join(cachedir, f"{tag}.db")
    las = os.path.join(cachedir, f"{tag}.las")
    meta = os.path.join(cachedir, f"{tag}.json")
    if not os.path.exists(meta):
        # simulate in a clean subprocess: no jax threads, no axon handshake
        # (the TPU-attached parent process has hung inside large sims)
        import subprocess
        log(f"[{c['name']}] simulating genome={g} cov={c['cov']} ...")
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        code = _SIM_SNIPPET.format(repo=repo, g=g, cov=c["cov"], db=db,
                                   las=las, meta=meta,
                                   multilas=("multilas" in c["feats"]))
        subprocess.run([sys.executable, "-c", code], env=env, check=True)
    m = json.load(open(meta))
    return db, m["las"], m["nreads"]


def run_config(idx, scale, cachedir):
    from daccord_tpu.pipeline.runner import run_tpu
    from daccord_tpu.parallel.distributed import merge_parts, run_part
    from daccord_tpu.utils.config import DaccordConfig

    c = CONFIGS[idx]
    db, las, nreads = prepare(c, scale, cachedir)
    cfg = DaccordConfig(batch_windows=256)
    # warm compiles + first-execution loads so per-config numbers are
    # steady-state (one-time costs amortize in production runs).  A FULL
    # warm pass: a 2-read warmup leaves most depth-bucket executables
    # unloaded, and on the tunneled chip each first execution pays a
    # multi-second device-side load (config 1 measured 152s with partial
    # warmup vs ~4s steady)
    # (must warm the SAME executables the timed pass runs: the mesh path
    # compiles separate shard_map-wrapped kernels).  warm_step_variants
    # covers the full (depth bucket x operand form x k2) executable space
    # directly — a read-prefix warm run alone misses shallow buckets
    # (genome-edge reads) and the per-window remainder forms, which round
    # 4 measured as ~330 s of mid-run compile/load inside a "warmed"
    # config-5 pass.  Large configs then warm-run a 300-read prefix for
    # the front-half/mesh incidentals.
    from daccord_tpu.pipeline.warmup import warm_step_variants
    warm_step_variants(cfg, log=log)
    warm_cfg = cfg if nreads <= 1000 else cfg.replace(I=(0, 300))
    run_tpu(db, las, warm_cfg, use_mesh=("mesh" in c["feats"]) or None)
    t0 = time.time()
    if "parts2" in c["feats"]:
        outdir = os.path.join(cachedir, f"parts-{c['name']}")
        for p in range(2):  # 2-host model: two planned parts
            run_part(db, las, cfg, p, 2, outdir)
        dest = os.path.join(cachedir, f"{c['name']}.fasta")
        nrec = merge_parts(outdir, 2, dest)
        stats_d = {"records": nrec}
        reads, windows = nreads, None
    else:
        recs, stats = run_tpu(db, las, cfg,
                              use_mesh=("mesh" in c["feats"]) or None)
        stats_d = {"records": len(recs), "windows": stats.windows,
                   "windows_ok": stats.windows_ok,
                   "k2_retries": stats.k2_retries}
        reads, windows = stats.reads, stats.windows
    dt = time.time() - t0
    out = {"config": idx, "name": c["name"], "seconds": round(dt, 1),
           "reads": reads, "reads_per_s": round(nreads / dt, 2), **stats_d}
    print(json.dumps(out), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="1,2,3,4,5")
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--cache", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_cache", "configs"))
    args = ap.parse_args()
    os.makedirs(args.cache, exist_ok=True)
    for idx in [int(x) for x in args.configs.split(",")]:
        run_config(idx, args.scale, args.cache)


if __name__ == "__main__":
    main()
