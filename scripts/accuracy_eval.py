#!/usr/bin/env python
"""End-to-end correction-accuracy evaluation against simulator ground truth.

The reference's headline claim (Tischler & Myers 2017; SURVEY §0, §6) is
post-correction identity, not just throughput.  This script runs the full
pipeline on the bench dataset (known genome) and reports, over all corrected
fragments, the raw-read vs corrected-read error rate against the true genome
segment under each fragment (sim.truth_segment).

Usage:
  python scripts/accuracy_eval.py [--backend tpu|oracle] [--reads N]

Prints a human summary to stderr and ONE JSON summary line to stdout.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", choices=["tpu", "oracle"], default="tpu")
    ap.add_argument("--reads", type=int, default=0, help="limit to first N reads")
    ap.add_argument("--min-frag", type=int, default=200)
    ap.add_argument("--coverage", type=float, default=0,
                    help="override sim coverage (uses a fresh tmp dataset)")
    ap.add_argument("--genome-len", type=int, default=0)
    ap.add_argument("--seed", type=int, default=-1)
    ap.add_argument("--maxalign", type=int, default=0,
                    help="override -d/--maxalign (pile depth cap)")
    args = ap.parse_args()

    if args.backend == "oracle":
        import jax
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from bench import SIM, ensure_dataset
    from daccord_tpu.align.editdp import edit_distance
    from daccord_tpu.formats.dazzler_db import DazzlerDB, str_to_codes
    from daccord_tpu.sim.simulator import SimConfig, simulate, truth_segment
    from daccord_tpu.utils.config import DaccordConfig

    sim = dict(SIM)
    if args.coverage:
        sim["coverage"] = args.coverage
    if args.genome_len:
        sim["genome_len"] = args.genome_len
    if args.seed >= 0:
        sim["seed"] = args.seed
    if sim != SIM:
        import tempfile
        tmp = tempfile.mkdtemp(prefix="accuracy_eval_")
        db_path = os.path.join(tmp, "acc.db")
        las_path = os.path.join(tmp, "acc.las")
        ds = simulate(SimConfig(**{**sim, "read_len": tuple(sim["read_len"])}))
        ds.write(db_path, las_path)
        print(f"accuracy_eval: simulated {sim} -> {len(ds.reads)} reads",
              file=sys.stderr, flush=True)
    else:
        db_path, las_path = ensure_dataset()
        ds = simulate(SimConfig(**{**sim, "read_len": tuple(sim["read_len"])}))
    db = DazzlerDB.open(db_path)

    cfg = DaccordConfig()
    if args.reads:
        cfg = cfg.replace(I=(0, args.reads))
    if args.maxalign:
        cfg = cfg.replace(d=args.maxalign)
    t0 = time.time()
    if args.backend == "tpu":
        from daccord_tpu.pipeline.runner import run_tpu
        records, stats = run_tpu(db_path, las_path, cfg)
    else:
        from daccord_tpu.oracle.consensus import run_oracle
        records, stats = run_oracle(db_path, las_path, cfg)
    dt = time.time() - t0
    print(f"accuracy_eval: {stats.reads} reads / {stats.windows} windows "
          f"corrected in {dt:.1f}s ({args.backend})", file=sys.stderr, flush=True)

    tot_truth = tot_raw_err = tot_cor_err = 0
    n_frag = n_improved = 0
    rates = []
    for header, seq in records:
        aread, rng_part = header.split("/")
        astart, aend = map(int, rng_part.split("_"))
        aread = int(aread)
        if aend - astart < args.min_frag:
            continue
        truth = truth_segment(ds, aread, astart, aend)
        if len(truth) < args.min_frag:
            continue
        A = db.read_codes(aread)
        corrected = str_to_codes(seq)
        d_raw = edit_distance(A[astart:aend], truth)
        d_cor = edit_distance(corrected, truth)
        n_frag += 1
        tot_truth += len(truth)
        tot_raw_err += d_raw
        tot_cor_err += d_cor
        rates.append((d_raw / len(truth), d_cor / len(truth)))
        if d_cor < d_raw:
            n_improved += 1

    raw_rate = tot_raw_err / max(1, tot_truth)
    cor_rate = tot_cor_err / max(1, tot_truth)
    med_raw = float(np.median([r for r, _ in rates])) if rates else 0.0
    med_cor = float(np.median([c for _, c in rates])) if rates else 0.0
    print(f"accuracy_eval: {n_frag} fragments >= {args.min_frag}bp, "
          f"{tot_truth} truth bases", file=sys.stderr)
    print(f"  raw error rate       {raw_rate:.4f}  (median {med_raw:.4f})",
          file=sys.stderr)
    print(f"  corrected error rate {cor_rate:.4f}  (median {med_cor:.4f})",
          file=sys.stderr)
    print(f"  identity {1 - raw_rate:.4%} -> {1 - cor_rate:.4%}; "
          f"improved {n_improved}/{n_frag}", file=sys.stderr, flush=True)
    print(json.dumps({
        "fragments": n_frag,
        "truth_bases": int(tot_truth),
        "raw_error_rate": round(raw_rate, 5),
        "corrected_error_rate": round(cor_rate, 5),
        "raw_identity": round(1 - raw_rate, 5),
        "corrected_identity": round(1 - cor_rate, 5),
        "improved_fraction": round(n_improved / max(1, n_frag), 4),
        "backend": args.backend,
        "maxalign": args.maxalign or cfg.d,
        "run_seconds": round(dt, 1),
        "reads_per_s": round(stats.reads / dt, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
