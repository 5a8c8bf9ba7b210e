#!/usr/bin/env python
"""Attribute the residual post-correction error at high coverage
(VERDICT r4 item 6: corrected identity is ~99.2% at 40-60x — what is the
remaining ~0.8%?).

Runs the pinned oracle path on a read subset of a 60x simulated dataset,
captures every per-window outcome, and classifies:

  windows:  cov_failed (nb < m) | consensus_failed (no path at k and k2)
            | k2_rescued | exact (winner == true genome segment)
            | winner_err (edit distance > 0, error mass recorded)
  fragment error mass (vs truth):
            frags whose member windows are ALL exact -> seam/stitch error
            frags with >= 1 imperfect window        -> DBG winner error
  counterfactual stitch: every successful window's winner replaced by the
            TRUE genome segment, re-stitched over the same window set —
            its residual error is the pure stitch/seam + truth-boundary
            floor; actual minus counterfactual is the DBG-winner share
  coverage: read bases not covered by any emitted fragment (the indirect
            cost of failed windows; not counted in fragment identity)

Prints one JSON line.  CPU-only (oracle); run with a subset (--reads).
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coverage", type=float, default=60.0)
    ap.add_argument("--genome", type=int, default=30_000)
    ap.add_argument("--reads", type=int, default=40)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--maxalign", type=int, default=0)
    args = ap.parse_args()

    import numpy as np

    from daccord_tpu.align.editdp import edit_distance
    from daccord_tpu.formats.dazzler_db import DazzlerDB
    from daccord_tpu.formats.las import open_piles
    from daccord_tpu.oracle.consensus import ConsensusTables, stitch
    from daccord_tpu.oracle.dbg import window_consensus_adaptive
    from daccord_tpu.oracle.eprof import estimate_error_profile_v2
    from daccord_tpu.pipeline.windows import ReadCache, extract_windows, \
        realign_pile
    from daccord_tpu.sim.simulator import SimConfig, simulate, truth_segment
    from daccord_tpu.utils.config import DaccordConfig

    cachedir = os.path.join(REPO, ".bench_cache", "attr")
    os.makedirs(cachedir, exist_ok=True)
    tag = f"a{args.coverage:g}_{args.genome}_{args.seed}"
    db_path = os.path.join(cachedir, tag + ".db")
    las_path = os.path.join(cachedir, tag + ".las")
    ds = simulate(SimConfig(seed=args.seed, genome_len=args.genome,
                            coverage=args.coverage, read_len=(1800, 2600)))
    if not os.path.exists(las_path):
        ds.write(db_path, las_path)
    db = DazzlerDB.open(db_path)
    las = open_piles(las_path)
    las.build_index()
    cfg = DaccordConfig()
    if args.maxalign:
        cfg = cfg.replace(d=args.maxalign)
    profile = estimate_error_profile_v2(db, las, cfg)
    tables = ConsensusTables(profile, cfg)
    cache = ReadCache(db)

    W = dict(total=0, cov_failed=0, cons_failed=0, k2_rescued=0,
             exact=0, winner_err=0)
    winner_err_mass = 0
    F = dict(total=0, all_exact=0, mixed=0)
    seam_err = dbg_err = 0
    cf_err = cf_truth = 0
    frag_truth = 0
    read_len_total = 0
    uncovered = 0

    n = min(args.reads, db.nreads)
    for aread in range(n):
        A = db.read_codes(aread)
        rlen = len(A)
        read_len_total += rlen
        pile = las.pile(aread)
        realigned, _ = realign_pile(A, pile, cache, las.tspace,
                                    w=cfg.w, a=cfg.a)
        wps = extract_windows(A, realigned, cfg)
        winners = []
        exactness = []
        for wi, wp in enumerate(wps):
            W["total"] += 1
            if wp.failed_coverage:
                W["cov_failed"] += 1
                winners.append(None)
                exactness.append(None)
                continue
            plq_w, pbw_w = tables.for_window(wi * cfg.a, rlen)
            res, kused = window_consensus_adaptive(wp.strings, cfg,
                                                   plq_w, pbw_w)
            if res is None:
                W["cons_failed"] += 1
                winners.append(None)
                exactness.append(None)
                continue
            if kused == cfg.k2:
                W["k2_rescued"] += 1
            truth = truth_segment(ds, aread, wi * cfg.a, wi * cfg.a + cfg.w)
            d = edit_distance(res, truth)
            if d == 0:
                W["exact"] += 1
                exactness.append(True)
            else:
                W["winner_err"] += 1
                winner_err_mass += d
                exactness.append(False)
            winners.append(res)
        # counterfactual: truth-winner stitch over the SAME window set
        winners_t = [None if w is None else
                     truth_segment(ds, aread, wi * cfg.a, wi * cfg.a + cfg.w)
                     for wi, w in enumerate(winners)]
        for (astart, aend, seq) in stitch(winners_t, cfg):
            if len(seq) < max(cfg.l, 200):
                continue
            truth = truth_segment(ds, aread, astart, aend)
            if len(truth) < 200:
                continue
            cf_err += edit_distance(seq, truth)
            cf_truth += len(truth)

        frags = stitch(winners, cfg)
        covered = 0
        for (astart, aend, seq) in frags:
            if len(seq) < max(cfg.l, 200):
                continue
            covered += aend - astart
            truth = truth_segment(ds, aread, astart, aend)
            if len(truth) < 200:
                continue
            d = edit_distance(seq, truth)
            members = range(astart // cfg.a, (aend - cfg.w) // cfg.a + 1)
            allx = all(exactness[m] for m in members)
            F["total"] += 1
            frag_truth += len(truth)
            if allx:
                F["all_exact"] += 1
                seam_err += d
            else:
                F["mixed"] += 1
                dbg_err += d
        uncovered += max(0, rlen - covered)
        if (aread + 1) % 10 == 0:
            log(f"attr: {aread + 1}/{n} reads")

    out = dict(
        coverage=args.coverage, reads=n, maxalign=args.maxalign or cfg.d,
        windows=W, winner_err_mass=int(winner_err_mass),
        fragments=F,
        frag_truth_bases=int(frag_truth),
        seam_err_mass=int(seam_err), dbg_err_mass=int(dbg_err),
        frag_err_rate=round((seam_err + dbg_err) / max(1, frag_truth), 5),
        seam_share=round(seam_err / max(1, seam_err + dbg_err), 3),
        dbg_share=round(dbg_err / max(1, seam_err + dbg_err), 3),
        counterfactual_stitch_err_rate=round(cf_err / max(1, cf_truth), 5),
        uncovered_frac=round(uncovered / max(1, read_len_total), 4),
    )
    log(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
