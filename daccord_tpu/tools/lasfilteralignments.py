"""``lasfilteralignments`` CLI — pile hygiene by windowed-error filtering.

Reference: gt1/daccord ``src/lasfilteralignments.cpp`` (SURVEY §2.1, §3.3):
pass 1 computes per-alignment, per-trace-block error rates and fits the
expected error distribution; pass 2 re-streams and drops alignments whose
WINDOWED error is inconsistent with it (repeat-induced spurious alignments:
a good repeat segment flanked by badly-aligning sequence keeps a modest
global rate but an extreme local one).

Pinned rule [PINNED-HERE, reference-shaped]:
  pass 1: per alignment, sliding windows of ``--nw`` consecutive trace
          blocks (alignments with fewer blocks use one window over all);
          window rate = sum(block diffs) / sum(block A-spans).  Fit mean
          and std of ALL window rates in the file.
  pass 2: keep an alignment iff its MAX window rate <= mean + sigma*std
          (``--sigma``, default 3.0) and its global rate <= ``-e`` when
          given.  Deterministic; fully vectorized over (alignment, block).

With ``-E <eprof.json>`` (the artifact ``daccord -E`` estimates and saves —
ONE fitted error distribution shared across the toolchain), the expected
window-rate distribution comes from the profile instead of the file-local
fit: mu = 2*(e_sub+e_ins+e_del) (the profile stores halved per-read rates;
trace diffs count both reads' errors), per-window std = binomial
sqrt(mu*(1-mu)/span).  Keep iff every window's z-score <= sigma.  This
avoids contaminating the fit with the very outliers being filtered, and
gives short alignments the wider tolerance their smaller spans warrant.

Diff-domain calibration [PINNED-HERE]: recorded trace diffs depend on the
producer's aligner (daligner's are near-minimal edit ops, matching eprof's
realignment domain; our simulator's are composition-exact and run ~1.2x
higher).  mu is therefore scaled by clip(median(window rates)/mu, 0.5, 2)
before cutting — the ROBUST location (median is immune to the outlier tail
being filtered) absorbs the convention constant while the artifact keeps
supplying the distribution used for the span-aware tolerance.
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional, Tuple

import numpy as np

from daccord_tpu.formats.las import LasFile, write_las
from daccord_tpu.pipeline.windows import trace_block_bounds


def block_tables(las: LasFile) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(diffs [N, BMAX], spans [N, BMAX], valid [N, BMAX]) per trace block."""
    N = las.novl
    nb = np.zeros(N, dtype=np.int64)
    for i, o in enumerate(las):
        nb[i] = len(o.trace)
    BMAX = int(nb.max()) if N else 1
    diffs = np.zeros((N, max(BMAX, 1)), dtype=np.int64)
    spans = np.ones((N, max(BMAX, 1)), dtype=np.int64)
    valid = np.zeros((N, max(BMAX, 1)), dtype=bool)
    for i, o in enumerate(las):
        n = len(o.trace)
        if n == 0:
            continue
        bounds = trace_block_bounds(o.abpos, o.aepos, las.tspace)
        diffs[i, :n] = o.trace[:, 0]
        spans[i, :n] = np.maximum(np.diff(bounds), 1)
        valid[i, :n] = True
    return diffs, spans, valid


def window_rates(diffs: np.ndarray, spans: np.ndarray, valid: np.ndarray,
                 nw: int) -> Tuple[np.ndarray, np.ndarray]:
    """(max window rate [N], all window rates flat) over nw-block windows.

    Alignments with fewer than nw blocks get one window over all blocks.
    """
    N, BMAX = diffs.shape
    d = np.where(valid, diffs, 0)
    s = np.where(valid, spans, 0)
    cd = np.concatenate([np.zeros((N, 1), np.int64), np.cumsum(d, 1)], 1)
    cs = np.concatenate([np.zeros((N, 1), np.int64), np.cumsum(s, 1)], 1)
    nb = valid.sum(axis=1)
    nww = np.minimum(np.maximum(nb, 1), nw)              # per-row window len
    maxr = np.zeros(N, dtype=np.float64)
    allr: List[np.ndarray] = []
    for w in np.unique(nww):
        rows = np.nonzero(nww == w)[0]
        if not len(rows):
            continue
        J = BMAX - w + 1
        wd = cd[rows, w:w + J] - cd[rows, 0:J]
        ws = cs[rows, w:w + J] - cs[rows, 0:J]
        ok = (np.arange(J)[None, :] + w) <= nb[rows][:, None]
        r = np.where(ok & (ws > 0), wd / np.maximum(ws, 1), 0.0)
        maxr[rows] = r.max(axis=1)
        allr.append(r[ok & (ws > 0)])
    flat = (np.concatenate(allr) if allr
            else np.zeros(0, dtype=np.float64))
    return maxr, flat


def window_zscores(diffs: np.ndarray, spans: np.ndarray, valid: np.ndarray,
                   nw: int, mu: float) -> np.ndarray:
    """Max over windows of (rate - mu) / sqrt(mu*(1-mu)/span): the
    profile-driven (-E) variant of the pass-2 statistic.  Same windowing
    as window_rates; the binomial std gives each window a span-correct
    tolerance instead of one file-global std."""
    N, BMAX = diffs.shape
    d = np.where(valid, diffs, 0)
    s = np.where(valid, spans, 0)
    cd = np.concatenate([np.zeros((N, 1), np.int64), np.cumsum(d, 1)], 1)
    cs = np.concatenate([np.zeros((N, 1), np.int64), np.cumsum(s, 1)], 1)
    nb = valid.sum(axis=1)
    nww = np.minimum(np.maximum(nb, 1), nw)
    var1 = max(mu * (1.0 - mu), 1e-12)           # per-base rate variance
    maxz = np.full(N, -np.inf, dtype=np.float64)
    for w in np.unique(nww):
        rows = np.nonzero(nww == w)[0]
        if not len(rows):
            continue
        J = BMAX - w + 1
        wd = cd[rows, w:w + J] - cd[rows, 0:J]
        ws = cs[rows, w:w + J] - cs[rows, 0:J]
        ok = ((np.arange(J)[None, :] + w) <= nb[rows][:, None]) & (ws > 0)
        r = wd / np.maximum(ws, 1)
        z = (r - mu) / np.sqrt(var1 / np.maximum(ws, 1))
        maxz[rows] = np.where(ok, z, -np.inf).max(axis=1)
    return maxz


def profile_mu(path: str) -> float:
    """Expected pairwise diff rate from a ``-E`` eprof artifact (v1 scalar
    or v2 positional; rates there are halved per-read rates, ALGORITHM §7)."""
    from daccord_tpu.oracle.eprof import ErrorProfile, load_profile
    prof = load_profile(path)
    if not isinstance(prof, ErrorProfile):
        prof = prof.scalar()
    return 2.0 * (prof.e_sub + prof.e_ins + prof.e_del)


def global_rates(diffs: np.ndarray, spans: np.ndarray,
                 valid: np.ndarray) -> np.ndarray:
    d = np.where(valid, diffs, 0).sum(axis=1)
    s = np.where(valid, spans, 0).sum(axis=1)
    return np.minimum(d / np.maximum(s, 1), 1.0)


def load_repeats(path: str) -> dict:
    """aread -> sorted merged [start, end) interval arrays, from the
    tab-separated output of lasdetectsimplerepeats."""
    per: dict = {}
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 3:
                continue
            a, s, e = int(parts[0]), int(parts[1]), int(parts[2])
            per.setdefault(a, []).append((s, e))
    out: dict = {}
    for a, ivs in per.items():
        ivs.sort()
        merged = [list(ivs[0])]
        for s, e in ivs[1:]:
            if s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        out[a] = np.asarray(merged, dtype=np.int64)
    return out


def repeat_masked(las: LasFile, repeats: dict, frac: float) -> np.ndarray:
    """keep mask [N]: False where the alignment's A-span is covered >= frac
    by the aread's repeat intervals (repeat-induced: no unique anchor).

    Pinned rule [PINNED-HERE]: coverage = |aspan INTERSECT union(intervals)|
    / (aepos - abpos); drop iff coverage >= frac (default 0.95 — detector
    boundaries are depth-crossing points, so contained alignments can spill
    a few bases).  This is the pile-masking consumer of
    lasdetectsimplerepeats (gt1/daccord src/lasdetectsimplerepeats.cpp
    "intervals used to mask piles", SURVEY §2.1)."""
    keep = np.ones(las.novl, dtype=bool)
    for i, o in enumerate(las):
        ivs = repeats.get(o.aread)
        if ivs is None:
            continue
        lo = np.maximum(ivs[:, 0], o.abpos)
        hi = np.minimum(ivs[:, 1], o.aepos)
        cov = int(np.maximum(hi - lo, 0).sum())
        if cov >= frac * (o.aepos - o.abpos):
            keep[i] = False
    return keep


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(prog="lasfilteralignments")
    p.add_argument("out_las")
    p.add_argument("in_las")
    p.add_argument("--sigma", type=float, default=3.0,
                   help="drop alignments whose max window rate exceeds "
                        "mean + sigma*std of the fitted distribution")
    p.add_argument("--nw", type=int, default=5,
                   help="trace blocks per error window")
    p.add_argument("-e", type=float, default=None,
                   help="absolute max global error rate")
    p.add_argument("-E", dest="eprof", default=None,
                   help="eprof artifact (from daccord -E): derive the "
                        "expected window-rate distribution from the shared "
                        "profile instead of the file-local fit")
    p.add_argument("--repeats", default=None,
                   help="lasdetectsimplerepeats output: drop alignments "
                        "whose A-span is covered >= --repeat-frac by a "
                        "repeat interval (repeat-induced, no unique anchor)")
    p.add_argument("--repeat-frac", type=float, default=0.95)
    args = p.parse_args(argv)

    las = LasFile.open(args.in_las)
    diffs, spans, valid = block_tables(las)              # pass 1
    if args.eprof is not None:
        mu0 = profile_mu(args.eprof)
        _, flat = window_rates(diffs, spans, valid, args.nw)
        cal = (float(np.clip(np.median(flat) / max(mu0, 1e-9), 0.5, 2.0))
               if len(flat) else 1.0)
        mu = cal * mu0
        maxz = window_zscores(diffs, spans, valid, args.nw, mu)
        keep = maxz <= args.sigma                        # pass 2
        desc = f"eprof mu={mu0:.4f} cal={cal:.3f}"
    else:
        maxr, flat = window_rates(diffs, spans, valid, args.nw)
        if len(flat):
            cut = float(flat.mean()) + args.sigma * float(flat.std())
        else:
            cut = 1.0
        keep = maxr <= cut                               # pass 2
        desc = f"window cut={cut:.4f}"
    if args.e is not None:
        keep &= global_rates(diffs, spans, valid) <= args.e
    if args.repeats is not None:
        rmask = repeat_masked(las, load_repeats(args.repeats),
                              args.repeat_frac)
        desc += f", repeats dropped {int((~rmask).sum())}"
        keep &= rmask
    kept = [o for i, o in enumerate(las) if keep[i]]
    write_las(args.out_las, las.tspace, kept)
    print(f"[lasfilteralignments] kept {len(kept)}/{las.novl} "
          f"({desc}, nw={args.nw})", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
