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

Streaming + chunk invariance [PINNED-HERE, round 4]: the file is processed
in bounded chunks of ``--chunk`` records (O(chunk) memory at any .las
size — the block-scale requirement of the reference tool).  So that the
output is byte-identical for EVERY chunk size, the pass-1 fit is
integer-exact: each window rate is floor-quantized to Q20 fixed point
(r_q = (diffs << 20) // span, clipped at 2.0), and n / sum(r_q) /
sum(r_q^2) / a Q20 histogram are accumulated in exact (Python-int /
int64-bin) arithmetic — associativity-free, so any chunking yields the
same mean/std/median bit-for-bit.  Per-alignment statistics (max window
rate, z-scores, global rate) involve no cross-record reduction and are
chunk-invariant by construction.

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
supplying the distribution used for the span-aware tolerance.  The median
is the Q20 histogram's lower median (exact on the quantized grid).
"""

from __future__ import annotations

import argparse
import math
import struct
import sys
from typing import Iterator, List, Optional, Tuple

import numpy as np

from daccord_tpu.formats.las import LasFile, _write_record
from daccord_tpu.pipeline.windows import trace_block_bounds

RATE_Q = 20                      # window-rate fixed point for the pass-1 fit
RATE_CLIP = 2 << RATE_Q          # rates can slightly exceed 1.0; clip at 2.0


def block_tables(las, tspace: Optional[int] = None
                 ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(diffs [N, BMAX], spans [N, BMAX], valid [N, BMAX]) per trace block.

    ``las`` may be a LasFile (whole file, legacy/test path) or any sequence
    of Overlap records (one streaming chunk) with ``tspace`` given.
    """
    if tspace is None:
        tspace = las.tspace
        las = list(las)
    N = len(las)
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
        bounds = trace_block_bounds(o.abpos, o.aepos, tspace)
        diffs[i, :n] = o.trace[:, 0]
        spans[i, :n] = np.maximum(np.diff(bounds), 1)
        valid[i, :n] = True
    return diffs, spans, valid


def window_sums(diffs: np.ndarray, spans: np.ndarray, valid: np.ndarray,
                nw: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(wd, ws, ok): per-row padded window diff/span sums over nw-block
    sliding windows (rows with fewer than nw blocks get one window over
    all), plus the window-validity mask.  Shared by the fit, the max-rate
    cut, and the z-score variant."""
    N, BMAX = diffs.shape
    d = np.where(valid, diffs, 0)
    s = np.where(valid, spans, 0)
    cd = np.concatenate([np.zeros((N, 1), np.int64), np.cumsum(d, 1)], 1)
    cs = np.concatenate([np.zeros((N, 1), np.int64), np.cumsum(s, 1)], 1)
    nb = valid.sum(axis=1)
    nww = np.minimum(np.maximum(nb, 1), nw)              # per-row window len
    J = BMAX
    wd = np.zeros((N, J), dtype=np.int64)
    ws = np.zeros((N, J), dtype=np.int64)
    ok = np.zeros((N, J), dtype=bool)
    for w in np.unique(nww):
        rows = np.nonzero(nww == w)[0]
        if not len(rows):
            continue
        Jw = BMAX - w + 1
        wd[rows, :Jw] = cd[rows, w:w + Jw] - cd[rows, 0:Jw]
        ws[rows, :Jw] = cs[rows, w:w + Jw] - cs[rows, 0:Jw]
        ok[rows, :Jw] = (np.arange(Jw)[None, :] + w) <= nb[rows][:, None]
    ok &= ws > 0
    return wd, ws, ok


def window_rates(diffs: np.ndarray, spans: np.ndarray, valid: np.ndarray,
                 nw: int) -> Tuple[np.ndarray, np.ndarray]:
    """(max window rate [N] float, quantized Q20 rates of all valid
    windows, flat int64) over nw-block windows."""
    wd, ws, ok = window_sums(diffs, spans, valid, nw)
    r = np.where(ok, wd / np.maximum(ws, 1), 0.0)
    maxr = r.max(axis=1) if r.shape[1] else np.zeros(len(r))
    rq = np.minimum((wd << RATE_Q) // np.maximum(ws, 1), RATE_CLIP)
    return maxr, rq[ok]


def window_zscores(diffs: np.ndarray, spans: np.ndarray, valid: np.ndarray,
                   nw: int, mu: float) -> np.ndarray:
    """Max over windows of (rate - mu) / sqrt(mu*(1-mu)/span): the
    profile-driven (-E) variant of the pass-2 statistic.  Same windowing
    as window_rates; the binomial std gives each window a span-correct
    tolerance instead of one file-global std."""
    wd, ws, ok = window_sums(diffs, spans, valid, nw)
    var1 = max(mu * (1.0 - mu), 1e-12)           # per-base rate variance
    r = wd / np.maximum(ws, 1)
    z = (r - mu) / np.sqrt(var1 / np.maximum(ws, 1))
    return np.where(ok, z, -np.inf).max(axis=1)


class RateFit:
    """Integer-exact accumulator of the pass-1 window-rate distribution.

    Sums and the Q20 histogram are exact, so mean/std/median are identical
    for any record chunking (the streaming-equality invariant)."""

    def __init__(self):
        self.n = 0
        self.s1 = 0          # sum of quantized rates (Python int: no overflow)
        self.s2 = 0          # sum of squared quantized rates
        self.hist = np.zeros(RATE_CLIP + 1, dtype=np.int64)

    def add(self, rq: np.ndarray) -> None:
        if not len(rq):
            return
        self.n += int(len(rq))
        self.s1 += int(rq.sum())
        self.s2 += int((rq * rq).sum())
        np.add.at(self.hist, rq, 1)

    def mean(self) -> float:
        return (self.s1 / self.n) / (1 << RATE_Q) if self.n else 0.0

    def std(self) -> float:
        if not self.n:
            return 0.0
        m = self.s1 / self.n
        var = self.s2 / self.n - m * m
        return math.sqrt(max(var, 0.0)) / (1 << RATE_Q)

    def median(self) -> float:
        """Lower median on the Q20 grid (exact, chunk-invariant)."""
        if not self.n:
            return 0.0
        cum = np.cumsum(self.hist)
        q = int(np.searchsorted(cum, (self.n + 1) // 2))
        return q / (1 << RATE_Q)


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


def repeat_masked(las, repeats: dict, frac: float) -> np.ndarray:
    """keep mask [N]: False where the alignment's A-span is covered >= frac
    by the aread's repeat intervals (repeat-induced: no unique anchor).

    ``las`` may be a LasFile or a sequence of records (one chunk).

    Pinned rule [PINNED-HERE]: coverage = |aspan INTERSECT union(intervals)|
    / (aepos - abpos); drop iff coverage >= frac (default 0.95 — detector
    boundaries are depth-crossing points, so contained alignments can spill
    a few bases).  This is the pile-masking consumer of
    lasdetectsimplerepeats (gt1/daccord src/lasdetectsimplerepeats.cpp
    "intervals used to mask piles", SURVEY §2.1)."""
    n = las.novl if hasattr(las, "novl") else len(las)
    keep = np.ones(n, dtype=bool)
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


def _chunks(las: LasFile, chunk: int) -> Iterator[list]:
    buf: list = []
    for o in las:
        buf.append(o)
        if len(buf) >= chunk:
            yield buf
            buf = []
    if buf:
        yield buf


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
    p.add_argument("--chunk", type=int, default=16384,
                   help="records per streaming chunk (memory bound; the "
                        "output is byte-identical for any value)")
    args = p.parse_args(argv)

    las = LasFile.open(args.in_las)
    chunk = max(args.chunk, 1)

    # pass 1 (streamed): exact fit of the window-rate distribution
    fit = RateFit()
    for recs in _chunks(las, chunk):
        diffs, spans, valid = block_tables(recs, las.tspace)
        _, rq = window_rates(diffs, spans, valid, args.nw)
        fit.add(rq)

    if args.eprof is not None:
        mu0 = profile_mu(args.eprof)
        cal = (float(np.clip(fit.median() / max(mu0, 1e-9), 0.5, 2.0))
               if fit.n else 1.0)
        mu = cal * mu0
        desc = f"eprof mu={mu0:.4f} cal={cal:.3f}"
    else:
        cut = (fit.mean() + args.sigma * fit.std()) if fit.n else 1.0
        desc = f"window cut={cut:.4f}"
    repeats = (load_repeats(args.repeats)
               if args.repeats is not None else None)

    # pass 2 (streamed): per-record keep decisions, stream-written output
    # (header's novl patched at the end — the record count isn't known
    # until the stream drains)
    n_kept = 0
    n_rep_drop = 0
    small = las.tspace <= 125
    with open(args.out_las, "wb") as f:
        f.write(struct.pack("<qi", 0, las.tspace))
        for recs in _chunks(las, chunk):
            diffs, spans, valid = block_tables(recs, las.tspace)
            if args.eprof is not None:
                maxz = window_zscores(diffs, spans, valid, args.nw, mu)
                keep = maxz <= args.sigma
            else:
                maxr, _ = window_rates(diffs, spans, valid, args.nw)
                keep = maxr <= cut
            if args.e is not None:
                keep &= global_rates(diffs, spans, valid) <= args.e
            if repeats is not None:
                rmask = repeat_masked(recs, repeats, args.repeat_frac)
                n_rep_drop += int((~rmask).sum())
                keep &= rmask
            for o, k in zip(recs, keep):
                if k:
                    _write_record(f, o, small)
                    n_kept += 1
        f.seek(0)
        f.write(struct.pack("<qi", n_kept, las.tspace))
    if repeats is not None:
        desc += f", repeats dropped {n_rep_drop}"
    print(f"[lasfilteralignments] kept {n_kept}/{las.novl} "
          f"({desc}, nw={args.nw})", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
