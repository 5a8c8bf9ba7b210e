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


def global_rates(diffs: np.ndarray, spans: np.ndarray,
                 valid: np.ndarray) -> np.ndarray:
    d = np.where(valid, diffs, 0).sum(axis=1)
    s = np.where(valid, spans, 0).sum(axis=1)
    return np.minimum(d / np.maximum(s, 1), 1.0)


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
    args = p.parse_args(argv)

    las = LasFile.open(args.in_las)
    diffs, spans, valid = block_tables(las)              # pass 1
    maxr, flat = window_rates(diffs, spans, valid, args.nw)
    if len(flat):
        cut = float(flat.mean()) + args.sigma * float(flat.std())
    else:
        cut = 1.0

    keep = maxr <= cut                                   # pass 2
    if args.e is not None:
        keep &= global_rates(diffs, spans, valid) <= args.e
    kept = [o for i, o in enumerate(las) if keep[i]]
    write_las(args.out_las, las.tspace, kept)
    print(f"[lasfilteralignments] kept {len(kept)}/{las.novl} "
          f"(window cut={cut:.4f}, nw={args.nw})", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
