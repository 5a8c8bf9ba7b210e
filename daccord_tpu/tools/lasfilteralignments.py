"""``lasfilteralignments`` CLI — pile hygiene by error-rate outlier removal.

Reference: gt1/daccord ``src/lasfilteralignments.cpp`` (SURVEY §2.1, §3.3):
pass 1 computes per-alignment windowed error rates and fits the expected
error distribution; pass 2 drops alignments whose error is inconsistent
(repeat-induced spurious alignments).

Pinned rule [PINNED-HERE]: per alignment, rate = diffs / (aepos - abpos)
computed from the trace (exact per-block diffs are advisory but monotone with
true error).  Fit: robust mean/std over all alignments of the input; drop
alignments with rate > mean + thresh*std (``--sigma``, default 3.0) or
rate > ``-e`` when given.  Deterministic.
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional

import numpy as np

from daccord_tpu.formats.las import LasFile, write_las


def alignment_rates(las: LasFile) -> np.ndarray:
    rates = np.zeros(las.novl, dtype=np.float64)
    for i, o in enumerate(las):
        span = max(o.aepos - o.abpos, 1)
        rates[i] = min(float(o.trace[:, 0].sum()) / span, 1.0)
    return rates


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(prog="lasfilteralignments")
    p.add_argument("out_las")
    p.add_argument("in_las")
    p.add_argument("--sigma", type=float, default=3.0,
                   help="drop alignments above mean + sigma*std")
    p.add_argument("-e", type=float, default=None,
                   help="absolute max error rate")
    args = p.parse_args(argv)

    las = LasFile.open(args.in_las)
    rates = alignment_rates(las)                       # pass 1
    if len(rates):
        mean = float(rates.mean())
        std = float(rates.std())
        cut = mean + args.sigma * std
    else:
        cut = 1.0
    if args.e is not None:
        cut = min(cut, args.e)

    kept = [o for i, o in enumerate(las) if rates[i] <= cut]   # pass 2
    write_las(args.out_las, las.tspace, kept)
    print(f"[lasfilteralignments] kept {len(kept)}/{las.novl} "
          f"(cut={cut:.4f})", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
