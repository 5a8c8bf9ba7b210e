"""``lasdetectsimplerepeats`` CLI — repeat intervals from pile-depth anomalies.

Reference: gt1/daccord ``src/lasdetectsimplerepeats.cpp`` (SURVEY §2.1):
detects simple-repeat intervals on reads from pile-depth anomalies; the
intervals are used to mask piles.

Pinned rule [PINNED-HERE]: per aread, build the coverage profile from its
pile's [abpos, aepos) intervals; positions with depth > ``--factor`` (default
3.0) x the global median pile depth are repeat-flagged; maximal runs longer
than ``--minlen`` (default 100) are emitted as tab-separated
``aread  start  end  depth_max`` lines (sorted by aread, start).
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional

import numpy as np

from daccord_tpu.formats.dazzler_db import DazzlerDB
from daccord_tpu.formats.las import LasFile


def detect(db: DazzlerDB, las: LasFile, factor: float, minlen: int):
    depth_samples = []
    piles = {}
    for aread in las.areads():
        pile = las.pile(int(aread))
        piles[int(aread)] = pile
        depth_samples.append(len(pile))
    med = float(np.median(depth_samples)) if depth_samples else 0.0
    cut = factor * max(med, 1.0)
    out = []
    for aread, pile in piles.items():
        rlen = int(db.rlen[aread])
        cov = np.zeros(rlen + 1, dtype=np.int64)
        for o in pile:
            cov[o.abpos] += 1
            cov[o.aepos] -= 1
        prof = np.cumsum(cov[:-1])
        mask = prof > cut
        if not mask.any():
            continue
        edges = np.flatnonzero(np.diff(np.concatenate([[0], mask.view(np.int8),
                                                       [0]])))
        for s, e in zip(edges[::2], edges[1::2]):
            if e - s >= minlen:
                out.append((aread, int(s), int(e), int(prof[s:e].max())))
    out.sort()
    return out, med


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(prog="lasdetectsimplerepeats")
    p.add_argument("las")
    p.add_argument("db")
    p.add_argument("--factor", type=float, default=3.0)
    p.add_argument("--minlen", type=int, default=100)
    args = p.parse_args(argv)
    db = DazzlerDB.open(args.db)
    las = LasFile.open(args.las)
    rows, med = detect(db, las, args.factor, args.minlen)
    for (a, s, e, dm) in rows:
        print(f"{a}\t{s}\t{e}\t{dm}")
    print(f"[lasdetectsimplerepeats] {len(rows)} intervals "
          f"(median depth {med:.1f})", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
