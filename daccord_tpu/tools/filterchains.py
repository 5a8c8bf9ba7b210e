"""``filterchains`` CLI — keep the best alignment chain per (aread, bread).

Reference: gt1/daccord ``src/filterchains.cpp`` (SURVEY §2.1): drops
redundant/secondary chains so each read pair contributes one alignment chain.

Pinned rule [PINNED-HERE]: group records by (aread, bread, comp); within a
group keep the single record with the largest A span (aepos - abpos), ties ->
the earliest record in file order.  (The daligner chain-flag refinement is
tolerated on input: unknown flag bits are preserved on the kept records.)
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional

from daccord_tpu.formats.las import FLAG_COMP, LasFile, write_las


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(prog="filterchains")
    p.add_argument("out_las")
    p.add_argument("in_las")
    args = p.parse_args(argv)

    las = LasFile.open(args.in_las)
    best = {}
    order = []
    for i, o in enumerate(las):
        key = (o.aread, o.bread, o.flags & FLAG_COMP)
        span = o.aepos - o.abpos
        if key not in best:
            best[key] = (span, i, o)
            order.append(key)
        elif span > best[key][0]:
            best[key] = (span, i, o)
    kept = [best[k][2] for k in order]
    kept.sort(key=lambda o: (o.aread, o.bread, o.flags & FLAG_COMP, o.abpos))
    write_las(args.out_las, las.tspace, kept)
    print(f"[filterchains] kept {len(kept)}/{las.novl}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
