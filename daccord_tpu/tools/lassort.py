"""``lassort`` CLI — sort a .las by pile order (the ecosystem's ``LAsort``
analog, ``thegenemyers/DALIGNER`` · LAsort; SURVEY §2.3).

daccord's pile loader (formats/las.py ``LasFile.pile``) requires records
grouped by aread and sorted; raw daligner block outputs and concatenations
are not.  Sort key [PINNED-HERE, matching lascheck's order check]:

    (aread, bread, COMP flag, abpos, bbpos)

with ties left in input order (stable sort), preserving daligner chain
adjacency for equal keys.  NOTE: sorting breaks CHAIN_NEXT adjacency of
chains whose members straddle other (bread, comp) groups only if the input
interleaved them — daligner emits chain members consecutively with equal
(aread, bread), where this key keeps them adjacent in abpos order.

Records are materialized in memory (a .las record is ~40B + trace; piles at
daccord scale fit comfortably — the streaming k-way path is ``lasmerge``).
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional

from daccord_tpu.formats.las import FLAG_COMP, LasFile, write_las


def sort_records(las: LasFile) -> list:
    recs = list(las)
    recs.sort(key=lambda o: (o.aread, o.bread, o.flags & FLAG_COMP,
                             o.abpos, o.bbpos))
    return recs


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(
        prog="lassort", description="sort a .las by (aread, bread, comp, "
        "abpos, bbpos) — LAsort analog")
    p.add_argument("out_las")
    p.add_argument("in_las")
    p.add_argument("-V", action="count", default=0, help="verbose")
    args = p.parse_args(argv)

    las = LasFile.open(args.in_las)
    recs = sort_records(las)
    write_las(args.out_las, las.tspace, recs)
    if args.V:
        print(f"[lassort] {len(recs)} records -> {args.out_las}",
              file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
