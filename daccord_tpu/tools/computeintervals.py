"""``computeintervals`` CLI — scale-out planner (SURVEY §3.2).

Usage: ``computeintervals <n> <in.las> <in.db>`` — prints one ``-I<f>,<t>``
line per part, balanced by estimated work (record count x read length).
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional

from daccord_tpu.formats.dazzler_db import DazzlerDB
from daccord_tpu.formats.las import LasFile
from daccord_tpu.parallel.planner import plan_intervals, work_per_read


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(prog="computeintervals")
    p.add_argument("n", type=int, help="number of parts")
    p.add_argument("las")
    p.add_argument("db")
    args = p.parse_args(argv)
    db = DazzlerDB.open(args.db)
    las = LasFile.open(args.las)
    work = work_per_read(db, las)
    for (f, t) in plan_intervals(work, args.n):
        print(f"-I{f},{t}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
