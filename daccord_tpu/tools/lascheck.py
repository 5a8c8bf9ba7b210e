"""``lascheck`` CLI — .las invariant verifier (the ecosystem's ``LAcheck``
analog, ``thegenemyers/DALIGNER`` · LAcheck; SURVEY §2.3, §4 item 1).

Checks, per .las input, against the dazzler DB:

- record framing parses exactly to the header's ``novl`` (the reader
  enforces sizes while parsing);
- records sorted by (aread, bread, abpos) — the order daccord's pile
  loader requires (LAcheck -S analog);
- per record: 0 <= abpos < aepos <= alen, 0 <= bbpos < bepos <= blen,
  reads in range;
- trace-block count == n_trace_blocks(abpos, aepos, tspace);
- trace B-advances sum to bepos - bbpos; per-block diff counts sum to
  the record's ``diffs``; per-block b-advance/diff sanity (d_j <= ...
  bounded by block spans).

Exit status 0 when every input passes, 1 otherwise (violations listed on
stderr, capped per file).
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional

from daccord_tpu.formats.dazzler_db import DazzlerDB
from daccord_tpu.formats.las import LasFile, n_trace_blocks

MAX_REPORT = 20


def check_las(las_path: str, db: DazzlerDB, verbose: bool = False) -> List[str]:
    """Return a list of violation strings (empty = pass)."""
    errs: List[str] = []

    def err(msg):
        if len(errs) < MAX_REPORT:
            errs.append(msg)
        elif len(errs) == MAX_REPORT:
            errs.append("... (more violations suppressed)")

    try:
        las = LasFile.open(las_path)
    except Exception as e:            # framing/header failures
        return [f"unreadable .las: {e}"]
    nreads = db.nreads
    prev = (-1, -1, -1)
    count = 0
    try:
        for o in las:
            count += 1
            where = f"record {count - 1} (a={o.aread}, b={o.bread})"
            if not (0 <= o.aread < nreads and 0 <= o.bread < nreads):
                err(f"{where}: read id out of DB range [0, {nreads})")
                continue
            key = (o.aread, o.bread, o.abpos)
            if key < prev:
                err(f"{where}: not sorted by (aread, bread, abpos)")
            prev = key
            alen = int(db.rlen[o.aread])
            blen = int(db.rlen[o.bread])
            if not (0 <= o.abpos < o.aepos <= alen):
                err(f"{where}: A span [{o.abpos}, {o.aepos}) vs alen {alen}")
                continue
            if not (0 <= o.bbpos < o.bepos <= blen):
                err(f"{where}: B span [{o.bbpos}, {o.bepos}) vs blen {blen}")
                continue
            nb = n_trace_blocks(o.abpos, o.aepos, las.tspace)
            if len(o.trace) != nb:
                err(f"{where}: {len(o.trace)} trace blocks, expected {nb}")
                continue
            badv = int(o.trace[:, 1].sum())
            if badv != o.bepos - o.bbpos:
                err(f"{where}: trace B-advances sum {badv} != "
                    f"bepos-bbpos {o.bepos - o.bbpos}")
            d_sum = int(o.trace[:, 0].sum())
            if d_sum != o.diffs:
                err(f"{where}: per-block diffs sum {d_sum} != "
                    f"record diffs {o.diffs}")
    except Exception as e:
        err(f"record {count}: parse failure: {e}")
    if count != las.novl:
        err(f"parsed {count} records, header novl = {las.novl}")
    if verbose and not errs:
        print(f"lascheck: {las_path}: {count} records ok "
              f"(tspace {las.tspace})", file=sys.stderr)
    return errs


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(prog="lascheck")
    p.add_argument("las", nargs="+", help="input .las file(s)")
    p.add_argument("db", help="dazzler DB")
    p.add_argument("-v", action="store_true", dest="verbose")
    args = p.parse_args(argv)
    db = DazzlerDB.open(args.db)
    bad = 0
    for path in args.las:
        errs = check_las(path, db, verbose=args.verbose)
        for e in errs:
            print(f"lascheck: {path}: {e}", file=sys.stderr)
        bad += bool(errs)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
