"""``lasmerge`` CLI — k-way merge of sorted .las files (the ecosystem's
``LAmerge`` analog, ``thegenemyers/DALIGNER`` · LAmerge; SURVEY §2.3).

Block-wise daligner runs produce one sorted .las per block pair; daccord's
pile loader needs ONE aread-grouped file (formats/las.py refuses split
aread groups).  This merges any number of individually-sorted inputs into
one sorted output, streaming (heap merge — memory is O(#inputs), not
O(#records)).

Merge key = lassort's pinned sort key (aread, bread, COMP, abpos, bbpos);
equal keys keep input-file order (heap ties broken by input index, then by
within-file order — a stable merge).  Inputs must share tspace and must
each be sorted (verified on the fly; unsorted input -> error naming the
file and suggesting lassort).
"""

from __future__ import annotations

import argparse
import heapq
import sys
from typing import List, Optional

from daccord_tpu.formats.las import FLAG_COMP, LasFile, write_las_stream


def _key(o):
    return (o.aread, o.bread, o.flags & FLAG_COMP, o.abpos, o.bbpos)


def merge_records(lass: List[LasFile], paths: List[str]):
    """Yield records of the sorted merge; validates each input's order."""
    heap = []
    iters = [iter(las) for las in lass]
    last = [None] * len(lass)

    def push(i):
        o = next(iters[i], None)
        if o is None:
            return
        k = _key(o)
        if last[i] is not None and k < last[i]:
            raise ValueError(
                f"{paths[i]}: records not sorted by (aread, bread, comp, "
                "abpos, bbpos); run lassort on it first")
        last[i] = k
        # seq breaks key ties deterministically: input index, file order
        heapq.heappush(heap, (k, i, next(_counter), o))

    _counter = iter(range(1 << 62))
    for i in range(len(lass)):
        push(i)
    while heap:
        _, i, _, o = heapq.heappop(heap)
        yield o
        push(i)


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(
        prog="lasmerge", description="merge sorted .las files into one "
        "(LAmerge analog)")
    p.add_argument("out_las")
    p.add_argument("in_las", nargs="+")
    p.add_argument("-V", action="count", default=0, help="verbose")
    args = p.parse_args(argv)

    lass = [LasFile.open(q) for q in args.in_las]
    ts = {las.tspace for las in lass}
    if len(ts) != 1:
        print(f"[lasmerge] mixed tspace across inputs: {sorted(ts)}",
              file=sys.stderr)
        return 1
    novl = sum(las.novl for las in lass)
    write_las_stream(args.out_las, lass[0].tspace, novl,
                     merge_records(lass, args.in_las))
    if args.V:
        print(f"[lasmerge] {len(lass)} inputs, {novl} records -> "
              f"{args.out_las}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
