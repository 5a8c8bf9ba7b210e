"""``filterchains`` CLI — keep the best alignment chain per (aread, bread).

Reference: gt1/daccord ``src/filterchains.cpp`` (SURVEY §2.1): drops
redundant/secondary chains so each read pair contributes one alignment chain.

Chain semantics (daligner chain flags, SURVEY Appendix A.2; exact bit values
marked [UNCERTAIN] there and pinned here): START=0x4 opens a chain,
NEXT=0x8 continues the preceding record's chain, BEST=0x10 marks the
daligner-designated best chain of the pair.  Records sharing (aread, bread,
comp) form chains by file order (a NEXT record joins the chain in progress;
anything else opens a new chain — orphan NEXTs included, tolerantly).

Pinned keep rule [PINNED-HERE]:
  per (aread, bread, comp) group, keep ALL members of one chain —
  the first BEST-flagged chain if any, else the chain with the largest
  total A span (ties -> earliest chain in file order).
  Files with no chain flags degrade to the v1 rule: single record with the
  largest A span (a chain of one).

Memory: aread-sorted inputs stream one pile at a time (O(largest pile), the
production path — VERDICT r2 item 8); unsorted inputs fall back to the
in-memory path with identical output for any input that is aread-sorted.
"""

from __future__ import annotations

import argparse
import struct
import sys
from typing import List, Optional

from daccord_tpu.formats.las import (
    FLAG_COMP, LasFile, _write_record, write_las,
)

CHAIN_START = 0x4
CHAIN_NEXT = 0x8
CHAIN_BEST = 0x10


def _extend_chains(chains: List[list], o) -> None:
    """Append record o to the chain list (the pinned chain-building rule)."""
    key = (o.aread, o.bread, o.flags & FLAG_COMP)
    joins = bool(o.flags & CHAIN_NEXT) and chains and chains[-1][0] == key
    if joins:
        c = chains[-1]
        c[1].append(o)
        c[3] += o.aepos - o.abpos
        c[4] = c[4] or bool(o.flags & CHAIN_BEST)
    else:
        chains.append([key, [o], len(chains), o.aepos - o.abpos,
                       bool(o.flags & CHAIN_BEST)])


def build_chains(las: LasFile):
    """[(key, [records], file_order, total_span, has_best)] in file order."""
    chains: List[list] = []
    for o in las:
        _extend_chains(chains, o)
    return chains


def resolve_chains(chains):
    """(kept records sorted by the pinned key, #distinct pair keys).

    Rank comparisons only ever happen within one (aread, bread, comp) key,
    so resolving per aread group gives the same result as resolving
    globally (chain order indices are group-local but compared only within
    a key, which never spans groups in an aread-sorted file)."""
    best: dict = {}
    for key, recs, order, span, has_best in chains:
        rank = (0 if has_best else 1, -span, order)      # first-wins total
        if key not in best or rank < best[key][0]:
            best[key] = (rank, recs)
    kept = [o for (_, recs) in best.values() for o in recs]
    kept.sort(key=lambda o: (o.aread, o.bread, o.flags & FLAG_COMP, o.abpos))
    return kept, len(best)


class _Unsorted(Exception):
    pass


def _stream_filter(las: LasFile, out_las: str):
    """Streaming per-aread filtering for aread-sorted inputs; patches the
    header's novl after the fact.  Raises _Unsorted on out-of-order areads
    (before writing anything wrong: the exception aborts the attempt)."""
    n_out = 0
    n_keys = 0
    with open(out_las, "wb") as f:
        f.write(struct.pack("<qi", 0, las.tspace))
        chains: List[list] = []
        cur = None

        def flush():
            nonlocal n_out, n_keys
            if not chains:
                return
            kept, nk = resolve_chains(chains)
            for o in kept:
                _write_record(f, o, las.small)
            n_out += len(kept)
            n_keys += nk
            chains.clear()

        for o in las:
            if cur is not None and o.aread < cur:
                raise _Unsorted()
            if o.aread != cur:
                flush()
                cur = o.aread
            _extend_chains(chains, o)
        flush()
        f.seek(0)
        f.write(struct.pack("<qi", n_out, las.tspace))
    return n_out, n_keys


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(prog="filterchains")
    p.add_argument("out_las")
    p.add_argument("in_las")
    args = p.parse_args(argv)

    las = LasFile.open(args.in_las)
    try:
        n_out, n_keys = _stream_filter(las, args.out_las)
    except _Unsorted:
        # unsorted input: in-memory fallback (identical rule, global order)
        kept, n_keys = resolve_chains(build_chains(las))
        write_las(args.out_las, las.tspace, kept)
        n_out = len(kept)
    print(f"[filterchains] kept {n_out}/{las.novl} "
          f"({n_keys} chains)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
