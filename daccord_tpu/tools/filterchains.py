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
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional

from daccord_tpu.formats.las import FLAG_COMP, LasFile, write_las

CHAIN_START = 0x4
CHAIN_NEXT = 0x8
CHAIN_BEST = 0x10


def build_chains(las: LasFile):
    """[(key, [records], file_order, total_span, has_best)] in file order."""
    chains: List[list] = []
    for o in las:
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
    return chains


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(prog="filterchains")
    p.add_argument("out_las")
    p.add_argument("in_las")
    args = p.parse_args(argv)

    las = LasFile.open(args.in_las)
    chains = build_chains(las)
    best: dict = {}
    for key, recs, order, span, has_best in chains:
        rank = (0 if has_best else 1, -span, order)      # first-wins total
        if key not in best or rank < best[key][0]:
            best[key] = (rank, recs)
    kept = [o for (_, recs) in best.values() for o in recs]
    kept.sort(key=lambda o: (o.aread, o.bread, o.flags & FLAG_COMP, o.abpos))
    write_las(args.out_las, las.tspace, kept)
    print(f"[filterchains] kept {len(kept)}/{las.novl} "
          f"({len(best)} chains)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
