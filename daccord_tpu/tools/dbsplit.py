"""``dbsplit`` CLI — DBsplit analog: partition a dazzler DB into blocks.

Reference: DAZZ_DB ``DBsplit`` (SURVEY §2.3 upstream producers; the L1 row's
"trimmed-DB and block logic").  Appends a ``blocks`` section to the .db text
stub (SURVEY A.1 grammar) and patches the .idx header's cutoff/all/treads
fields.  Once split, ``DazzlerDB.open`` exposes the TRIMMED database (reads
shorter than the cutoff dropped, ids renumbered — the id space daligner
.las files reference), and block references ``name.N`` select block N.

Pinned-here deviations from DBsplit (documented, no reference binary to
check against): ``-a`` (keep all well reads) defaults ON because this repo's
synthetic DBs carry no well/DB_BEST metadata; block size ``-s`` is taken in
bases when < 2^20 would be ambiguous — the flag takes MEGAbases like the
reference, with ``--bases`` for exact counts in tests.
"""

from __future__ import annotations

import argparse
import struct
import sys
from typing import List, Optional

import numpy as np

from daccord_tpu.formats.dazzler_db import (
    DB_BEST, HITS_DB_SIZE, HITS_READ_DTYPE, HITS_READ_SIZE, DbStub,
    _hidden_paths, parse_stub, write_stub,
)


def compute_blocks(rlen: np.ndarray, flags: np.ndarray, bsize: int,
                   cutoff: int, allflag: int) -> List[tuple]:
    """(ufirst, tfirst) boundary pairs, M+1 entries (SURVEY A.1).

    Pinned rule: a block takes consecutive TRIMMED reads while its total
    base count stays <= bsize; every block holds at least one read."""
    keep = rlen >= cutoff
    if not allflag:
        keep &= (flags & DB_BEST) != 0
    bounds = [(0, 0)]
    acc = 0
    t = 0
    for u in range(len(rlen)):
        if not keep[u]:
            continue
        if acc and acc + int(rlen[u]) > bsize:
            bounds.append((u, t))
            acc = 0
        acc += int(rlen[u])
        t += 1
    bounds.append((len(rlen), t))
    return bounds


def dbsplit(db_path: str, bsize: int, cutoff: int, allflag: int) -> DbStub:
    stub_path = db_path if db_path.endswith(".db") else db_path + ".db"
    stub = parse_stub(stub_path)
    idx_path, _ = _hidden_paths(stub_path)
    with open(idx_path, "rb") as f:
        hdr = bytearray(f.read(HITS_DB_SIZE))
        ureads = struct.unpack_from("<i", hdr, 0)[0]
        recs = np.frombuffer(f.read(ureads * HITS_READ_SIZE),
                             dtype=HITS_READ_DTYPE, count=ureads)
    blocks = compute_blocks(recs["rlen"].astype(np.int64),
                            recs["flags"].astype(np.int64),
                            bsize, cutoff, allflag)
    treads = blocks[-1][1]
    stub.bsize, stub.cutoff, stub.allflag = bsize, cutoff, allflag
    stub.blocks = blocks
    write_stub(stub_path, stub)
    # patch idx header: treads, cutoff, allflag (DAZZ_DB updates these)
    struct.pack_into("<i", hdr, 4, treads)
    struct.pack_into("<i", hdr, 8, cutoff)
    struct.pack_into("<i", hdr, 12, allflag)
    with open(idx_path, "r+b") as f:
        f.write(bytes(hdr))
    return stub


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(prog="dbsplit", description=__doc__)
    p.add_argument("db", help="dazzler DB (.db stub)")
    p.add_argument("-s", type=float, default=200.0,
                   help="block size in megabases (default 200)")
    p.add_argument("--bases", type=int, default=0,
                   help="block size in exact bases (overrides -s)")
    p.add_argument("-x", type=int, default=0,
                   help="trim reads shorter than this cutoff")
    p.add_argument("--best", action="store_true",
                   help="keep only DB_BEST-flagged reads (reference default;"
                        " here opt-in — synthetic DBs carry no well flags)")
    args = p.parse_args(argv)
    bsize = args.bases if args.bases else int(args.s * 1_000_000)
    stub = dbsplit(args.db, bsize, args.x, 0 if args.best else 1)
    treads = stub.blocks[-1][1]
    print(f"dbsplit: {stub.nblocks} blocks, {treads} trimmed reads "
          f"(cutoff {stub.cutoff}, all {stub.allflag})", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
