"""``fillfasta`` CLI — FASTA normalization for DB ingestion.

Reference: gt1/daccord ``src/fillfasta.cpp`` (SURVEY §2.1): replaces non-ACGT
symbols so 2-bit packing is possible.  Pinned replacement rule: symbol at
sequence position p becomes ``"ACGT"[p % 4]`` (deterministic, seed-free).
Also uppercases.
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional

from daccord_tpu.formats.fasta import read_fasta, write_fasta

_ACGT = set("ACGT")


def fill_seq(seq: str) -> str:
    s = seq.upper()
    if set(s) <= _ACGT:
        return s
    out = list(s)
    for i, c in enumerate(out):
        if c not in _ACGT:
            out[i] = "ACGT"[i % 4]
    return "".join(out)


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(prog="fillfasta")
    p.add_argument("input", help="input FASTA ('-' = stdin)")
    p.add_argument("output", nargs="?", default="-", help="output FASTA")
    args = p.parse_args(argv)
    src = sys.stdin if args.input == "-" else args.input
    recs = ((name, fill_seq(seq)) for name, seq in read_fasta(src))
    if args.output == "-":
        write_fasta(sys.stdout, recs)
    else:
        write_fasta(args.output, recs)
    return 0


if __name__ == "__main__":
    sys.exit(main())
