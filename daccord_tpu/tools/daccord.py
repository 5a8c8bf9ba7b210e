"""``daccord`` CLI — TPU-native consensus main tool.

Usage parity with the reference (`daccord in.las in.db`, SURVEY §3.1), plus
``--oracle`` to run the NumPy reference path and ``--out`` for a file target.
"""

from __future__ import annotations

import argparse
import sys
import time
from typing import List, Optional

from daccord_tpu.formats.fasta import write_fasta
from daccord_tpu.tools.common import add_daccord_flags, config_from_args


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(
        prog="daccord",
        description="TPU-native long-read consensus (gt1/daccord capabilities)")
    p.add_argument("las", nargs="+",
                   help="input .las alignment pile file(s); several files "
                        "form one merged pile source (multi-.las piles)")
    p.add_argument("db", help="input dazzler .db")
    p.add_argument("--oracle", action="store_true",
                   help="run the NumPy oracle path instead of the device path")
    p.add_argument("--out", default="-", help="output FASTA (default stdout)")
    add_daccord_flags(p)
    args = p.parse_args(argv)
    cfg = config_from_args(args)

    t0 = time.time()
    if args.oracle:
        from daccord_tpu.oracle.consensus import run_oracle
        records, stats = run_oracle(args.db, args.las, cfg)
    else:
        from daccord_tpu.pipeline.runner import run_tpu
        records, stats = run_tpu(args.db, args.las, cfg)
    dt = time.time() - t0

    if args.out == "-":
        write_fasta(sys.stdout, records)
    else:
        write_fasta(args.out, records)
    if cfg.V:
        print(f"[daccord] {stats.reads} reads, {stats.windows} windows "
              f"({stats.windows_ok} ok, {stats.k2_retries} k2-retries) "
              f"-> {stats.fragments} fragments in {dt:.1f}s "
              f"({stats.reads/max(dt,1e-9):.2f} reads/s)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
