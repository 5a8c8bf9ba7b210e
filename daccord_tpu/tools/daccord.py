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
    p.add_argument("--save-eprof", metavar="FILE", default=None,
                   help="estimate the error profile, save it to FILE (JSON) "
                        "and exit (reusable via -E)")
    p.add_argument("--profile", metavar="DIR", default=None,
                   help="capture a jax.profiler trace into DIR")
    add_daccord_flags(p)
    args = p.parse_args(argv)
    cfg = config_from_args(args)

    if args.save_eprof:
        from daccord_tpu.formats.dazzler_db import DazzlerDB
        from daccord_tpu.formats.las import open_piles
        from daccord_tpu.oracle.eprof import estimate_error_profile_v2
        prof = estimate_error_profile_v2(
            DazzlerDB.open(args.db), open_piles(args.las), cfg)
        prof.save(args.save_eprof)
        print(f"[daccord] positional error profile -> {args.save_eprof}: "
              f"{prof.scalar()}", file=sys.stderr)
        return 0

    from daccord_tpu.utils.obslog import maybe_profile
    t0 = time.time()
    with maybe_profile(args.profile):
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
