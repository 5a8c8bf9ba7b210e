"""``daccord-dist`` — multi-host / multi-process correction launcher.

The TPU-native replacement for the reference's cluster-scheduler scale-out
(SURVEY §2.4 'communication backend', §5 'distributed'): each process
corrects one work-planned read range (the computeintervals analog) and
writes an atomic part + manifest; completed parts are skipped on restart
(idempotent re-run = the reference's -J re-run model).

Process placement:
  - explicit:  --part I --nparts N        (cluster job arrays, one per host)
  - jax.distributed: --jax-dist           (process_id/num_processes from the
    pod runtime via jax.distributed.initialize; one process per host)

After all parts exist, any process (or the operator) runs --merge.
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional

from daccord_tpu.tools.common import add_daccord_flags, config_from_args


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(prog="daccord-dist")
    p.add_argument("las", nargs="+")
    p.add_argument("db")
    p.add_argument("--outdir", required=True)
    p.add_argument("--nparts", type=int, default=None)
    p.add_argument("--part", type=int, default=None)
    p.add_argument("--jax-dist", action="store_true",
                   help="derive part/nparts from jax.distributed")
    p.add_argument("--coordinator", default=None,
                   help="jax.distributed coordinator address host:port "
                        "(default: from the pod/cluster environment)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--use-mesh", action="store_true",
                   help="shard window batches over this process's devices")
    p.add_argument("--merge", metavar="DEST", default=None,
                   help="merge completed parts into DEST and exit")
    p.add_argument("--run-all", action="store_true",
                   help="single-host scheduler mode: dispatch every "
                        "unfinished part as an isolated worker subprocess "
                        "and auto-re-dispatch parts whose worker died "
                        "mid-run (elastic recovery, SURVEY §5)")
    p.add_argument("--retry-missing", type=int, default=1,
                   help="extra recovery rounds in --run-all mode")
    p.add_argument("--jobs", type=int, default=1,
                   help="concurrent part workers in --run-all mode")
    p.add_argument("--oracle", action="store_true")
    add_daccord_flags(p)
    args = p.parse_args(argv)
    cfg = config_from_args(args)

    from daccord_tpu.parallel.distributed import (
        merge_parts, missing_parts, run_all_parts, run_part,
    )

    if args.jax_dist:
        import jax
        if args.coordinator is not None:
            jax.distributed.initialize(
                coordinator_address=args.coordinator,
                num_processes=args.num_processes,
                process_id=args.process_id)
        else:
            jax.distributed.initialize()   # pod/cluster auto-detection
        part = jax.process_index()
        nparts = jax.process_count()
    else:
        part, nparts = args.part, args.nparts

    las = args.las if len(args.las) > 1 else args.las[0]
    if args.run_all:
        if args.nparts is None:
            p.error("--run-all needs --nparts")
        def _log(m):
            print(m, file=sys.stderr, flush=True)
        # forward the daccord flag surface so worker planning/config match
        d0 = config_from_args(p.parse_args([*args.las, args.db,
                                            "--outdir", args.outdir]))
        fwd: List[str] = []
        for flag, val, dflt in [("-w", args.w, d0.w), ("-a", args.a, d0.a),
                                ("-k", args.k, d0.k), ("-t", args.t, d0.t),
                                ("-d", args.d, d0.d), ("-m", args.m, d0.m),
                                ("-e", args.e, d0.e), ("-l", args.l, d0.l),
                                ("-E", args.E, d0.E)]:
            if val != dflt and val is not None:
                fwd += [flag, str(val)]
        if args.I is not None:
            fwd += ["-I", f"{args.I[0]},{args.I[1]}"]
        if args.f:
            fwd.append("-f")
        if args.use_mesh:
            fwd.append("--use-mesh")
        still = run_all_parts(args.db, las, args.nparts, args.outdir,
                              retry=args.retry_missing, jobs=args.jobs,
                              use_oracle=args.oracle, I=cfg.I, log=_log,
                              extra_args=fwd)
        if still:
            print(f"[daccord-dist] FAILED: parts {still} still missing "
                  f"after {args.retry_missing} recovery rounds",
                  file=sys.stderr)
            return 1
        if args.merge is not None:
            n = merge_parts(args.outdir, args.nparts, args.merge)
            print(f"[daccord-dist] merged {args.nparts} parts -> "
                  f"{args.merge} ({n} records)", file=sys.stderr)
        return 0
    if args.merge is not None:
        missing = missing_parts(args.db, las, nparts, args.outdir, I=cfg.I)
        if missing:
            print(f"[daccord-dist] cannot merge: missing parts {missing}",
                  file=sys.stderr)
            return 1
        n = merge_parts(args.outdir, nparts, args.merge)
        print(f"[daccord-dist] merged {nparts} parts -> {args.merge} "
              f"({n} records)", file=sys.stderr)
        return 0

    if part is None or nparts is None:
        p.error("need --part/--nparts or --jax-dist")
    entry = run_part(args.db, las, cfg, part, nparts, args.outdir,
                     use_oracle=args.oracle, use_mesh=args.use_mesh)
    print(f"[daccord-dist] part {part}/{nparts}: {entry['records']} records "
          f"(reads {entry['interval']})", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
