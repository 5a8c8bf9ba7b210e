"""Multi-host scale-out: per-part execution, manifests, resume, merge.

The TPU-native equivalent of the reference's cluster scale-out model
(SURVEY §2.4 DP row, §5 checkpoint/resume): read-id ranges are planned by
work (parallel/planner.py = the computeintervals analog), each host/process
corrects its range and writes an atomic per-part FASTA plus a manifest entry;
completed parts are skipped on re-run (idempotent restart — the reference's
``-J i,n`` re-run model, SURVEY §5 'failure detection'); the merge is a
deterministic concatenation in read order, matching the operator-side
concatenation of the reference (and keeping DCN traffic ~0 per SURVEY §5).

Within a host, chips are fed through the window-batch data parallelism of
pipeline/runner.py; across hosts this module is the coordination layer.
``jax.distributed.initialize`` can place one process per host on a pod slice
(process_id/num_processes map to part_id/nparts here).
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
import tempfile
from typing import List, Optional, Tuple

from daccord_tpu.formats.dazzler_db import DazzlerDB
from daccord_tpu.formats.las import LasFile, open_piles
from daccord_tpu.formats.fasta import read_fasta, write_fasta
from daccord_tpu.parallel.planner import plan_intervals, work_per_read
from daccord_tpu.utils.config import DaccordConfig


def part_path(outdir: str, part: int) -> str:
    return os.path.join(outdir, f"part_{part:05d}.fasta")


def manifest_path(outdir: str, part: int) -> str:
    return os.path.join(outdir, f"part_{part:05d}.manifest.json")


def plan(db_path: str, las_path, nparts: int,
         I: Optional[Tuple[int, int]] = None) -> List[Tuple[int, int]]:
    """Work-balanced read intervals; restricted to the -I interval if any
    (parts partition the requested range, composing -I with -J/parts)."""
    db = DazzlerDB.open(db_path)
    las = open_piles(las_path)
    work = work_per_read(db, las)
    lo0, hi0 = ((0, db.nreads) if I is None
                else (max(0, I[0]), min(I[1], db.nreads)))
    iv = plan_intervals(work[lo0:hi0], nparts)
    return [(a + lo0, b + lo0) for (a, b) in iv]


def _fasta_sha(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def part_done(outdir: str, part: int, interval: Tuple[int, int]) -> bool:
    """True iff this part completed previously with the same interval and its
    output file is intact (resume check; SURVEY §5 checkpoint/resume)."""
    mp = manifest_path(outdir, part)
    pp = part_path(outdir, part)
    if not (os.path.exists(mp) and os.path.exists(pp)):
        return False
    try:
        m = json.load(open(mp))
        return (tuple(m["interval"]) == tuple(interval)
                and m["sha256"] == _fasta_sha(pp))
    except Exception:
        return False


def run_part(db_path: str, las_path: str, cfg: DaccordConfig, part: int,
             nparts: int, outdir: str, use_oracle: bool = False,
             intervals: Optional[List[Tuple[int, int]]] = None,
             use_mesh: bool = False) -> dict:
    """Correct one planned read range; atomic part file + manifest entry."""
    os.makedirs(outdir, exist_ok=True)
    if intervals is None:
        intervals = plan(db_path, las_path, nparts, I=cfg.I)
    lo, hi = intervals[part]
    if part_done(outdir, part, (lo, hi)):
        return json.load(open(manifest_path(outdir, part)))

    sub = cfg.replace(I=(lo, hi), J=(0, 1))
    pp = part_path(outdir, part)
    fd, tmp = tempfile.mkstemp(dir=outdir, suffix=".tmp")
    os.close(fd)
    if use_oracle:
        from daccord_tpu.oracle.consensus import run_oracle
        records, stats = run_oracle(db_path, las_path, sub)
        write_fasta(tmp, records)
        nrec = len(records)
    else:
        from daccord_tpu.pipeline.runner import run_tpu
        # mesh off by default: concurrent part processes sharing host cores
        # starve CPU-collective rendezvous; per-host meshes are opt-in.
        # Output STREAMS to the part file as the ordered cursor advances
        # (run_tpu sink): a part's FASTA never accumulates in RAM, so part
        # memory is bounded by the live-read working set at any part size.
        nrec = 0
        with open(tmp, "w") as f:
            def _sink(name, seq, _f=f):
                nonlocal nrec
                write_fasta_record(_f, name, seq)
                nrec += 1
            _, stats = run_tpu(db_path, las_path, sub, use_mesh=use_mesh,
                               sink=_sink)
    os.replace(tmp, pp)  # atomic publish
    entry = {
        "part": part, "interval": [lo, hi], "records": nrec,
        "reads": stats.reads, "windows": stats.windows,
        "sha256": _fasta_sha(pp),
    }
    fd, tmp = tempfile.mkstemp(dir=outdir, suffix=".tmp")
    os.close(fd)
    with open(tmp, "w") as f:
        json.dump(entry, f)
    os.replace(tmp, manifest_path(outdir, part))
    return entry


def missing_parts(db_path: str, las_path: str, nparts: int,
                  outdir: str,
                  I: Optional[Tuple[int, int]] = None) -> List[int]:
    intervals = plan(db_path, las_path, nparts, I=I)
    return [p for p in range(nparts)
            if not part_done(outdir, p, intervals[p])]


def dispatch_part(db_path: str, las_path, nparts: int, part: int,
                  outdir: str, extra_args: Optional[List[str]] = None,
                  use_oracle: bool = False):
    """Launch one part as an isolated worker subprocess (crash isolation:
    a killed/failed worker cannot take the supervisor down, and its part is
    simply detected missing).  Returns the Popen handle."""
    import subprocess
    import sys as _sys
    las_list = las_path if isinstance(las_path, (list, tuple)) else [las_path]
    cmd = [_sys.executable, "-m", "daccord_tpu.tools.daccord_dist",
           *las_list, db_path, "--outdir", outdir,
           "--part", str(part), "--nparts", str(nparts)]
    if use_oracle:
        cmd.append("--oracle")
    cmd += list(extra_args or [])
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    env["PYTHONPATH"] = repo + (os.pathsep + env["PYTHONPATH"]
                                if env.get("PYTHONPATH") else "")
    return subprocess.Popen(cmd, env=env)


def run_all_parts(db_path: str, las_path, nparts: int, outdir: str,
                  retry: int = 1, jobs: int = 1,
                  extra_args: Optional[List[str]] = None,
                  use_oracle: bool = False,
                  I: Optional[Tuple[int, int]] = None,
                  log=None) -> List[int]:
    """Single-host scheduler: dispatch every unfinished part as a worker
    subprocess (up to ``jobs`` concurrently) and RE-DISPATCH parts that
    come back missing — a worker killed mid-part leaves no manifest, so
    the next round picks it up (SURVEY §5 failure detection / elastic
    recovery: 'missed-heartbeat -> re-dispatch read-range shard'; here the
    heartbeat is worker exit, the shard the planned part).

    retry: extra recovery rounds after the first full dispatch.
    Returns the list of parts STILL missing after all rounds (empty on
    success).  Completed parts are never re-run (idempotent resume).
    """
    for round_no in range(retry + 1):
        missing = missing_parts(db_path, las_path, nparts, outdir, I=I)
        if not missing:
            return []
        if log:
            log(f"[daccord-dist] round {round_no}: dispatching parts "
                f"{missing}")
        pending = list(missing)
        running: List = []
        while pending or running:
            while pending and len(running) < max(jobs, 1):
                part = pending.pop(0)
                running.append(dispatch_part(
                    db_path, las_path, nparts, part, outdir,
                    extra_args=extra_args, use_oracle=use_oracle))
            proc = running.pop(0)
            rc = proc.wait()
            if rc != 0 and log:
                log(f"[daccord-dist] worker exited rc={rc} (will re-check)")
    return missing_parts(db_path, las_path, nparts, outdir, I=I)


def merge_parts(outdir: str, nparts: int, dest: str) -> int:
    """Concatenate parts in order -> one FASTA; returns record count."""
    n = 0
    with open(dest + ".tmp", "w") as out:
        for p in range(nparts):
            for name, seq in read_fasta(part_path(outdir, p)):
                write_fasta_record(out, name, seq)
                n += 1
    os.replace(dest + ".tmp", dest)
    return n


def write_fasta_record(f, name: str, seq: str) -> None:
    from daccord_tpu.formats.fasta import LINE_WIDTH
    f.write(f">{name}\n")
    for i in range(0, len(seq), LINE_WIDTH):
        f.write(seq[i:i + LINE_WIDTH] + "\n")
