"""End-to-end device pipeline: the TPU-native ``daccord`` main loop.

Mirrors SURVEY §3.1's call stack with the TPU-first structure of SURVEY §7.1:

  host: pile load -> decode -> batched trace realignment -> window stacks
  device: dense batched consensus (ops/consensus_step.py) at k=8
  host: adaptive k2 retry on failed windows (masked second pass; sparse
        oracle DP — the k=12 universe is handled sparsely, SURVEY §7.3 item 6)
  host: stitch -> ordered FASTA emission

Output is byte-identical to the NumPy oracle (tests/test_e2e.py): the device
step equals oracle window_consensus bit-exactly and the k2 retry path IS the
oracle's.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np

from daccord_tpu.formats.dazzler_db import DazzlerDB, codes_to_str
from daccord_tpu.formats.las import LasFile
from daccord_tpu.oracle.consensus import build_plq, select_read_ids, stitch
from daccord_tpu.oracle.dbg import window_consensus
from daccord_tpu.oracle.eprof import ErrorProfile, estimate_error_profile
from daccord_tpu.pipeline.batcher import consensus_batch
from daccord_tpu.pipeline.windows import ReadCache, extract_windows, realign_pile
from daccord_tpu.utils.config import DaccordConfig


@dataclasses.dataclass
class RunStats:
    reads: int = 0
    windows: int = 0
    windows_ok: int = 0
    windows_failed_cov: int = 0
    k2_retries: int = 0
    fragments: int = 0
    batches: int = 0


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def run_tpu(db_path: str, las_path: str, cfg: DaccordConfig,
            profile: Optional[ErrorProfile] = None
            ) -> Tuple[List[Tuple[str, str]], RunStats]:
    """Full corrected-FASTA run using the device consensus step."""
    db = DazzlerDB.open(db_path)
    las = LasFile.open(las_path)
    if profile is None:
        if cfg.E is not None:
            profile = ErrorProfile.load(cfg.E)
        else:
            profile = estimate_error_profile(db, las, cfg)
    plq = build_plq(profile, cfg)
    cache = ReadCache(db)
    stats = RunStats()

    # ---- host front half: gather all windows of the read range ----
    read_ids = list(select_read_ids(db.nreads, cfg))
    jobs: List[Tuple[int, int, list]] = []   # (read slot, window idx, strings)
    nwin_per_read: List[int] = []
    for slot, aread in enumerate(read_ids):
        stats.reads += 1
        A = db.read_codes(aread)
        pile = las.pile(aread)
        realigned, _ = realign_pile(A, pile, cache, las.tspace)
        wps = extract_windows(A, realigned, cfg)
        nwin_per_read.append(len(wps))
        for wi, wp in enumerate(wps):
            stats.windows += 1
            if wp.failed_coverage:
                stats.windows_failed_cov += 1
            else:
                jobs.append((slot, wi, wp.strings))

    # ---- device: batched k=8 pass over all candidate windows ----
    winners: List[List[Optional[np.ndarray]]] = [
        [None] * n for n in nwin_per_read]
    BS = cfg.batch_windows
    for off in range(0, len(jobs), BS):
        chunk = jobs[off:off + BS]
        # always pad to the configured batch size: one device compile total
        res = consensus_batch([j[2] for j in chunk], cfg, plq, cfg.k, batch=BS)
        stats.batches += 1
        for (slot, wi, strings), r in zip(chunk, res):
            if r is None:
                # adaptive k2 retry (host sparse pass, ALGORITHM §6)
                r = window_consensus(strings, cfg, plq, cfg.k2)
                if r is not None:
                    stats.k2_retries += 1
            if r is not None:
                stats.windows_ok += 1
            winners[slot][wi] = r

    # ---- stitch + ordered emission (ALGORITHM §5, §8) ----
    records: List[Tuple[str, str]] = []
    for slot, aread in enumerate(read_ids):
        frags = [f for f in stitch(winners[slot], cfg) if len(f[2]) >= cfg.l]
        if cfg.f:
            A = db.read_codes(aread)
            rlen = len(A)
            full = []
            cur = 0
            for (astart, aend, seq) in frags:
                if astart > cur:
                    full.append(A[cur:astart])
                full.append(seq)
                cur = aend
            if cur < rlen:
                full.append(A[cur:rlen])
            seq = np.concatenate(full) if full else A
            records.append((f"{aread}/0_{rlen}", codes_to_str(seq)))
            stats.fragments += 1
        else:
            for (astart, aend, seq) in frags:
                records.append((f"{aread}/{astart}_{aend}", codes_to_str(seq)))
                stats.fragments += 1
    return records, stats
