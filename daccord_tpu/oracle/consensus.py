"""End-to-end NumPy oracle: pile -> windows -> DBG -> stitch -> FASTA.

The reference implementation of the full per-read flow of SURVEY §3.1
(``handle(aread)`` in gt1/daccord ``src/daccord.cpp``) with the pinned rules
of ALGORITHM.md.  This is the golden ground truth for the device pipeline
(north star: byte-identical corrected FASTA up to the pinned tie-breaking).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np

from daccord_tpu.align.editdp import edit_table
from daccord_tpu.formats.dazzler_db import DazzlerDB, codes_to_str
from daccord_tpu.formats.las import LasFile, open_piles
from daccord_tpu.oracle.dbg import window_consensus_adaptive
from daccord_tpu.oracle.eprof import ErrorProfile, estimate_error_profile
from daccord_tpu.oracle.offset_likely import offset_likely_q16
from daccord_tpu.pipeline.windows import ReadCache, extract_windows, realign_pile
from daccord_tpu.utils.config import DaccordConfig


@dataclasses.dataclass
class OracleStats:
    reads: int = 0
    windows: int = 0
    windows_ok: int = 0
    windows_failed_cov: int = 0
    k2_retries: int = 0
    k2_attempts: int = 0
    fragments: int = 0


def stitch(winners: List[Optional[np.ndarray]], cfg: DaccordConfig
           ) -> List[Tuple[int, int, np.ndarray]]:
    """Splice consecutive successful window consensi (ALGORITHM §5).

    Returns fragments as (astart, aend, codes).
    """
    w, a = cfg.w, cfg.a
    out: List[Tuple[int, int, np.ndarray]] = []
    i = 0
    n = len(winners)
    while i < n:
        if winners[i] is None:
            i += 1
            continue
        j = i
        acc = winners[i]
        while j + 1 < n and winners[j + 1] is not None:
            Q = winners[j + 1]
            lp = min(len(acc), (w - a) + cfg.path_delta)
            P = acc[len(acc) - lp:]
            D = edit_table(P, Q)
            jstar = int(np.argmin(D[lp]))           # first min
            acc = np.concatenate([acc, Q[jstar:]])
            j += 1
        out.append((i * a, j * a + w, acc))
        i = j + 1
    return out


def correct_read(db: DazzlerDB, las: LasFile, aread: int, cfg: DaccordConfig,
                 plq: np.ndarray, cache: ReadCache,
                 stats: Optional[OracleStats] = None,
                 pbw: Optional[np.ndarray] = None,
                 tables: Optional["ConsensusTables"] = None
                 ) -> List[Tuple[int, int, np.ndarray]]:
    """Corrected fragments for one read (SURVEY §3.1 hot region).

    Either pass fixed (plq, pbw) tables, or ``tables`` for per-window
    positional selection (ALGORITHM §7 v2)."""
    A = db.read_codes(aread)
    rlen = len(A)
    pile = las.pile(aread)
    realigned, _ = realign_pile(A, pile, cache, las.tspace, w=cfg.w, a=cfg.a)
    wps = extract_windows(A, realigned, cfg)
    winners: List[Optional[np.ndarray]] = []
    for wi, wp in enumerate(wps):
        if stats:
            stats.windows += 1
        if wp.failed_coverage:
            if stats:
                stats.windows_failed_cov += 1
            winners.append(None)
            continue
        if tables is not None:
            plq, pbw = tables.for_window(wi * cfg.a, rlen)
        res, kused = window_consensus_adaptive(wp.strings, cfg, plq, pbw)
        if stats and kused != cfg.k:
            stats.k2_attempts += 1
        if stats and kused == cfg.k2:
            stats.k2_retries += 1
        if stats and res is not None:
            stats.windows_ok += 1
        winners.append(res)
    frags = stitch(winners, cfg)
    return [f for f in frags if len(f[2]) >= cfg.l]


def build_plq(profile: ErrorProfile, cfg: DaccordConfig) -> np.ndarray:
    return offset_likely_q16(cfg.wprime, cfg.w, profile.e_ins, profile.e_del)


def build_pbw(profile: ErrorProfile, cfg: DaccordConfig
              ) -> Optional[np.ndarray]:
    """Positional edge-weight kernel, or None when pos_weight is off."""
    if not cfg.pos_weight:
        return None
    from daccord_tpu.oracle.offset_likely import pos_bin_weights_q6
    return pos_bin_weights_q6(cfg.wprime, cfg.pos_bin,
                              profile.e_ins, profile.e_del)


class ConsensusTables:
    """PLq/PBW tables per read-position bin (ALGORITHM §3, §7 v2).

    With a PositionalErrorProfile (the positional eprof of the reference,
    SURVEY §2.1), each read-position decile gets tables built from its own
    indel rates; windows select by the decile of their midpoint.  Identical
    rate pairs share tables, so a scalar/uniform profile degenerates to one
    table set (v1 behavior).  Both the oracle and the device runner consume
    THIS object, keeping oracle == device equality by construction."""

    def __init__(self, profile, cfg: DaccordConfig):
        from daccord_tpu.oracle.eprof import PositionalErrorProfile
        self.cfg = cfg
        if isinstance(profile, PositionalErrorProfile):
            profs = [profile.bin_profile(b).rounded()
                     for b in range(len(profile.e_sub))]
        else:
            profs = [profile]
        self.nbins = len(profs)
        self.bin_table = []
        self.plq: list = []
        self.pbw: list = []
        keys: dict = {}
        for p in profs:
            key = (round(p.e_ins, 6), round(p.e_del, 6))
            if key not in keys:
                keys[key] = len(self.plq)
                self.plq.append(build_plq(p, cfg))
                self.pbw.append(build_pbw(p, cfg))
            self.bin_table.append(keys[key])

    def table_of(self, ws: int, rlen: int) -> int:
        """Shared-table index for the window starting at ws of a read of
        length rlen (pinned: decile of the window midpoint)."""
        if self.nbins == 1:
            return 0
        b = min(self.nbins - 1,
                self.nbins * (ws + self.cfg.w // 2) // max(rlen, 1))
        return self.bin_table[b]

    def for_window(self, ws: int, rlen: int):
        t = self.table_of(ws, rlen)
        return self.plq[t], self.pbw[t]


def select_read_ids(db, cfg: DaccordConfig) -> range:
    """DB-block view, then -I interval, then -J contiguous part (pinned
    split, ALGORITHM §8).  ``db`` is a DazzlerDB (or, for unsplit callers,
    a plain read count)."""
    if isinstance(db, int):
        nreads, blo, bhi = db, 0, db
    else:
        nreads = db.nreads
        blo, bhi = db.block_interval if db.block else (0, nreads)
    lo, hi = (0, nreads) if cfg.I is None else (cfg.I[0], min(cfg.I[1], nreads))
    lo, hi = max(lo, blo), max(min(hi, bhi), max(lo, blo))
    i, n = cfg.J
    length = hi - lo
    return range(lo + i * length // n, lo + (i + 1) * length // n)


def run_oracle(db_path: str, las_path: str, cfg: DaccordConfig,
               profile=None
               ) -> Tuple[List[Tuple[str, str]], OracleStats]:
    """Full oracle run -> (FASTA records, stats). Deterministic (ALGORITHM §8)."""
    db = DazzlerDB.open(db_path)
    las = open_piles(las_path)
    if profile is None:
        if cfg.E is not None:
            from daccord_tpu.oracle.eprof import load_profile
            profile = load_profile(cfg.E)
        else:
            from daccord_tpu.oracle.eprof import estimate_error_profile_v2
            profile = estimate_error_profile_v2(db, las, cfg)
    tables = ConsensusTables(profile, cfg)
    cache = ReadCache(db)
    stats = OracleStats()
    records: List[Tuple[str, str]] = []
    for aread in select_read_ids(db, cfg):
        stats.reads += 1
        frags = correct_read(db, las, aread, cfg, None, cache, stats,
                             tables=tables)
        A = None
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
