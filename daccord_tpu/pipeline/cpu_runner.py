"""CPU-baseline pipeline: the honest C++ denominator for the perf bar.

Runs the FULL corrected-FASTA pipeline with the consensus core in native C++
(native/cpu_consensus.cpp — sparse hash DBG + heaviest path + Landau-Vishkin
scoring, the reference's own per-window architecture; gt1/daccord
``src/daccord.cpp`` ``DebruijnGraph`` + ``libmaus2::lcs`` shape, SURVEY §3.4).
The front half (trace realign) and stitch reuse the same native kernels as
the device pipeline (native/realign.cpp).

Output is byte-identical to the NumPy oracle and the device pipeline
(tests/test_cpu_consensus.py); bench.py measures this path's reads/s as the
*measured C++ CPU baseline* the ≥10×-CPU north star divides by (BASELINE.md
measurement plan (a); VERDICT r2 missing #1).
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

from daccord_tpu.formats.dazzler_db import DazzlerDB
from daccord_tpu.formats.las import open_piles
from daccord_tpu.oracle.consensus import ConsensusTables, select_read_ids
from daccord_tpu.pipeline.batcher import e_q6_of
from daccord_tpu.pipeline.rows import extract_rows
from daccord_tpu.pipeline.runner import RunStats, emit_read
from daccord_tpu.pipeline.windows import ReadCache, realign_pile
from daccord_tpu.utils.config import DaccordConfig


def stack_tables(tables: ConsensusTables):
    """(plq_stack [T,W',w+1] i32, pbw_stack [T,NB,NB] i32 or None) — the
    native kernel's table operands, built once per run."""
    plq_stack = np.ascontiguousarray(np.stack(tables.plq), np.int32)
    pbw_stack = (np.ascontiguousarray(np.stack(tables.pbw), np.int32)
                 if tables.pbw[0] is not None else None)
    return plq_stack, pbw_stack


def consensus_windows_cpu(rr, wis, tabs, plq_stack, pbw_stack,
                          cfg: DaccordConfig, lib, nthreads: int):
    """Run the C++ adaptive window consensus over the listed windows of one
    read's row table.  Returns (winners list, kused array)."""
    NW = len(wis)
    LC = cfg.w + cfg.path_delta
    if NW == 0:
        return [], np.zeros(0, np.int32)
    # CSR over the selected windows' rows
    win_ptr = np.zeros(NW + 1, np.int64)
    starts, lens = [], []
    for i, wi in enumerate(wis):
        r0, r1 = int(rr.row_ptr[wi]), int(rr.row_ptr[wi + 1])
        starts.append(rr.row_start[r0:r1])
        lens.append(rr.row_len[r0:r1])
        win_ptr[i + 1] = win_ptr[i] + (r1 - r0)
    row_start = np.ascontiguousarray(np.concatenate(starts), np.int64)
    row_len = np.ascontiguousarray(np.concatenate(lens), np.int32)
    win_tab = np.ascontiguousarray(tabs, np.int32)

    T = plq_stack.shape[0]
    if pbw_stack is not None:
        NB = pbw_stack.shape[-1]
        pbw_ptr = pbw_stack.ctypes.data
    else:
        NB = 1
        pbw_ptr = None
    out_bases = np.zeros((NW, LC), np.uint8)
    out_len = np.zeros(NW, np.int32)
    out_kused = np.zeros(NW, np.int32)
    pool = np.ascontiguousarray(rr.pool)
    lib.cpu_consensus_batch(
        pool.ctypes.data, row_start.ctypes.data, row_len.ctypes.data,
        win_ptr.ctypes.data, win_tab.ctypes.data, plq_stack.ctypes.data,
        pbw_ptr,
        NW, T, cfg.wprime, cfg.w, NB, cfg.k, cfg.k2, cfg.path_delta,
        cfg.pos_bin, e_q6_of(cfg), LC,
        out_bases.ctypes.data, out_len.ctypes.data, out_kused.ctypes.data,
        nthreads)
    winners: List[Optional[np.ndarray]] = [
        out_bases[i, :out_len[i]].copy() if out_len[i] > 0 else None
        for i in range(NW)]
    return winners, out_kused


def run_cpu(db_path: str, las_path: str, cfg: DaccordConfig,
            profile=None, nthreads: Optional[int] = None
            ) -> Tuple[List[Tuple[str, str]], RunStats]:
    """Full corrected-FASTA run with the native C++ consensus core.

    nthreads: C++ worker threads for the per-window consensus (default: -t,
    else all cores).  Output bytes are identical for any thread count
    (windows are independent; emission order is pinned)."""
    lib = _require_lib()
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
    plq_stack, pbw_stack = stack_tables(tables)
    stats = RunStats()
    if nthreads is None:
        nthreads = cfg.t if cfg.t > 0 else (os.cpu_count() or 1)

    read_ids = list(select_read_ids(db, cfg))
    stats.reads = len(read_ids)
    las.build_index()
    cache = ReadCache(db)
    from daccord_tpu.pipeline.stitcher import stitch_many
    records: List[Tuple[str, str]] = []
    for aread in read_ids:
        A = db.read_codes(aread)
        rlen = int(db.rlen[aread])
        pile = las.pile(aread)
        realigned, _ = realign_pile(A, pile, cache, las.tspace,
                                    w=cfg.w, a=cfg.a)
        rr = extract_rows(A, realigned, cfg)
        stats.windows += rr.nwin
        stats.windows_failed_cov += int(rr.failed.sum())
        wis = np.flatnonzero(~rr.failed)
        tabs = np.array([tables.table_of(int(wi) * cfg.a, rlen)
                         for wi in wis], np.int32)
        wres, kused = consensus_windows_cpu(rr, wis, tabs, plq_stack,
                                            pbw_stack, cfg, lib, nthreads)
        winners: List[Optional[np.ndarray]] = [None] * rr.nwin
        for i, wi in enumerate(wis):
            winners[int(wi)] = wres[i]
        stats.windows_ok += sum(1 for r in wres if r is not None)
        stats.k2_attempts += int((kused != cfg.k).sum())
        stats.k2_retries += int((kused == cfg.k2).sum())
        frags_all = stitch_many([winners], cfg)
        stats.fragments += emit_read(records, db, aread, frags_all[0], cfg)
    return records, stats


def _require_lib():
    from daccord_tpu.native.build import get_lib
    lib = get_lib()
    if lib is None or not hasattr(lib, "cpu_consensus_batch"):
        raise RuntimeError("native librealign.so with cpu_consensus_batch "
                           "unavailable (g++ build failed?)")
    return lib
