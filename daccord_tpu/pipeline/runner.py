"""End-to-end device pipeline: the TPU-native ``daccord`` main loop.

Mirrors SURVEY §3.1's call stack with the TPU-first structure of SURVEY §7.1:

  host: pile load -> decode -> batched trace realignment -> window stacks
  device: dense batched consensus (ops/consensus_step.py) at k=8
  device: adaptive k2 retry on failed windows, batched sparse step
          (ops/sparse_k2.py; SURVEY §7.3 item 6) — host sparse oracle for
          tiny batches (k2_impl, both bit-identical)
  host: stitch -> ordered FASTA emission

Output is byte-identical to the NumPy oracle (tests/test_e2e.py): the device
step equals oracle window_consensus bit-exactly and the k2 retry path IS the
oracle's.
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Tuple

import numpy as np

from daccord_tpu.formats.dazzler_db import DazzlerDB, codes_to_str
from daccord_tpu.formats.las import LasFile, open_piles
from daccord_tpu.oracle.consensus import select_read_ids
from daccord_tpu.oracle.dbg import window_consensus
from daccord_tpu.pipeline.batcher import bucket_d1, e_q6_of
from daccord_tpu.pipeline.windows import ReadCache, realign_pile
from daccord_tpu.utils.config import DaccordConfig
from daccord_tpu.utils.jaxsetup import setup_compilation_cache


@dataclasses.dataclass
class RunStats:
    reads: int = 0
    windows: int = 0
    windows_ok: int = 0
    windows_failed_cov: int = 0
    k2_retries: int = 0
    k2_attempts: int = 0
    fragments: int = 0
    batches: int = 0


def _front_half_device(db, las, cfg, read_ids):
    """Front half with the trace-block DPs batched onto the device:
    prepare every pile on host, run ONE device_bpos_at over all blocks,
    then finish maps + row extraction (ops/realign_dp.py)."""
    from daccord_tpu.ops.realign_dp import device_bpos_at
    from daccord_tpu.pipeline.rows import extract_rows
    from daccord_tpu.pipeline.windows import (
        finish_pile, make_skeleton, prepare_pile,
    )

    cache = ReadCache(db)
    entries = []
    for slot, aread in enumerate(read_ids):
        A = db.read_codes(aread)
        pile = las.pile(aread)
        skel = make_skeleton(pile, cache)
        prep = prepare_pile(A, pile, cache, las.tspace, cfg.w, cfg.a)
        entries.append((A, pile, skel, prep))

    live = [e for e in entries if e[3] is not None]
    if live:
        LA = max(e[3]["Abuf"].shape[1] for e in live)
        LB = max(e[3]["Bbuf"].shape[1] for e in live)
        PX = max(e[3]["X"].shape[1] for e in live)
        Ns = [len(e[3]["la"]) for e in live]
        Ntot = sum(Ns)
        Ab = np.full((Ntot, LA), 4, np.uint8)
        Bb = np.full((Ntot, LB), 4, np.uint8)
        la = np.zeros(Ntot, np.int64)
        lb = np.zeros(Ntot, np.int64)
        X = np.zeros((Ntot, PX), np.int64)
        off = 0
        for e in live:
            p = e[3]
            n = len(p["la"])
            Ab[off:off + n, :p["Abuf"].shape[1]] = p["Abuf"]
            Bb[off:off + n, :p["Bbuf"].shape[1]] = p["Bbuf"]
            la[off:off + n] = p["la"]
            lb[off:off + n] = p["lb"]
            X[off:off + n, :p["X"].shape[1]] = p["X"]
            off += n
        bp_all = device_bpos_at(Ab, la, Bb, lb, X)
        off = 0
        for e in live:
            p = e[3]
            n = len(p["la"])
            finish_pile(p, e[1], e[2], bp_all[off:off + n, :p["X"].shape[1]])
            off += n
    return [extract_rows(A, skel, cfg) for (A, pile, skel, prep) in entries]


def emit_read(records: List[Tuple[str, str]], db, aread: int,
              frags_in, cfg: DaccordConfig) -> int:
    """Append one read's FASTA records (ALGORITHM §5 emission rules: -l
    length filter, -f full-sequence fill).  Returns the fragment count.
    Shared by the device runner, the CPU baseline runner and the streaming
    collector so emission bytes cannot diverge."""
    frags = [f for f in frags_in if len(f[2]) >= cfg.l]
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
        return 1
    for (astart, aend, seq) in frags:
        records.append((f"{aread}/{astart}_{aend}", codes_to_str(seq)))
    return len(frags)


_PP: dict = {}


def _pp_init(db_path, las_path, cfg):
    """Forked front-half worker: own mmap handles, no jax import."""
    os.environ["DACCORD_NATIVE_THREADS"] = "1"   # workers are the threads
    _PP["db"] = DazzlerDB.open(db_path)
    las = open_piles(las_path)
    las.build_index()
    _PP["las"] = las
    _PP["cfg"] = cfg
    _PP["cache"] = ReadCache(_PP["db"])


def _pp_front(slot_aread):
    from daccord_tpu.pipeline.rows import extract_rows
    slot, aread = slot_aread
    db, las, cfg = _PP["db"], _PP["las"], _PP["cfg"]
    A = db.read_codes(aread)
    pile = las.pile(aread)
    realigned, _ = realign_pile(A, pile, _PP["cache"], las.tspace,
                                w=cfg.w, a=cfg.a)
    return slot, extract_rows(A, realigned, cfg)


def _pp_front_shm(slot_aread):
    """Front-half worker with shared-memory array transport: only the
    segment name + header crosses the result pipe (VERDICT r3 item 8)."""
    from daccord_tpu.pipeline.rows import rows_to_shm
    slot, rr = _pp_front(slot_aread)
    return slot, rows_to_shm(rr)


def run_tpu(db_path: str, las_path: str, cfg: DaccordConfig,
            profile=None,
            use_mesh: Optional[bool] = None,
            sink=None
            ) -> Tuple[List[Tuple[str, str]], RunStats]:
    """Full corrected-FASTA run using the device consensus step.

    use_mesh: shard window batches across all local devices via the data
    mesh (SURVEY §2.4 DP row).  Default: auto (on when >1 device visible).
    sink: optional ``(name, seq) -> None`` callable receiving each output
    record the moment the ordered-emission cursor reaches it (same order
    and bytes as the returned list).  With a sink the returned record list
    stays EMPTY, so nothing output-sized accumulates in RAM — the last
    piece of per-run state that scaled with part size (the per-read row
    pools and winner lists were already freed as reads emit).  Note the
    ordered cursor still buffers completed reads BEHIND an unfinished one
    (bounded in practice by the depth-bucket flush horizon, not part size).
    """
    db = DazzlerDB.open(db_path)
    las = open_piles(las_path)
    if profile is None:
        if cfg.E is not None:
            from daccord_tpu.oracle.eprof import load_profile
            profile = load_profile(cfg.E)
        else:
            from daccord_tpu.oracle.eprof import estimate_error_profile_v2
            profile = estimate_error_profile_v2(db, las, cfg)
    from daccord_tpu.oracle.consensus import ConsensusTables
    tables = ConsensusTables(profile, cfg)
    stats = RunStats()

    # ---- host front half + streamed device dispatch ----
    # The front half (pile realign + window extraction, the reference's
    # thread-pool region SURVEY §3.1) runs on a host worker pool (-t); the
    # main thread drains completed reads and dispatches full device batches
    # immediately, so host decode/realign overlaps device compute (the PP
    # analog of SURVEY §2.4: host pipeline stages).  Jobs are grouped into
    # the depth-bucket shape menu (SURVEY §7.3 item 2) so shallow piles
    # don't pay deep-pile padding.
    import concurrent.futures as cf
    import threading

    from daccord_tpu.utils.obslog import RunLog
    log = RunLog(enabled=cfg.V > 0)

    setup_compilation_cache()
    read_ids = list(select_read_ids(db, cfg))
    stats.reads = len(read_ids)
    las.build_index()  # shared, build once before threading
    tls = threading.local()

    from daccord_tpu.pipeline.rows import extract_rows, pack_rows_batch

    def front_half(slot_aread):
        slot, aread = slot_aread
        if not hasattr(tls, "cache"):
            tls.cache = ReadCache(db)
        A = db.read_codes(aread)
        pile = las.pile(aread)
        realigned, _ = realign_pile(A, pile, tls.cache, las.tspace, w=cfg.w, a=cfg.a)
        return slot, extract_rows(A, realigned, cfg)

    BS = cfg.batch_windows
    cap_d1 = cfg.d + 1
    buckets: dict = {}
    pending = []

    from daccord_tpu.ops.consensus_step import ConsensusOut
    from daccord_tpu.ops.consensus_step import consensus_step as _single_step
    import jax as _jax

    ndev = len(_jax.devices())
    if use_mesh is None:
        use_mesh = ndev > 1
    _mesh = None
    if use_mesh and ndev > 1 and cfg.batch_windows % ndev == 0:
        from daccord_tpu.parallel.mesh import make_mesh, sharded_consensus
        # window results are merged ON DEVICE (all_gather over the data
        # axis) so emission reads one replicated tensor — ICI collectives
        # instead of per-shard DCN fetches on pods (SURVEY §2.4 comm row)
        _mesh = make_mesh()
        _mesh_fn = sharded_consensus(_mesh, cfg, cfg.k,
                                     merge_collective=True)

        def _cstep(S, slen, nstr, ps, pk, pw, **_kw):
            return ConsensusOut(*_mesh_fn(S, slen, nstr, ps, pk, pw))
    else:
        _cstep = _single_step

    # Positional-eprof table groups (ALGORITHM §7 v2) ride INSIDE batches as
    # per-window plq columns [B, W'] / pbw kernels [B, NB, NB], so batching
    # stays keyed by depth only (no table-group fragmentation).
    rlens = [int(db.rlen[aread]) for aread in read_ids]
    ntab = len(tables.plq)
    ps_stack = np.stack([np.ascontiguousarray(p[:cfg.wprime, 0], np.int32)
                         for p in tables.plq])             # [T, W']
    pk_stack = np.stack([np.ascontiguousarray(
        p[:cfg.wprime, cfg.w - cfg.k], np.int32) for p in tables.plq])
    pbw_stack = (np.stack(tables.pbw) if tables.pbw[0] is not None else None)

    def _tabs_perwin(chunk):
        """Per-window (plq_src [B,W'], plq_snk, pbw [B,NB,NB]) for a MIXED
        chunk (remainders of several table groups merged into one batch —
        the per-window operand form costs ~20% more device time than the
        shared form, so it is used only for these remainders)."""
        tbs = np.zeros(BS, np.int64)
        for i, (slot, wi) in enumerate(chunk):
            tbs[i] = tables.table_of(wi * cfg.a, rlens[slot])
        return (np.ascontiguousarray(ps_stack[tbs]),
                np.ascontiguousarray(pk_stack[tbs]),
                None if pbw_stack is None
                else np.ascontiguousarray(pbw_stack[tbs]))

    # ---- streaming collector state (bounded memory; VERDICT r2 item 2) ----
    # Every window's final verdict is tracked per read: as soon as a read's
    # last window resolves, the read is stitched and emitted and its row
    # pool + winner list are FREED — nothing scales with total run size
    # except the ordered-output buffer.  Device outputs are fetched in
    # bounded flights (cfg.max_flight_batches); small runs fetch exactly
    # once at the end, identical to the round-2 collect-then-stitch path.
    nreads = len(read_ids)
    reads_rows: List = [None] * nreads
    winners: List[Optional[List[Optional[np.ndarray]]]] = [None] * nreads
    unresolved = np.zeros(nreads, np.int64)  # windows w/o a final verdict
    unfetched = np.zeros(nreads, np.int64)   # live windows not yet fetched
    ready_recs: List[Optional[List[Tuple[str, str]]]] = [None] * nreads
    records: List[Tuple[str, str]] = []
    emit_state = {"cursor": 0}
    bucket_birth: dict = {}
    from daccord_tpu.pipeline.stitcher import stitch_many

    def _stitch_emit(slot):
        frags = stitch_many([winners[slot]], cfg, nthreads=1)[0]
        recs: List[Tuple[str, str]] = []
        stats.fragments += emit_read(recs, db, read_ids[slot], frags, cfg)
        ready_recs[slot] = recs
        winners[slot] = None
        cur = emit_state["cursor"]          # ordered emission (ALGORITHM §8)
        while cur < nreads and ready_recs[cur] is not None:
            if sink is not None:
                for rec in ready_recs[cur]:
                    sink(*rec)
            else:
                records.extend(ready_recs[cur])
            ready_recs[cur] = []
            cur += 1
        emit_state["cursor"] = cur

    def _resolve(slot, nres=1):
        unresolved[slot] -= nres
        if unresolved[slot] == 0:
            _stitch_emit(slot)

    def _after_fetch(slot):
        unfetched[slot] -= 1
        if unfetched[slot] == 0:
            reads_rows[slot] = None         # free the read's row pool

    # adaptive-k2 retry queue (ALGORITHM §6): window strings are extracted
    # at fetch time (so row pools can be freed); 'host' resolves windows
    # immediately via the sparse oracle, 'device'/'auto' accumulates K2_BS
    # groups for the batched sparse step — all bit-identical.  Queues are
    # keyed by the DEPTH bucket (the k=8 shape menu): the sparse step's
    # node/edge tables are sized D1*(W'-k+1), so a shallow retry window at
    # D1=9 pays ~7x less sort/scatter work than at the cap (VERDICT r2
    # item 6 "halve Ne padding").
    k2q: dict = {}                       # d1 -> [(slot, wi, strings)]
    K2_BS = int(os.environ.get("DACCORD_K2_BS", "64"))
    pk2_stack = np.stack([np.ascontiguousarray(
        p[:cfg.wprime, cfg.w - cfg.k2], np.int32) for p in tables.plq])
    use_dev_k2 = cfg.k2_impl in ("device", "auto") and cfg.w >= cfg.k2
    from daccord_tpu.ops.sparse_k2 import consensus_step_sparse
    if _mesh is not None and K2_BS % ndev == 0:
        # k2 retries ride the SAME data mesh as the k=8 step (SURVEY §7.3
        # item 6): batch-pure sparse step under shard_map, results merged
        # on device — pods no longer serialize retries on one chip
        from daccord_tpu.parallel.mesh import sharded_sparse_consensus
        _k2_mesh_fn = sharded_sparse_consensus(_mesh, cfg,
                                               merge_collective=True)

        def _k2step(S2, sl2, ns2, ps2, pk2, pw2):
            return ConsensusOut(*_k2_mesh_fn(S2, sl2, ns2, ps2, pk2, pw2))
    else:
        def _k2step(S2, sl2, ns2, ps2, pk2, pw2):
            return consensus_step_sparse(
                S2, sl2, ns2, ps2, pk2, pw2, k=cfg.k2, w=cfg.w,
                path_delta=cfg.path_delta, e_q6=e_q6_of(cfg),
                pos_bin=cfg.pos_bin)

    def _k2_host(slot, wi, strings):
        plq_w, pbw_w = tables.for_window(wi * cfg.a, rlens[slot])
        r = window_consensus(strings, cfg, plq_w, cfg.k2, pbw_w)
        if r is not None:
            stats.k2_retries += 1
            stats.windows_ok += 1
        winners[slot][wi] = r
        _resolve(slot)

    consume_state = {"max_slot": -1}

    def _k2_flush(force=False):
        from daccord_tpu.pipeline.batcher import pack_windows
        # age-based flush (round-5): a lone retry window in a queue that
        # never reaches K2_BS used to wait for the END-of-run force flush,
        # pinning the ordered-emission cursor (and with it every later
        # read's output buffering) for the whole run.  Flush a partial
        # queue once its oldest window's read is bucket_flush_reads behind
        # the front half — same batch-invariance argument as the dense
        # bucket flush: membership changes only, output bytes identical.
        horizon = consume_state["max_slot"] - cfg.bucket_flush_reads
        for d1 in sorted(k2q):
            q = k2q[d1]
            while q and (len(q) >= K2_BS or force or q[0][0] < horizon):
                ck = q[:K2_BS]
                del q[:K2_BS]
                if len(ck) < 16 and cfg.k2_impl == "auto":
                    # tiny leftover group: the host sparse oracle beats a
                    # device dispatch (results bit-identical either way)
                    for (slot, wi, strings) in ck:
                        _k2_host(slot, wi, strings)
                    continue
                piles = [strings for (_, _, strings) in ck]
                S2, sl2, ns2 = pack_windows(piles, cfg, K2_BS, d1)
                if ntab == 1:
                    ps2, pk2 = ps_stack[0], pk2_stack[0]
                    pw2 = None if pbw_stack is None else pbw_stack[0]
                else:
                    tbs = np.zeros(K2_BS, np.int64)
                    for i, (s, wj, _) in enumerate(ck):
                        tbs[i] = tables.table_of(wj * cfg.a, rlens[s])
                    ps2 = np.ascontiguousarray(ps_stack[tbs])
                    pk2 = np.ascontiguousarray(pk2_stack[tbs])
                    pw2 = (None if pbw_stack is None
                           else np.ascontiguousarray(pbw_stack[tbs]))
                with log.phase("k2_device"):
                    o = _k2step(S2, sl2, ns2, ps2, pk2, pw2)
                    okk = np.asarray(o.ok)
                    ll = np.asarray(o.length)
                    bb = np.asarray(o.bases)
                for i, (s, wj, _) in enumerate(ck):
                    if okk[i]:
                        winners[s][wj] = bb[i, :ll[i]].astype(np.uint8)
                        stats.k2_retries += 1
                        stats.windows_ok += 1
                    else:
                        winners[s][wj] = None
                    _resolve(s)

    def _fetch_group(n):
        """Fetch + demux the oldest n batches (one device round trip; the
        per-fetch latency amortizes over n * step-time of device compute)."""
        group = pending[:n]
        del pending[:n]
        if not group:
            return
        import jax.numpy as jnp
        with log.phase("device_collect"):
            ok_all = np.asarray(jnp.concatenate([o.ok for _, o in group]))
            len_all = np.asarray(jnp.concatenate(
                [o.length for _, o in group]))
            bases_all = np.asarray(jnp.concatenate(
                [o.bases for _, o in group]))
        with log.phase("demux"):
            off = 0
            for chunk, out in group:
                B = out.ok.shape[0]
                for i, (slot, wi) in enumerate(chunk):
                    if ok_all[off + i]:
                        winners[slot][wi] = bases_all[
                            off + i, :len_all[off + i]].astype(np.uint8)
                        stats.windows_ok += 1
                        _after_fetch(slot)
                        _resolve(slot)
                    else:
                        stats.k2_attempts += 1
                        strings = reads_rows[slot].window_strings(wi)
                        _after_fetch(slot)
                        if use_dev_k2:
                            d1 = bucket_d1(len(strings), cap_d1)
                            k2q.setdefault(d1, []).append((slot, wi, strings))
                        else:
                            _k2_host(slot, wi, strings)
                off += B
        if use_dev_k2:
            _k2_flush(force=False)

    def _dispatch(chunk, d1, tb):
        """tb = table index for a uniform chunk, or None for a mixed one."""
        S, slen, nstr = pack_rows_batch(reads_rows, None, chunk,
                                        cfg, BS, d1)
        if tb is not None:
            ps_b, pk_b = ps_stack[tb], pk_stack[tb]
            pw_b = None if pbw_stack is None else pbw_stack[tb]
        else:
            ps_b, pk_b, pw_b = _tabs_perwin(chunk)
        out = _cstep(S, slen, nstr, ps_b, pk_b, pw_b,
                     k=cfg.k, w=cfg.w, path_delta=cfg.path_delta,
                     e_q6=e_q6_of(cfg), pos_bin=cfg.pos_bin)
        pending.append((chunk, out))
        stats.batches += 1
        if len(pending) > cfg.max_flight_batches:
            # bounded flights: drain to half the limit (hysteresis halves
            # the number of device round trips vs a fetch-per-batch drain)
            _fetch_group(len(pending) - cfg.max_flight_batches // 2)

    # ---- streamed front half + dispatch (the PP analog, SURVEY §2.4) ----
    # Each read's row tables are consumed the moment they exist: full
    # (depth, table-group) buckets dispatch IMMEDIATELY, so device compute
    # starts while later reads are still being realigned on host — device
    # work is the wall-clock bound, the front half hides behind it.  Batch
    # membership is identical to the two-phase form (windows enter buckets
    # in read order either way), and per-window results are batch-invariant
    # (bit-exactness tested), so output bytes are unchanged.
    # Default single worker (inline); -t N>1 fans the per-read row-table
    # build over N worker PROCESSES — the front half is GIL-bound Python
    # around the C++ DP, so threads don't scale (measured strictly slower),
    # but forked processes do: each worker opens its own mmap handles and
    # ships back the pure-numpy ReadRows (~100KB/read of IPC); ex.map yields
    # in submission order, so consumption stays deterministic.
    # -t 0 (default) = auto.  At 10x the pool measured break-even vs
    # inline (startup + IPC ~= the savings, RESULTS front-half table) but
    # at 40-60x coverage the front half is ~6x the work per read and
    # becomes the PIPELINE WALL inline (60x phase split: front_dispatch
    # 24.2s of a 24.8s pass); the pool's measured 3.1x then feeds the
    # device fast enough to hide behind it again.  The las header knows
    # the mean pile depth before any work starts — fan out at >= 20
    # overlaps/read, stay inline (no pool startup) below.
    if cfg.t > 0:
        nworkers = cfg.t
    else:
        depth = las.novl / max(1, db.nreads)    # mean pile size (upfront)
        # respect cgroup/affinity limits and cap the auto fan-out: beyond
        # ~16 workers the per-read IPC and pool startup dominate any
        # remaining front-half speedup (front half hides behind device
        # compute long before that).  Flip point MEASURED round 5
        # (scripts/probe_pool_flip.py, 4-core host): the front-half-only
        # pool speedup incl. startup is >1 from depth ~8 (0.97x at 4.7,
        # 1.48x at 8.1, 2.1x at 16.8, 3.5x at 47), but the PIPELINE only
        # benefits once the inline front half stops hiding behind device
        # compute: inline costs 3.4 ms/read at depth 17 vs ~13 ms/read of
        # device work (fully hidden — pool startup would be a pure ~0.2 s
        # loss per pass), 11.8 ms/read at depth 47 vs ~15 (margin gone;
        # the 60x phase split showed front_dispatch AS the wall inline).
        # depth >= 20 keeps ~2x margin below the crossover.
        try:
            avail = len(os.sched_getaffinity(0))
        except AttributeError:              # non-Linux
            avail = os.cpu_count() or 1
        nworkers = min(avail, 16) if depth >= 20 else 1

    def _consume(slot, rr):
        consume_state["max_slot"] = max(consume_state["max_slot"], slot)
        reads_rows[slot] = rr
        winners[slot] = [None] * rr.nwin
        unresolved[slot] = rr.nwin
        stats.windows += rr.nwin
        nfail = int(rr.failed.sum())
        stats.windows_failed_cov += nfail
        live = np.flatnonzero(~rr.failed)
        unfetched[slot] = len(live)
        if len(live) == 0:
            reads_rows[slot] = None         # no window will read the pool
        for wi in live:
            d1 = bucket_d1(int(rr.nstr[wi]), cap_d1)
            tb = tables.table_of(int(wi) * cfg.a, rlens[slot])
            bjobs = buckets.setdefault((d1, tb), [])
            if not bjobs:
                bucket_birth[(d1, tb)] = slot
            bjobs.append((slot, int(wi)))
            if len(bjobs) == BS:
                _dispatch(bjobs, d1, tb)
                buckets[(d1, tb)] = []
        if rr.nwin - len(live) or rr.nwin == 0:
            _resolve(slot, rr.nwin - len(live))  # failed-coverage windows
        # stale-bucket flush: a rare-depth bucket must not pin every read's
        # row pool until the end of the run; partial batches change batch
        # membership only (per-window results are batch-invariant, so the
        # output bytes are unchanged — tests/test_e2e.py)
        if slot % 64 == 63:
            for key in list(buckets):
                bjobs = buckets[key]
                if bjobs and slot - bucket_birth[key] > cfg.bucket_flush_reads:
                    _dispatch(bjobs, key[0], key[1])
                    buckets[key] = []

    with log.phase("front_dispatch"):
        if cfg.realign_device:
            for slot, rr in enumerate(_front_half_device(db, las, cfg,
                                                         read_ids)):
                _consume(slot, rr)
        elif nworkers > 1:
            import multiprocessing as mp
            ctx = mp.get_context("fork")
            # IPC transport: pickled ReadRows by default.  A shared-memory
            # variant (DACCORD_FRONT_IPC=shm; per-read /dev/shm segment,
            # name+header through the pipe) was built and MEASURED SLOWER
            # at bench scale — median-of-5 front-half speedup at 4 workers:
            # pickle 3.12x vs shm 2.69x (scripts/bench_front.py; the
            # per-segment shm_open/mmap/unlink + double page-touch costs
            # more than piping ~100KB) — kept for many-core hosts where
            # pipe bandwidth, not syscall rate, binds
            use_shm = os.environ.get("DACCORD_FRONT_IPC", "pickle") == "shm"
            front_fn = _pp_front_shm if use_shm else _pp_front
            from daccord_tpu.pipeline.rows import rows_from_shm
            with cf.ProcessPoolExecutor(
                    max_workers=nworkers, mp_context=ctx,
                    initializer=_pp_init,
                    initargs=(db_path, las_path, cfg)) as ex:
                # BOUNDED submission window (round-5 fix): ex.map submits
                # every job eagerly, so on a device-bound run the workers
                # race ahead and the completed ReadRows pile up in the
                # parent — the 4.6 Mb scale run measured 45 GB peak RSS
                # from ~60k buffered results.  A sliding window of
                # ~8 x workers in-flight futures keeps the pool busy while
                # bounding buffered results; consumption stays in
                # submission order, so batch membership and output bytes
                # are unchanged.
                from collections import deque
                window = max(8 * nworkers, 16)
                jobs = iter(enumerate(read_ids))
                fut = deque()
                for job in jobs:
                    fut.append(ex.submit(front_fn, job))
                    if len(fut) >= window:
                        break
                while fut:
                    slot, payload = fut.popleft().result()
                    nxt = next(jobs, None)
                    if nxt is not None:
                        fut.append(ex.submit(front_fn, nxt))
                    _consume(slot, payload if not use_shm
                             else rows_from_shm(payload))
        else:
            for sa in enumerate(read_ids):
                _consume(*front_half(sa))
        # leftovers: merge ACROSS table groups per depth into mixed
        # per-window batches (no table-group fragmentation); full buckets
        # above used the cheaper shared-table operand form
        rest: dict = {}
        for (d1, tb) in sorted(buckets):
            rest.setdefault(d1, []).extend(buckets[(d1, tb)])
        for d1 in sorted(rest):
            bjobs = rest[d1]
            for off in range(0, len(bjobs), BS):
                chunk = bjobs[off:off + BS]
                tbs0 = {tables.table_of(wi * cfg.a, rlens[s])
                        for (s, wi) in chunk}
                _dispatch(chunk, d1,
                          tbs0.pop() if len(tbs0) == 1 else None)

    # drain: fetch every outstanding batch (small runs reach here with ALL
    # batches pending — one fetch, the round-2 behavior), then force the
    # k2 leftovers; every read stitches + emits as its last window resolves
    _fetch_group(len(pending))
    _k2_flush(force=True)
    if stats.windows and stats.k2_attempts > 0.05 * stats.windows:
        # retry-rate alarm (repeat-heavy data): each k2 window costs
        # ~10-30x a k=8 window; surface it even without -V so an
        # operator sees why throughput fell (VERDICT r1 weak #8)
        import sys as _sys
        print(f"daccord: WARNING: adaptive-k retry rate "
              f"{stats.k2_attempts / stats.windows:.1%} "
              f"({stats.k2_attempts}/{stats.windows} windows) — repeat-heavy "
              f"input; k2={cfg.k2} pass dominates runtime",
              file=_sys.stderr, flush=True)
    assert emit_state["cursor"] == nreads, \
        "streaming collector left unresolved reads"
    log.count("reads", stats.reads)
    log.count("windows", stats.windows)
    log.count("windows_ok", stats.windows_ok)
    log.count("k2_retries", stats.k2_retries)
    log.count("fragments", stats.fragments)
    log.count("batches", stats.batches)
    if cfg.V:
        log.summary()
    return records, stats
