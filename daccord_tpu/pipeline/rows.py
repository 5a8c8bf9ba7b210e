"""Vectorized front half: pile -> realigned maps -> window ROW TABLES.

The runner's fast path (the oracle keeps the list-based
windows.extract_windows as the pinned reference; tests assert equality).
Instead of building per-window Python lists of substrings, each read yields a
flat row table:

  nstr[nwin]   strings per window (incl. the A row), after length filter+cap
  failed[nwin] coverage failure (nb < m)
  row_win[R]   window index of each row (rows sorted by window, pile order)
  row_d[R]     slot index (0 = A substring)
  row_start[R] start offset into `pool`
  row_len[R]
  pool         uint8 flat base pool (A + decoded B' sequences concatenated)

Batches are then materialized with one ragged gather (no per-row copies).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

from daccord_tpu.align.editdp import batch_bpos_at
from daccord_tpu.formats.las import Overlap, trace_block_bounds
from daccord_tpu.native.build import get_lib
from daccord_tpu.pipeline.windows import ReadCache, RealignedOverlap
from daccord_tpu.utils.config import DaccordConfig

# probe the native library once at import time, not inside the first batch
# pack (on a host without g++ the failed-build subprocess attempt would
# otherwise land in the dispatch hot path)
_LIB = get_lib()


@dataclasses.dataclass
class ReadRows:
    nwin: int
    nstr: np.ndarray       # int32 [nwin]
    failed: np.ndarray     # bool  [nwin]
    row_win: np.ndarray    # int32 [R]
    row_d: np.ndarray      # int32 [R]
    row_start: np.ndarray  # int64 [R]
    row_len: np.ndarray    # int32 [R]
    pool: np.ndarray       # uint8 flat
    row_ptr: np.ndarray    # int64 [nwin+1] CSR over rows (sorted by window)
    # shared-memory transport handle: declared (and therefore torn down)
    # AFTER the array views into it, so SharedMemory.__del__ never sees
    # exported buffers (rows_from_shm)
    _shm: object = None

    def window_strings(self, wi: int) -> List[np.ndarray]:
        """Reconstruct one window's pile strings (k2 fallback, tests).

        Copies: the strings outlive the row pool (k2 retry queue), and a
        view would pin the whole pool — or a whole shared-memory segment —
        until the queue drains."""
        out = []
        for r in range(int(self.row_ptr[wi]), int(self.row_ptr[wi + 1])):
            s = self.pool[self.row_start[r]:self.row_start[r] + self.row_len[r]]
            out.append(np.array(s, dtype=np.uint8))
        return out


def _ragged_arange(counts: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(rep_index, within_index) for ragged iteration over counts."""
    total = int(counts.sum())
    reps = np.repeat(np.arange(len(counts)), counts)
    starts = np.cumsum(counts) - counts
    within = np.arange(total) - np.repeat(starts, counts)
    return reps, within


def extract_rows(A: np.ndarray, realigned: Sequence[RealignedOverlap],
                 cfg: DaccordConfig) -> ReadRows:
    """Vectorized equivalent of windows.extract_windows (same pinned rules)."""
    w, a = cfg.w, cfg.a
    lmin = w - 2 * cfg.path_delta
    lmax = cfg.wprime
    nwin = cfg.windows_for_length(len(A))

    # pool: A first, then each overlap's B'
    seqs = [A] + [ro.bseq for ro in realigned]
    lens = np.array([len(s) for s in seqs], dtype=np.int64)
    offs = np.concatenate([[0], np.cumsum(lens)])
    pool = np.concatenate(seqs) if seqs else np.zeros(0, np.uint8)

    if nwin == 0:
        z = np.zeros(0, dtype=np.int64)
        return ReadRows(0, z.astype(np.int32), z.astype(bool),
                        z.astype(np.int32), z.astype(np.int32), z,
                        z.astype(np.int32), pool, np.zeros(1, np.int64))

    # B rows: per overlap, covered windows + mapped substring ranges
    wins_l, start_l, len_l, order_l = [], [], [], []
    for oi, ro in enumerate(realigned):
        o = ro.ovl
        i_lo = -(-o.abpos // a)                 # ceil
        i_hi = min((o.aepos - w) // a, nwin - 1)
        if i_hi < i_lo:
            continue
        ws = np.arange(i_lo, i_hi + 1, dtype=np.int64) * a
        b0 = ro.bmap[ws - o.abpos]
        b1 = ro.bmap[ws + w - o.abpos]
        blen = b1 - b0
        keep = (blen >= lmin) & (blen <= lmax)
        if not keep.any():
            continue
        wins_l.append((ws[keep] // a).astype(np.int64))
        start_l.append(b0[keep] + offs[1 + oi])
        len_l.append(blen[keep])
        order_l.append(np.full(keep.sum(), oi, dtype=np.int64))

    if wins_l:
        bw = np.concatenate(wins_l)
        bstart = np.concatenate(start_l)
        blen = np.concatenate(len_l)
        border = np.concatenate(order_l)
        # sort by (window, pile order); generation is overlap-major so a
        # stable sort on window yields pile order within each window
        srt = np.argsort(bw, kind="stable")
        bw, bstart, blen, border = bw[srt], bstart[srt], blen[srt], border[srt]
        # per-window B-string count and cap at cfg.d (keep the FIRST d)
        counts = np.bincount(bw, minlength=nwin)
        within = np.arange(len(bw)) - np.repeat(np.cumsum(counts) - counts,
                                                counts)
        keep = within < cfg.d
        bw, bstart, blen = bw[keep], bstart[keep], blen[keep]
        within = within[keep]
        nb = np.bincount(bw, minlength=nwin)
    else:
        bw = np.zeros(0, dtype=np.int64)
        bstart = np.zeros(0, dtype=np.int64)
        blen = np.zeros(0, dtype=np.int64)
        within = np.zeros(0, dtype=np.int64)
        nb = np.zeros(nwin, dtype=np.int64)

    failed = nb < cfg.m
    nstr = (nb + 1).astype(np.int32)

    # interleave the A row (d=0) before each window's B rows
    R = nwin + len(bw)
    row_win = np.empty(R, dtype=np.int32)
    row_d = np.empty(R, dtype=np.int32)
    row_start = np.empty(R, dtype=np.int64)
    row_len = np.empty(R, dtype=np.int32)
    # positions: window wi's rows start at ptr[wi] = wi + cum_nb[wi]
    cum_nb = np.concatenate([[0], np.cumsum(nb)])
    a_pos = np.arange(nwin) + cum_nb[:-1]
    row_win[a_pos] = np.arange(nwin, dtype=np.int32)
    row_d[a_pos] = 0
    row_start[a_pos] = np.arange(nwin, dtype=np.int64) * a
    row_len[a_pos] = w
    if len(bw):
        b_pos = (bw + 1) + cum_nb[bw] + within
        row_win[b_pos] = bw.astype(np.int32)
        row_d[b_pos] = (within + 1).astype(np.int32)
        row_start[b_pos] = bstart
        row_len[b_pos] = blen.astype(np.int32)
    row_ptr = np.concatenate([[0], np.cumsum(nstr)]).astype(np.int64)
    return ReadRows(nwin=nwin, nstr=nstr, failed=np.asarray(failed),
                    row_win=row_win, row_d=row_d, row_start=row_start,
                    row_len=row_len, pool=pool, row_ptr=row_ptr)


_SHM_FIELDS = ("nstr", "failed", "row_win", "row_d", "row_start",
               "row_len", "pool", "row_ptr")


def rows_to_shm(rr: ReadRows):
    """Pack a ReadRows into one POSIX shared-memory segment (worker side).

    Only the segment name + array header crosses the executor result pipe
    (VERDICT r3 item 8: the arrays are already flat numpy — ship them
    through /dev/shm instead of pickling ~100KB/read).  The creating
    worker unregisters the segment from its resource_tracker: ownership
    (attach + unlink) transfers to the parent, and the tracker would
    otherwise warn about — or double-unlink — a segment the parent freed.
    """
    from multiprocessing import resource_tracker, shared_memory
    arrs = [np.ascontiguousarray(getattr(rr, f)) for f in _SHM_FIELDS]
    sizes = [a.nbytes for a in arrs]
    total = max(sum(sizes), 1)
    shm = shared_memory.SharedMemory(create=True, size=total)
    try:
        resource_tracker.unregister(shm._name, "shared_memory")
    except Exception:
        pass
    off = 0
    header = []
    for a, f in zip(arrs, _SHM_FIELDS):
        shm.buf[off:off + a.nbytes] = a.tobytes()
        header.append((f, str(a.dtype), a.shape, off))
        off += a.nbytes
    shm.close()
    return {"name": shm.name, "nwin": rr.nwin, "header": header}


def rows_from_shm(meta) -> ReadRows:
    """Reconstruct a ReadRows as zero-copy views into the segment (parent
    side).  The segment is unlinked immediately (the mapping stays valid
    while any view lives); the memory unmaps when the last view dies —
    i.e. when the runner drops the read's row pool."""
    from multiprocessing import shared_memory
    shm = shared_memory.SharedMemory(name=meta["name"])
    try:
        shm.unlink()
    except FileNotFoundError:
        pass
    fields = {}
    for f, dt, shape, off in meta["header"]:
        fields[f] = np.frombuffer(
            shm.buf, dtype=dt, count=int(np.prod(shape, dtype=np.int64)),
            offset=off).reshape(shape)
    return ReadRows(nwin=meta["nwin"], **fields, _shm=shm)


class RowPool:
    """Global concatenation of per-read pools (built once per run)."""

    def __init__(self, reads: Sequence[ReadRows]):
        lens = np.array([len(r.pool) for r in reads], dtype=np.int64)
        self.offs = np.concatenate([[0], np.cumsum(lens)])
        self.gpool = (np.concatenate([r.pool for r in reads])
                      if len(reads) else np.zeros(0, np.uint8))


def pack_rows_batch(reads: Sequence[ReadRows], pool: Optional[RowPool],
                    window_refs: Sequence[Tuple[int, int]],
                    cfg: DaccordConfig, batch: int, d1: int
                    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Materialize (S, slen, nstr) for the windows (read_idx, win_idx) listed.

    Ragged gathers, no per-row Python copies.  pool=None gathers from each
    read's own pool (one gather per distinct read in the chunk — the
    streaming runner dispatches batches before all reads exist, so there is
    no global pool); a RowPool does one gather over the whole chunk.
    """
    Wp = cfg.wprime
    S = np.full((batch, d1, Wp), 4, dtype=np.uint8)
    slen = np.zeros((batch, d1), dtype=np.int32)
    nstr = np.zeros((batch,), dtype=np.int32)
    flatS = S.reshape(-1)

    per_read: dict = {}
    src_l, dst_l, len_l = [], [], []
    for b, (ri, wi) in enumerate(window_refs):
        rr = reads[ri]
        r0, r1 = int(rr.row_ptr[wi]), int(rr.row_ptr[wi + 1])
        n = r1 - r0
        nstr[b] = n
        slen[b, :n] = rr.row_len[r0:r1]
        dst = b * d1 + np.arange(n, dtype=np.int64)
        if pool is None:
            s, d, ln = per_read.setdefault(ri, ([], [], []))
            s.append(rr.row_start[r0:r1])
            d.append(dst)
            ln.append(rr.row_len[r0:r1].astype(np.int64))
        else:
            src_l.append(pool.offs[ri] + rr.row_start[r0:r1])
            dst_l.append(dst)
            len_l.append(rr.row_len[r0:r1].astype(np.int64))

    # native row gather (one memcpy per row) when librealign is present;
    # numpy ragged fancy-index fallback otherwise.  Byte-identical (tests);
    # the numpy path builds ~2 full int64 index arrays over every gathered
    # element — measured ~10x the native cost at 60x-coverage batches.
    lib = _LIB
    nrows_total = batch * d1

    def _gather(src_parts, dst_parts, len_parts, gpool):
        src_starts = np.ascontiguousarray(np.concatenate(src_parts))
        dst_rows = np.ascontiguousarray(np.concatenate(dst_parts))
        lens32 = np.ascontiguousarray(
            np.concatenate(len_parts).astype(np.int32))
        # the C loop memcpys without bounds checks (the numpy fallback would
        # raise IndexError at the buffer end); validate the invariants the
        # row builder is supposed to guarantee before handing it raw pointers
        assert lens32.max(initial=0) <= Wp, "row longer than W'"
        assert dst_rows.max(initial=-1) < nrows_total, "dst row out of batch"
        if lib is not None:
            gpool = np.ascontiguousarray(gpool)
            lib.ragged_gather_rows(
                flatS.ctypes.data, gpool.ctypes.data, dst_rows.ctypes.data,
                src_starts.ctypes.data, lens32.ctypes.data,
                len(lens32), Wp)
            return
        reps, within = _ragged_arange(lens32.astype(np.int64))
        flatS[dst_rows[reps] * Wp + within] = gpool[src_starts[reps] + within]

    if pool is None:
        for ri, (s, d, ln) in per_read.items():
            _gather(s, d, ln, reads[ri].pool)
    elif src_l:
        _gather(src_l, dst_l, len_l, pool.gpool)
    return S, slen, nstr
