"""Host-side pile realignment and window extraction.

This is the shared front half of SURVEY §3.1's per-read ``handle(aread)``:

  pile load -> B decode (+RC for COMP) -> per-trace-block realignment ->
  chained A->B position maps -> per-window substring extraction.

It feeds both the NumPy oracle (daccord_tpu/oracle) and the device pipeline
(padded [D, W'] window stacks).  Realignment batches every trace block of a
pile into one vectorized DP call (the reference's HOT LOOP 1, SURVEY §3.1,
there ``libmaus2::lcs::NP`` per block).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np

from daccord_tpu.align.editdp import PAD, batch_bpos_at, batch_realign
from daccord_tpu.formats.dazzler_db import DazzlerDB
from daccord_tpu.formats.las import Overlap, n_trace_blocks, trace_block_bounds
from daccord_tpu.utils.config import DaccordConfig


def check_pile_traces(pile: List[Overlap], tspace: int) -> None:
    """Validate each record's trace-block count against its A range.

    A malformed .las whose tlen/2 disagrees with the blocks implied by
    (abpos, aepos, tspace) would otherwise surface as an opaque IndexError
    deep in the block loops; raise a descriptive error up front instead."""
    for o in pile:
        want = n_trace_blocks(o.abpos, o.aepos, tspace)
        if len(o.trace) != want:
            raise ValueError(
                f".las record aread={o.aread} bread={o.bread} "
                f"[{o.abpos},{o.aepos}) tspace={tspace}: trace has "
                f"{len(o.trace)} blocks, geometry implies {want}")


@dataclasses.dataclass
class RealignedOverlap:
    """An overlap with its chained base-exact A->B' position map."""

    ovl: Overlap
    bseq: np.ndarray  # decoded B' (RC'd iff COMP); shared, do not mutate
    bmap: np.ndarray  # int64 [aepos-abpos+1]; bmap[x-abpos] = B' pos for A pos x


class ReadCache:
    """Decoded-read cache (the ``DecodedReadContainer`` analog, SURVEY §2.1)."""

    def __init__(self, db: DazzlerDB):
        self.db = db
        self._fwd: Dict[int, np.ndarray] = {}
        self._rc: Dict[int, np.ndarray] = {}

    def get(self, i: int, comp: bool) -> np.ndarray:
        cache = self._rc if comp else self._fwd
        if i not in cache:
            cache[i] = self.db.read_rc_codes(i) if comp else self.db.read_codes(i)
        return cache[i]

    def clear(self) -> None:
        self._fwd.clear()
        self._rc.clear()


def _lattice(lo: int, hi: int, a: int, rem: int) -> np.ndarray:
    """Positions p in [lo, hi] with p % a == rem."""
    start = lo + ((rem - lo) % a)
    return np.arange(start, hi + 1, a, dtype=np.int64)


def pile_block_batch(A: np.ndarray, pile: List[Overlap], cache: ReadCache,
                     tspace: int):
    """Padded (Abuf, la, Bbuf, lb, owners) for every trace block of a pile.

    owners: (overlap idx, block A start, block B' start) per problem row.
    """
    a_segs, b_segs = [], []
    owners: List[Tuple[int, int, int]] = []
    for oi, o in enumerate(pile):
        bseq = cache.get(o.bread, o.is_comp)
        bounds = trace_block_bounds(o.abpos, o.aepos, tspace)
        bcur = o.bbpos
        for t in range(len(o.trace)):
            badv = int(o.trace[t, 1])
            a_segs.append(A[bounds[t]:bounds[t + 1]])
            b_segs.append(bseq[bcur:bcur + badv])
            owners.append((oi, int(bounds[t]), bcur))
            bcur += badv
    LA = max((len(s) for s in a_segs), default=1) or 1
    LB = max((len(s) for s in b_segs), default=1) or 1
    N = len(a_segs)
    Abuf = np.full((N, LA), PAD, dtype=np.uint8)
    Bbuf = np.full((N, LB), PAD, dtype=np.uint8)
    la = np.zeros(N, dtype=np.int64)
    lb = np.zeros(N, dtype=np.int64)
    for n, (sa, sb) in enumerate(zip(a_segs, b_segs)):
        Abuf[n, :len(sa)] = sa
        Bbuf[n, :len(sb)] = sb
        la[n] = len(sa)
        lb[n] = len(sb)
    return Abuf, la, Bbuf, lb, owners


def _pile_block_arrays(A: np.ndarray, pile: List[Overlap], cache: ReadCache,
                       tspace: int):
    """Vectorized block metadata + padded DP buffers for a whole pile.

    Returns (Abuf, la, Bbuf, lb, blk_owner, blk_a0, blk_b0) with all arrays
    built by ragged numpy ops (python loops only over the ~pile-size overlap
    list, never over blocks).
    """
    nov = len(pile)
    bseqs = [cache.get(o.bread, o.is_comp) for o in pile]
    nblk = np.array([len(o.trace) for o in pile], dtype=np.int64)
    # per-block A boundaries and B starts
    a0_l, a1_l, b0_l = [], [], []
    for o in pile:
        bounds = trace_block_bounds(o.abpos, o.aepos, tspace)
        a0_l.append(bounds[:-1])
        a1_l.append(bounds[1:])
        badv = o.trace[:, 1].astype(np.int64)
        b0_l.append(o.bbpos + np.concatenate([[0], np.cumsum(badv)[:-1]]))
    blk_a0 = np.concatenate(a0_l) if a0_l else np.zeros(0, np.int64)
    blk_a1 = np.concatenate(a1_l) if a1_l else np.zeros(0, np.int64)
    blk_b0 = np.concatenate(b0_l) if b0_l else np.zeros(0, np.int64)
    blk_d = (np.concatenate([o.trace[:, 0].astype(np.int64) for o in pile])
             if pile else np.zeros(0, np.int64))
    blk_owner = np.repeat(np.arange(nov), nblk)
    la = (blk_a1 - blk_a0).astype(np.int64)
    lb = np.concatenate([o.trace[:, 1].astype(np.int64) for o in pile]) \
        if pile else np.zeros(0, np.int64)
    N = len(blk_a0)
    LA = max(int(la.max()), 1) if N else 1
    LB = max(int(lb.max()), 1) if N else 1

    # ragged copies: A segments from A; B' segments from the bseq pool
    bseq_lens = np.array([len(s) for s in bseqs], dtype=np.int64)
    bseq_offs = np.concatenate([[0], np.cumsum(bseq_lens)])
    bpool = np.concatenate(bseqs) if bseqs else np.zeros(0, np.uint8)

    def ragged_fill(dst, starts, lens, srcpool):
        total = int(lens.sum())
        if not total:
            return
        reps = np.repeat(np.arange(len(lens)), lens)
        within = np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
        dst.reshape(-1)[reps * dst.shape[1] + within] = \
            srcpool[starts[reps] + within]

    Abuf = np.full((N, LA), PAD, dtype=np.uint8)
    Bbuf = np.full((N, LB), PAD, dtype=np.uint8)
    ragged_fill(Abuf, blk_a0, la, A)
    ragged_fill(Bbuf, bseq_offs[blk_owner] + blk_b0, lb, bpool)
    return Abuf, la, Bbuf, lb, blk_owner, blk_a0, blk_b0, blk_d


def realign_pile(A: np.ndarray, pile: List[Overlap], cache: ReadCache,
                 tspace: int, want_ops: bool = False,
                 w: int = 40, a: int = 10):
    """Realign every trace block of a pile in one batched DP.

    Returns (realigned: List[RealignedOverlap], ops or None).

    The A->B maps are evaluated only at window-boundary lattice positions
    (multiples of ``a`` and of ``a`` shifted by ``w % a``) — the only
    positions extract_windows reads.  With want_ops the full traceback runs
    instead (error-profile estimation needs op counts).
    """
    if not pile:
        return [], (np.zeros((0, 4), dtype=np.int64) if want_ops else None)
    check_pile_traces(pile, tspace)

    realigned: List[RealignedOverlap] = []
    for oi, o in enumerate(pile):
        bmap = np.zeros(o.aepos - o.abpos + 1, dtype=np.int64)
        realigned.append(RealignedOverlap(
            ovl=o, bseq=cache.get(o.bread, o.is_comp), bmap=bmap))

    if want_ops:
        # traceback path: needed only for error-profile op counts (eprof)
        Abuf, la, Bbuf, lb, owners = pile_block_batch(A, pile, cache, tspace)
        _, bpos, ops = batch_realign(Abuf, la, Bbuf, lb, want_ops=True)
        for n, (oi, a0, b0) in enumerate(owners):
            o = pile[oi]
            blk_len = int(la[n])
            seg = bpos[n, :blk_len + 1] + b0
            realigned[oi].bmap[a0 - o.abpos:a0 - o.abpos + blk_len + 1] = seg
        return realigned, ops

    prep = prepare_pile(A, pile, cache, tspace, w, a)
    if prep is None:
        return realigned, None
    bp_at = batch_bpos_at(prep["Abuf"], prep["la"], prep["Bbuf"], prep["lb"],
                          prep["X"], band=prep["band"])
    finish_pile(prep, pile, realigned, bp_at)
    return realigned, None


def prepare_pile(A: np.ndarray, pile: List[Overlap], cache: ReadCache,
                 tspace: int, w: int, a: int):
    """Non-DP half of realign_pile: padded block buffers + lattice X.

    Returns a dict consumed by finish_pile (plus the DP inputs), or None for
    piles with no blocks.  Split out so a caller can batch MANY piles' DPs
    into one device call (ops/realign_dp.py)."""
    check_pile_traces(pile, tspace)
    (Abuf, la, Bbuf, lb, blk_owner, blk_a0, blk_b0,
     blk_d) = _pile_block_arrays(A, pile, cache, tspace)
    N = len(blk_a0)
    if N == 0:
        return None

    # window-boundary lattice positions per block, fully vectorized:
    # for each remainder class r, positions p in [a0, a1] with p % a == r
    rems = sorted({0, w % a})
    hi = blk_a0 + la
    starts, counts = [], []
    for r in rems:
        st = blk_a0 + ((r - blk_a0) % a)
        cnt = np.maximum((hi - st) // a + 1, 0)
        cnt = np.where(st > hi, 0, cnt)
        starts.append(st)
        counts.append(cnt)
    cnt_tot = sum(counts)
    PX = max(int(cnt_tot.max()), 1)
    X = np.zeros((N, PX), dtype=np.int64)
    col_base = np.zeros(N, dtype=np.int64)
    for st, cnt in zip(starts, counts):
        total = int(cnt.sum())
        if total:
            reps = np.repeat(np.arange(N), cnt)
            within = np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt)
            X[reps, col_base[reps] + within] = \
                st[reps] + within * a - blk_a0[reps]   # local block coords
        col_base += cnt
    # padded slots recompute x=0 (cheap, ignored on write-back)
    # banded-DP half-width per block: the trace diff count d_j upper-bounds
    # the true edit distance (the producing aligner realized an alignment
    # with d_j differences), so band = d_j + slack is always exact; the C++
    # kernel additionally verifies and falls back per problem [PINNED: the
    # bpos rule is band-invariant]
    return {"Abuf": Abuf, "la": la, "Bbuf": Bbuf, "lb": lb, "X": X,
            "cnt_tot": cnt_tot, "blk_owner": blk_owner, "blk_a0": blk_a0,
            "blk_b0": blk_b0, "band": blk_d + 8}


def finish_pile(prep: dict, pile: List[Overlap],
                realigned: List[RealignedOverlap], bp_at: np.ndarray) -> None:
    """Write the A->B maps back (later blocks overwrite shared boundaries
    with local x=0 -> b0, the exact trace cumsum, preserving the
    chained-boundary convention)."""
    X = prep["X"]
    PX = X.shape[1]
    col = np.arange(PX, dtype=np.int64)[None, :]
    valid = col < prep["cnt_tot"][:, None]
    gpos = X + prep["blk_a0"][:, None]
    gval = bp_at + prep["blk_b0"][:, None]
    nblk_per = np.bincount(prep["blk_owner"], minlength=len(pile))
    bnd = np.concatenate([[0], np.cumsum(nblk_per)])
    for oi, o in enumerate(pile):
        sl = slice(int(bnd[oi]), int(bnd[oi + 1]))
        m = valid[sl]
        realigned[oi].bmap[gpos[sl][m] - o.abpos] = gval[sl][m]


def make_skeleton(pile: List[Overlap], cache: ReadCache
                  ) -> List[RealignedOverlap]:
    """Empty RealignedOverlap list (bmap zeros) for a pile."""
    return [RealignedOverlap(
        ovl=o, bseq=cache.get(o.bread, o.is_comp),
        bmap=np.zeros(o.aepos - o.abpos + 1, dtype=np.int64)) for o in pile]


@dataclasses.dataclass
class WindowPile:
    """Pile strings of one window (ALGORITHM §2)."""

    ws: int                       # window start on A
    strings: List[np.ndarray]     # S[0] = A substring, then B' substrings
    failed_coverage: bool


def extract_windows(A: np.ndarray, realigned: List[RealignedOverlap],
                    cfg: DaccordConfig) -> List[WindowPile]:
    """Per-window pile substrings with the pinned filtering of ALGORITHM §2."""
    w, a = cfg.w, cfg.a
    lmin = w - 2 * cfg.path_delta
    lmax = cfg.wprime
    nwin = cfg.windows_for_length(len(A))
    out: List[WindowPile] = []
    for i in range(nwin):
        ws = i * a
        we = ws + w
        strings: List[np.ndarray] = [A[ws:we].copy()]
        nb = 0
        for ro in realigned:
            o = ro.ovl
            if not (o.abpos <= ws and we <= o.aepos):
                continue
            b0 = int(ro.bmap[ws - o.abpos])
            b1 = int(ro.bmap[we - o.abpos])
            blen = b1 - b0
            if blen < lmin or blen > lmax:
                continue  # realignment anomaly (pinned drop rule, ALGORITHM §2)
            strings.append(ro.bseq[b0:b1])
            nb += 1
            if nb >= cfg.d:
                break
        out.append(WindowPile(ws=ws, strings=strings, failed_coverage=nb < cfg.m))
    return out
