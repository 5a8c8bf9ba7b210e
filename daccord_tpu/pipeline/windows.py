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
from daccord_tpu.formats.las import Overlap, trace_block_bounds
from daccord_tpu.utils.config import DaccordConfig


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

    Abuf, la, Bbuf, lb, owners = pile_block_batch(A, pile, cache, tspace)
    N = len(owners)
    realigned: List[RealignedOverlap] = []
    for oi, o in enumerate(pile):
        bmap = np.zeros(o.aepos - o.abpos + 1, dtype=np.int64)
        realigned.append(RealignedOverlap(
            ovl=o, bseq=cache.get(o.bread, o.is_comp), bmap=bmap))

    if want_ops:
        # traceback path: needed only for error-profile op counts (eprof)
        _, bpos, ops = batch_realign(Abuf, la, Bbuf, lb, want_ops=True)
        for n, (oi, a0, b0) in enumerate(owners):
            o = pile[oi]
            blk_len = int(la[n])
            seg = bpos[n, :blk_len + 1] + b0
            realigned[oi].bmap[a0 - o.abpos:a0 - o.abpos + blk_len + 1] = seg
        return realigned, ops

    # window-boundary lattice positions per block (global A coords)
    rems = sorted({0, w % a})
    pos_lists = []
    for n, (oi, a0, b0) in enumerate(owners):
        hi = a0 + int(la[n])
        ps = np.concatenate([_lattice(a0, hi, a, r) for r in rems])
        ps.sort()
        pos_lists.append(ps)
    PX = max((len(p) for p in pos_lists), default=1) or 1
    X = np.zeros((N, PX), dtype=np.int64)
    for n, ps in enumerate(pos_lists):
        a0 = owners[n][1]
        X[n, :len(ps)] = ps - a0          # local block coords
        X[n, len(ps):] = 0                # padded slots recompute x=0 (cheap)
    bp_at = batch_bpos_at(Abuf, la, Bbuf, lb, X)
    # write maps; later blocks overwrite shared boundaries (local x=0 -> b0,
    # the exact trace cumsum), preserving the chained-boundary convention
    for n, (oi, a0, b0) in enumerate(owners):
        o = pile[oi]
        ps = pos_lists[n]
        realigned[oi].bmap[ps - o.abpos] = bp_at[n, :len(ps)] + b0
    return realigned, None


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
