"""Pinned unit-cost edit-distance DP — the ``libmaus2::lcs::NP`` analog.

Reference: libmaus2 ``src/libmaus2/lcs/NP.hpp`` (O(nd) diagonal aligner with
traceback; SURVEY §2.2).  We pin plain unit-cost Levenshtein with the
tie-broken traceback of ALGORITHM.md §1 (preference D > U > L); the reference's
O(nd) algorithm computes the same distance, and traceback ties are pinned by
*this* implementation (SURVEY §7.3 item 1: equality is defined against the
in-repo oracle).

Everything here is integer NumPy; the batched forms are the host-side
vectorized replacements for the reference's per-block C++ loops and serve as
the CPU oracle for the Pallas device kernels (tests/test_editdp.py).

Sequences are uint8 base codes 0..3; PAD=4 never matches anything (including
itself), so padded tails cannot create spurious matches.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

PAD = 4
BP_DIAG, BP_UP, BP_LEFT = 0, 1, 2


def edit_table(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Full (la+1, lb+1) DP table. Plain-loop reference semantics."""
    la, lb = len(a), len(b)
    D = np.zeros((la + 1, lb + 1), dtype=np.int32)
    D[0, :] = np.arange(lb + 1)
    D[:, 0] = np.arange(la + 1)
    for i in range(1, la + 1):
        sub = (a[i - 1] != b).astype(np.int32)  # [lb]
        row = D[i]
        prev = D[i - 1]
        tmp = np.minimum(prev[:-1] + sub, prev[1:] + 1)
        # left-dependency as running min: row[j] = min(row[j-1]+1, tmp[j-1-based])
        acc = np.minimum.accumulate(
            np.concatenate([[np.int32(i)], tmp]) - np.arange(lb + 1, dtype=np.int32))
        row[:] = acc + np.arange(lb + 1, dtype=np.int32)
    return D


def edit_distance(a: np.ndarray, b: np.ndarray) -> int:
    return int(edit_table(a, b)[len(a), len(b)])


def traceback_bpos(a: np.ndarray, b: np.ndarray) -> Tuple[int, np.ndarray]:
    """(distance, bpos[la+1]) with bpos[x] = min{ j : (x, j) on pinned path }."""
    D = edit_table(a, b)
    la, lb = len(a), len(b)
    i, j = la, lb
    bpos = np.zeros(la + 1, dtype=np.int64)
    bpos[la] = lb
    while i > 0 or j > 0:
        if i > 0 and j > 0 and D[i, j] == D[i - 1, j - 1] + (a[i - 1] != b[j - 1]):
            i, j = i - 1, j - 1
        elif i > 0 and D[i, j] == D[i - 1, j] + 1:
            i, j = i - 1, j
        else:
            j -= 1
        bpos[i] = j
    return int(D[la, lb]), bpos


# ---------------------------------------------------------------------------
# Batched distance (no traceback): scoring candidates vs pile strings
# ---------------------------------------------------------------------------

def batch_edit_distance(A: np.ndarray, la: np.ndarray,
                        B: np.ndarray, lb: np.ndarray) -> np.ndarray:
    """Edit distance for N padded pairs.

    A: uint8 [N, LA] (PAD beyond la), la: int [N]; likewise B/lb.
    Returns int32 [N].  Matches ``edit_distance`` on the unpadded prefixes:
    rows beyond la only ever add +1/step and the result is read at (la, lb).
    """
    A = np.asarray(A, dtype=np.uint8)
    B = np.asarray(B, dtype=np.uint8)
    N, LA = A.shape
    LB = B.shape[1]
    jr = np.arange(LB + 1, dtype=np.int32)
    prev = np.broadcast_to(jr, (N, LB + 1)).copy()
    out = np.where(la == 0, lb.astype(np.int32), 0).astype(np.int32)
    for i in range(1, LA + 1):
        sub = (A[:, i - 1:i] != B).astype(np.int32)        # [N, LB]
        tmp = np.minimum(prev[:, :-1] + sub, prev[:, 1:] + 1)
        head = np.full((N, 1), i, dtype=np.int32)
        acc = np.minimum.accumulate(np.concatenate([head, tmp], axis=1) - jr, axis=1)
        prev = acc + jr
        hit = la == i
        if hit.any():
            out[hit] = prev[hit, lb[hit]]
    return out


# ---------------------------------------------------------------------------
# Batched A->B position maps WITHOUT traceback (HOT LOOP 1, vectorized form)
# ---------------------------------------------------------------------------

def _fill_tables(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Full DP tables D [N, LA+1, LB+1] for padded batches (PAD-safe)."""
    N, LA = A.shape
    LB = B.shape[1]
    jr = np.arange(LB + 1, dtype=np.int32)
    D = np.empty((N, LA + 1, LB + 1), dtype=np.int32)
    D[:, 0, :] = jr
    for i in range(1, LA + 1):
        prev = D[:, i - 1, :]
        sub = (A[:, i - 1:i] != B).astype(np.int32)
        tmp = np.minimum(prev[:, :-1] + sub, prev[:, 1:] + 1)
        head = np.full((N, 1), i, dtype=np.int32)
        acc = np.minimum.accumulate(
            np.concatenate([head, tmp], axis=1) - jr, axis=1)
        D[:, i, :] = acc + jr
    return D


def _reverse_pad(X: np.ndarray, lx: np.ndarray) -> np.ndarray:
    """Reverse each row's first lx chars; PAD beyond (vectorized)."""
    N, L = X.shape
    idx = lx[:, None] - 1 - np.arange(L)[None, :]
    out = np.where(idx >= 0, X[np.arange(N)[:, None], np.maximum(idx, 0)], PAD)
    return out.astype(np.uint8)


def batch_bpos_at(A: np.ndarray, la: np.ndarray, B: np.ndarray,
                  lb: np.ndarray, X: np.ndarray,
                  nthreads: int = 0, band=None) -> np.ndarray:
    """bpos (ALGORITHM §1 rule) evaluated only at positions X [N, PX].

    Same pinned rule as batch_bpos, but the argmin runs only on the requested
    rows (window-boundary lattice positions) — ~10x less work than the full
    map when only multiples of the window advance are needed.
    X values must be in [0, la[n]]; output [N, PX] int64.

    band: optional int64 [N] diagonal half-width per problem (the libmaus2
    lcs/NP O(n*d) shape, SURVEY §2.2): the C++ kernel fills only |j-i| <=
    band[n] and falls back to the full DP per problem when the band
    saturates, so results are bit-identical for ANY band values; callers
    pass the trace-block diff count d_j (an upper bound on the distance)
    plus slack.  Ignored by the NumPy fallback (same results).

    Uses the native C++ kernel (daccord_tpu/native/realign.cpp) when it
    builds; NumPy fallback otherwise (identical results, tested).
    """
    from daccord_tpu.native.build import get_lib
    lib = get_lib()
    if lib is not None:
        import ctypes
        import os as _os
        A = np.ascontiguousarray(A, dtype=np.uint8)
        B = np.ascontiguousarray(B, dtype=np.uint8)
        la64 = np.ascontiguousarray(la, dtype=np.int64)
        lb64 = np.ascontiguousarray(lb, dtype=np.int64)
        X64 = np.ascontiguousarray(X, dtype=np.int64)
        N, LA = A.shape
        LB = B.shape[1]
        PX = X64.shape[1]
        out = np.zeros((N, PX), dtype=np.int64)
        nt = nthreads or int(_os.environ.get(
            "DACCORD_NATIVE_THREADS", 0)) or min(4, _os.cpu_count() or 1)
        if band is not None:
            band64 = np.ascontiguousarray(band, dtype=np.int64)
            band_ptr = band64.ctypes.data_as(ctypes.c_void_p)
        else:
            band_ptr = None
        lib.bpos_at_batch(
            A.ctypes.data_as(ctypes.c_void_p),
            la64.ctypes.data_as(ctypes.c_void_p),
            B.ctypes.data_as(ctypes.c_void_p),
            lb64.ctypes.data_as(ctypes.c_void_p),
            X64.ctypes.data_as(ctypes.c_void_p),
            np.int64(PX), np.int64(N), np.int64(LA), np.int64(LB),
            out.ctypes.data_as(ctypes.c_void_p), np.int64(nt), band_ptr)
        return out
    return _batch_bpos_at_numpy(A, la, B, lb, X)


def _batch_bpos_at_numpy(A: np.ndarray, la: np.ndarray, B: np.ndarray,
                         lb: np.ndarray, X: np.ndarray) -> np.ndarray:
    """Pure-NumPy reference for batch_bpos_at (and its fallback)."""
    A = np.asarray(A, dtype=np.uint8)
    B = np.asarray(B, dtype=np.uint8)
    la = np.asarray(la, dtype=np.int64)
    lb = np.asarray(lb, dtype=np.int64)
    N, LA = A.shape
    LB = B.shape[1]
    n_idx = np.arange(N)
    Df = _fill_tables(A, B)
    Dr = _fill_tables(_reverse_pad(A, la), _reverse_pad(B, lb))
    jj = np.arange(LB + 1, dtype=np.int64)[None, :]
    cols = lb[:, None] - jj
    colsc = np.clip(cols, 0, LB)
    BIGV = np.int32(2 ** 30)
    out = np.zeros(X.shape, dtype=np.int64)
    for p in range(X.shape[1]):
        x = np.clip(X[:, p], 0, la)
        rf = Df[n_idx, x, :]
        rb = Dr[n_idx, np.clip(la - x, 0, LA), :]
        db = np.take_along_axis(rb, colsc, axis=1)
        tot = np.where(cols >= 0, rf + db, BIGV)
        out[:, p] = np.argmin(tot, axis=1)
    return out


def batch_bpos(A: np.ndarray, la: np.ndarray, B: np.ndarray, lb: np.ndarray
               ) -> Tuple[np.ndarray, np.ndarray]:
    """(dist [N], bpos [N, LA+1]) — the pinned A->B map of ALGORITHM §1.

    bpos[n, x] = smallest j minimizing Dfwd(x, j) + Dbwd(x, j), i.e. the
    leftmost column at row x that lies on ANY optimal alignment path.  This
    traceback-free formulation is exactly parallel (two DP fills + an argmin)
    — the TPU-native redesign of the reference's per-block ``NP`` traceback
    loop (SURVEY §3.1 HOT LOOP 1; see ALGORITHM §1 for the pinned rule).
    Values beyond x > la[n] are undefined.
    """
    A = np.asarray(A, dtype=np.uint8)
    B = np.asarray(B, dtype=np.uint8)
    la = np.asarray(la, dtype=np.int64)
    lb = np.asarray(lb, dtype=np.int64)
    N, LA = A.shape
    LB = B.shape[1]
    n_idx = np.arange(N)
    Df = _fill_tables(A, B)
    Dr = _fill_tables(_reverse_pad(A, la), _reverse_pad(B, lb))
    xx = np.arange(LA + 1, dtype=np.int64)[None, :, None]
    jj = np.arange(LB + 1, dtype=np.int64)[None, None, :]
    xi = np.clip(la[:, None, None] - xx, 0, LA)
    ji = np.clip(lb[:, None, None] - jj, 0, LB)
    tot = Df + Dr[n_idx[:, None, None], xi, ji]
    BIGV = np.int32(2 ** 30)
    tot = np.where(jj <= lb[:, None, None], tot, BIGV)
    bpos = np.argmin(tot, axis=2).astype(np.int64)   # first-min = smallest j
    dist = Df[n_idx, la, lb].astype(np.int32)
    return dist, bpos


def batch_ops_count(A: np.ndarray, la: np.ndarray, B: np.ndarray,
                    lb: np.ndarray, nthreads: int = 0) -> np.ndarray:
    """Summed pinned-traceback op counts [4] = (match, mismatch, U, L).

    Native C++ kernel when available; numpy fallback sums batch_realign's
    per-problem counts (identical pinned preference D > U > L; tested)."""
    from daccord_tpu.native.build import get_lib
    lib = get_lib()
    if lib is not None:
        import ctypes
        import os as _os
        A = np.ascontiguousarray(A, dtype=np.uint8)
        B = np.ascontiguousarray(B, dtype=np.uint8)
        la64 = np.ascontiguousarray(la, dtype=np.int64)
        lb64 = np.ascontiguousarray(lb, dtype=np.int64)
        N, LA = A.shape
        LB = B.shape[1]
        out = np.zeros(4, dtype=np.int64)
        nt = nthreads or int(_os.environ.get(
            "DACCORD_NATIVE_THREADS", 0)) or min(4, _os.cpu_count() or 1)
        lib.ops_count_batch(
            A.ctypes.data_as(ctypes.c_void_p),
            la64.ctypes.data_as(ctypes.c_void_p),
            B.ctypes.data_as(ctypes.c_void_p),
            lb64.ctypes.data_as(ctypes.c_void_p),
            np.int64(N), np.int64(LA), np.int64(LB),
            out.ctypes.data_as(ctypes.c_void_p), np.int64(nt))
        return out
    _, _, ops = batch_realign(A, la, B, lb, want_ops=True)
    return ops.sum(axis=0)


def batch_ops_count_rows(A: np.ndarray, la: np.ndarray, B: np.ndarray,
                         lb: np.ndarray, nthreads: int = 0) -> np.ndarray:
    """Per-problem pinned-traceback op counts [N, 4] (match, mismatch, U, L).

    Native C++ kernel (realign.cpp ops_count_rows) when available; numpy
    fallback = batch_realign's per-problem counts (identical pinned
    preference D > U > L).  Feeds the positional error profile (ALGORITHM
    §7 v2: rows binned by read position by the caller)."""
    from daccord_tpu.native.build import get_lib
    lib = get_lib()
    if lib is not None:
        import ctypes
        import os as _os
        A = np.ascontiguousarray(A, dtype=np.uint8)
        B = np.ascontiguousarray(B, dtype=np.uint8)
        la64 = np.ascontiguousarray(la, dtype=np.int64)
        lb64 = np.ascontiguousarray(lb, dtype=np.int64)
        N, LA = A.shape
        LB = B.shape[1]
        out = np.zeros((N, 4), dtype=np.int64)
        nt = nthreads or int(_os.environ.get(
            "DACCORD_NATIVE_THREADS", 0)) or min(4, _os.cpu_count() or 1)
        lib.ops_count_rows(
            A.ctypes.data_as(ctypes.c_void_p),
            la64.ctypes.data_as(ctypes.c_void_p),
            B.ctypes.data_as(ctypes.c_void_p),
            lb64.ctypes.data_as(ctypes.c_void_p),
            np.int64(N), np.int64(LA), np.int64(LB),
            out.ctypes.data_as(ctypes.c_void_p), np.int64(nt))
        return out
    _, _, ops = batch_realign(A, la, B, lb, want_ops=True)
    return ops


# ---------------------------------------------------------------------------
# Batched alignment with traceback (used for error-profile op counts)
# ---------------------------------------------------------------------------

def batch_realign(A: np.ndarray, la: np.ndarray, B: np.ndarray, lb: np.ndarray,
                  want_ops: bool = False):
    """Batched DP + pinned traceback for N padded problems.

    Returns (dist[N] int32, bpos[N, LA+1] int64, ops) where bpos[n, x] is the
    pinned A->B position map of ALGORITHM.md §1 for x <= la[n] (undefined
    beyond), and ops (if want_ops) is int64 [N, 4] counts of
    (match, mismatch, A-only 'U', B-only 'L') traceback steps.

    This is the host-side replacement for the reference's per-trace-block
    ``libmaus2::lcs::NP`` realignment loop (SURVEY §3.1 HOT LOOP 1): one call
    realigns every trace block of a pile at once.
    """
    A = np.asarray(A, dtype=np.uint8)
    B = np.asarray(B, dtype=np.uint8)
    la = np.asarray(la, dtype=np.int64)
    lb = np.asarray(lb, dtype=np.int64)
    N, LA = A.shape
    LB = B.shape[1]
    jr = np.arange(LB + 1, dtype=np.int32)
    D = np.empty((N, LA + 1, LB + 1), dtype=np.int32)
    D[:, 0, :] = jr
    for i in range(1, LA + 1):
        prev = D[:, i - 1, :]
        sub = (A[:, i - 1:i] != B).astype(np.int32)
        tmp = np.minimum(prev[:, :-1] + sub, prev[:, 1:] + 1)
        head = np.full((N, 1), i, dtype=np.int32)
        acc = np.minimum.accumulate(np.concatenate([head, tmp], axis=1) - jr, axis=1)
        D[:, i, :] = acc + jr

    n_idx = np.arange(N)
    dist = D[n_idx, la, lb].astype(np.int32)

    # vectorized traceback: all N paths walk together
    i = la.copy()
    j = lb.copy()
    bpos = np.zeros((N, LA + 1), dtype=np.int64)
    bpos[n_idx, la] = lb
    ops = np.zeros((N, 4), dtype=np.int64)
    max_steps = LA + LB
    for _ in range(max_steps):
        active = (i > 0) | (j > 0)
        if not active.any():
            break
        ii = np.maximum(i, 1)
        jj = np.maximum(j, 1)
        ach = A[n_idx, ii - 1]
        bch = B[n_idx, jj - 1]
        subc = (ach != bch).astype(np.int32)
        cur = D[n_idx, i, j]
        can_diag = (i > 0) & (j > 0) & (cur == D[n_idx, ii - 1, jj - 1] + subc)
        can_up = (i > 0) & (cur == D[n_idx, ii - 1, j] + 1)
        step_diag = active & can_diag
        step_up = active & ~can_diag & can_up
        step_left = active & ~can_diag & ~can_up
        if want_ops:
            ops[:, 0] += step_diag & (subc == 0)
            ops[:, 1] += step_diag & (subc == 1)
            ops[:, 2] += step_up
            ops[:, 3] += step_left
        i = i - (step_diag | step_up)
        j = j - (step_diag | step_left)
        upd = active
        bpos[n_idx[upd], i[upd]] = j[upd]
    return dist, bpos, (ops if want_ops else None)
