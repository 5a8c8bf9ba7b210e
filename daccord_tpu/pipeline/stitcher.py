"""Batched cross-read window stitching (ALGORITHM §5, vectorized).

The oracle's ``stitch`` (oracle/consensus.py) splices one read's window
consensi sequentially; each merge is a small edit-DP.  Merges are sequential
*within* a fragment run but independent *across* runs, so this module walks
all runs of all reads in lockstep rounds, batching every round's merge DPs
into one vectorized NumPy pass — same pinned rules, identical output
(tests/test_stitcher.py asserts equality with the oracle's stitch).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from daccord_tpu.align.editdp import PAD
from daccord_tpu.utils.config import DaccordConfig

BIG = np.int32(2 ** 30)


def _batched_merge_jstar(P: np.ndarray, Q: np.ndarray, lq: np.ndarray,
                         lp: int) -> np.ndarray:
    """For N merge problems: first-min argmin_j D[lp][j] of edit DP(P, Q).

    P: uint8 [N, lp] (full rows; lp constant), Q: uint8 [N, LQ] PAD beyond lq.
    Equivalent to np.argmin(edit_table(P, Q)[lp]) per problem.
    """
    N, LQ = Q.shape
    jr = np.arange(LQ + 1, dtype=np.int32)
    row = np.broadcast_to(jr, (N, LQ + 1)).copy()
    for i in range(1, lp + 1):
        sub = (P[:, i - 1:i] != Q).astype(np.int32)
        tmp = np.minimum(row[:, :-1] + sub, row[:, 1:] + 1)
        head = np.full((N, 1), i, dtype=np.int32)
        acc = np.minimum.accumulate(np.concatenate([head, tmp], axis=1) - jr,
                                    axis=1)
        row = acc + jr
    row = np.where(jr[None, :] <= lq[:, None], row, BIG)
    return np.argmin(row, axis=1)


def stitch_many(winners_per_read: List[List[Optional[np.ndarray]]],
                cfg: DaccordConfig, native: Optional[bool] = None,
                nthreads: Optional[int] = None
                ) -> List[List[Tuple[int, int, np.ndarray]]]:
    """Batched equivalent of [stitch(w, cfg) for w in winners_per_read].

    native: use the C++ run-walker for the merge DPs (default: when the
    native lib is available).  The numpy lockstep below is the pinned
    reference; both are bit-identical (tests/test_stitcher.py).
    nthreads: C++ worker threads (default: DACCORD_NATIVE_THREADS or
    min(4, cores)); the streaming collector passes 1 for per-read calls."""
    w, a = cfg.w, cfg.a
    lp = (w - a) + cfg.path_delta
    lq_max = w + cfg.path_delta

    # runs: (read, i_start, j_end, parts, tail)
    runs = []
    for r, winners in enumerate(winners_per_read):
        i = 0
        n = len(winners)
        while i < n:
            if winners[i] is None:
                i += 1
                continue
            j = i
            while j + 1 < n and winners[j + 1] is not None:
                j += 1
            first = winners[i]
            runs.append({"read": r, "i": i, "j": j,
                         "parts": [first], "tail": first[-lp:]
                         if len(first) >= lp else first.copy()})
            i = j + 1

    lib = None
    if native is not False:
        from daccord_tpu.native.build import get_lib
        lib = get_lib()
    if lib is not None and runs:
        # ---- native path: all merges of all runs in ONE C++ call ----
        # (the numpy lockstep costs ~0.7s of pure small-array overhead at
        # 30k windows; the C++ walker is ~20ms).  Only the jstar positions
        # and tail evolution move to C++; splicing stays here, identical.
        import os as _os
        windows: List[np.ndarray] = []
        run_off = np.zeros(len(runs) + 1, dtype=np.int64)
        for ri, run in enumerate(runs):
            ws = winners_per_read[run["read"]][run["i"]:run["j"] + 1]
            windows.extend(ws)
            run_off[ri + 1] = len(windows)
        nw = len(windows)
        LQ = max(lq_max, max(len(q) for q in windows))
        Q = np.full((nw, LQ), PAD, dtype=np.uint8)
        qlen = np.zeros(nw, dtype=np.int64)
        for idx, q in enumerate(windows):
            Q[idx, :len(q)] = q
            qlen[idx] = len(q)
        jstar = np.zeros(nw, dtype=np.int64)
        nt = nthreads or int(_os.environ.get("DACCORD_NATIVE_THREADS", 0)) \
            or min(4, _os.cpu_count() or 1)
        lib.stitch_jstar_runs(Q.ctypes.data, qlen.ctypes.data,
                              run_off.ctypes.data, len(runs), LQ, lp,
                              jstar.ctypes.data, nt)
        for ri, run in enumerate(runs):
            parts = [windows[run_off[ri]]]
            for wdx in range(int(run_off[ri]) + 1, int(run_off[ri + 1])):
                part = windows[wdx][int(jstar[wdx]):]
                if len(part):
                    parts.append(part)
            run["parts"] = parts
        return _emit(runs, winners_per_read, a, w)

    round_idx = 1
    while True:
        active = [run for run in runs if run["i"] + round_idx <= run["j"]]
        if not active:
            break
        N = len(active)
        P = np.full((N, lp), PAD, dtype=np.uint8)
        Q = np.full((N, lq_max), PAD, dtype=np.uint8)
        lq = np.zeros(N, dtype=np.int64)
        for n_, run in enumerate(active):
            tail = run["tail"]
            # tail is always exactly lp long after init (winners >= k+t_lo
            # > lp); guard anyway for tiny configs
            P[n_, lp - len(tail):] = tail[-lp:]
            if len(tail) < lp:
                P[n_, :lp - len(tail)] = PAD  # shorter acc: pad head
            q = winners_per_read[run["read"]][run["i"] + round_idx]
            Q[n_, :len(q)] = q
            lq[n_] = len(q)
        # NOTE: for tails shorter than lp the oracle uses the short P; padding
        # the head would corrupt the DP.  Handle short tails separately.
        short = [n_ for n_, run in enumerate(active) if len(run["tail"]) < lp]
        jstar = _batched_merge_jstar(P, Q, lq, lp)
        if short:
            from daccord_tpu.align.editdp import edit_table
            for n_ in short:
                run = active[n_]
                q = winners_per_read[run["read"]][run["i"] + round_idx]
                D = edit_table(run["tail"], q)
                jstar[n_] = int(np.argmin(D[len(run["tail"])]))
        for n_, run in enumerate(active):
            q = winners_per_read[run["read"]][run["i"] + round_idx]
            part = q[int(jstar[n_]):]
            if len(part):
                run["parts"].append(part)
            tail = run["tail"]
            cat = np.concatenate([tail, part]) if len(part) else tail
            run["tail"] = cat[-lp:]
        round_idx += 1

    return _emit(runs, winners_per_read, a, w)


def _emit(runs, winners_per_read, a, w):
    out: List[List[Tuple[int, int, np.ndarray]]] = [
        [] for _ in winners_per_read]
    for run in runs:
        acc = (np.concatenate(run["parts"]) if len(run["parts"]) > 1
               else run["parts"][0])
        out[run["read"]].append((run["i"] * a, run["j"] * a + w, acc))
    for lst in out:
        lst.sort(key=lambda f: f[0])
    return out
