"""Per-window consensus: sparse local de Bruijn graph + heaviest path (oracle).

The NumPy reference implementation of ALGORITHM §4 — the ``DebruijnGraph``
analog (gt1/daccord ``src/daccord.cpp`` classes ``DebruijnGraph``,
``OffsetLikely`` consumers; SURVEY §2.1, §3.4).  This sparse formulation is
the pinned ground truth; the dense device kernels (daccord_tpu/ops) must match
it bit-exactly (tests/test_ops_pathdp.py).

All arithmetic is integer; every argmax/argmin is first-wins on the stated
ordering (ALGORITHM §8).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from daccord_tpu.align.editdp import PAD, batch_edit_distance
from daccord_tpu.oracle.offset_likely import PBW_CLAMP
from daccord_tpu.utils.config import DaccordConfig

NEG = -(2 ** 29)
NEG_HALF = -(2 ** 28)


def kmer_codes(s: np.ndarray, k: int) -> np.ndarray:
    """int64 codes of all k-mers of s (first base most significant)."""
    if len(s) < k:
        return np.zeros(0, dtype=np.int64)
    win = np.lib.stride_tricks.sliding_window_view(s.astype(np.int64), k)
    pw = 4 ** np.arange(k - 1, -1, -1, dtype=np.int64)
    return win @ pw


def window_consensus(strings: List[np.ndarray], cfg: DaccordConfig,
                     plq: np.ndarray, k: int,
                     pbw: Optional[np.ndarray] = None) -> Optional[np.ndarray]:
    """Winner consensus for one window at k-mer size k, or None on failure.

    strings: S[0]=A substring then B' substrings (ALGORITHM §2).
    plq: int32 [W', w+1] Q16 offset-likelihood table (columns o=0..w).
    pbw: optional int32 [NB, NB] Q6 positional edge-weight kernel (ALGORITHM
    §4; offset_likely.pos_bin_weights_q6).  None = unweighted v1 counts.
    """
    w = cfg.w
    if w - k < 0:
        return None

    # ---- k-mer occurrence table: SRC / SNK scores (ALGORITHM §4) ----
    kcodes_all, kpos_all = [], []
    ecodes_all, epos_all = [], []
    for s in strings:
        kc = kmer_codes(s, k)
        if len(kc):
            kcodes_all.append(kc)
            kpos_all.append(np.arange(len(kc), dtype=np.int64))
        ec = kmer_codes(s, k + 1)
        if len(ec):
            ecodes_all.append(ec)
            epos_all.append(np.arange(len(ec), dtype=np.int64))
    if not kcodes_all or not ecodes_all:
        return None
    kcodes = np.concatenate(kcodes_all)
    kpos = np.concatenate(kpos_all)
    ecodes = np.concatenate(ecodes_all)
    epos = np.concatenate(epos_all)

    nodes = np.unique(kcodes)                       # sorted by code
    nidx_of = lambda c: np.searchsorted(nodes, c)   # noqa: E731
    kn = nidx_of(kcodes)
    src = np.zeros(len(nodes), dtype=np.int64)
    snk = np.zeros(len(nodes), dtype=np.int64)
    np.add.at(src, kn, plq[kpos, 0].astype(np.int64))
    np.add.at(snk, kn, plq[kpos, w - k].astype(np.int64))

    if src.max(initial=0) <= 0:
        return None
    source_n = int(np.argmax(src))                  # first max = smallest code

    t_exp = w - k
    t_lo = max(0, t_exp - cfg.path_delta)
    t_hi = t_exp + cfg.path_delta

    # ---- edges from (k+1)-mers, weighted per step bin (ALGORITHM §4) ----
    if pbw is None:
        ecu, ecnt = np.unique(ecodes, return_counts=True)
        wbins = ecnt[:, None].astype(np.int64)       # one bin covers all steps
        g_step = max(t_hi, 1)
    else:
        g_step = cfg.pos_bin
        ecu, einv = np.unique(ecodes, return_inverse=True)
        nbp = pbw.shape[0]
        rows = pbw[np.minimum(epos // g_step, nbp - 1)].astype(np.int64)
        wbins = np.zeros((len(ecu), pbw.shape[1]), dtype=np.int64)
        np.add.at(wbins, einv, rows)
        wbins = np.minimum(wbins, PBW_CLAMP)
    mask_k = (1 << (2 * k)) - 1
    e_u = ecu >> 2                                  # source k-mer code
    e_v = ecu & mask_k                              # target k-mer code
    e_c = (e_u >> (2 * (k - 1))).astype(np.int64)   # first base of u (tie key)
    # edges whose endpoints are observed k-mer nodes only
    uok = np.isin(e_u, nodes)
    vok = np.isin(e_v, nodes)
    keep = uok & vok
    e_u, e_v, e_c, wbins = e_u[keep], e_v[keep], e_c[keep], wbins[keep]
    if len(e_u) == 0:
        return None
    eui = nidx_of(e_u)
    evi = nidx_of(e_v)

    # ---- max-plus DP with backpointers (ALGORITHM §4) ----
    score = np.full(len(nodes), NEG, dtype=np.int64)
    score[source_n] = 0
    bp_edge: List[np.ndarray] = [np.full(len(nodes), -1, dtype=np.int64)]
    ends: List[Tuple[int, int]] = []  # (T, end node idx) per candidate slot

    def pick_end(sc) -> Optional[int]:
        elig = (snk > 0) & (sc > NEG_HALF)
        if not elig.any():
            return None
        masked = np.where(elig, sc, NEG)
        return int(np.argmax(masked))               # first max = smallest code

    if t_lo == 0:
        e0 = pick_end(score)
        ends.append((0, e0) if e0 is not None else (0, -1))
    for t in range(1, t_hi + 1):
        # step t consumes the edge at path offset t-1: use that step-bin's
        # positionally weighted counts; weight 0 = edge absent at this step
        wt = wbins[:, min((t - 1) // g_step, wbins.shape[1] - 1)]
        live = (score[eui] > NEG_HALF) & (wt > 0)
        new = np.full(len(nodes), NEG, dtype=np.int64)
        bpt = np.full(len(nodes), -1, dtype=np.int64)
        if live.any():
            le = np.nonzero(live)[0]
            cand = score[eui[le]] + wt[le]
            order = np.lexsort((e_c[le], -cand, evi[le]))
            vo = evi[le][order]
            first = np.ones(len(vo), dtype=bool)
            first[1:] = vo[1:] != vo[:-1]
            sel = order[first]
            new[evi[le][sel]] = cand[sel]
            bpt[evi[le][sel]] = le[sel]
        score = new
        bp_edge.append(bpt)
        if t_lo <= t <= t_hi:
            et = pick_end(score)
            ends.append((t, et) if et is not None else (t, -1))

    # ---- decode candidates (increasing T order) ----
    cands: List[np.ndarray] = []
    for (T, ni) in ends:
        if ni < 0:
            continue
        bases_rev = []
        cur = ni
        ok = True
        for t in range(T, 0, -1):
            e = int(bp_edge[t][cur])
            if e < 0:
                ok = False
                break
            bases_rev.append(int(nodes[cur] & 3))
            cur = int(eui[e])
        if not ok:
            continue
        assert cur == source_n, "traceback must end at the source"
        head = _decode(int(nodes[cur]), k)
        cands.append(np.array(head + bases_rev[::-1], dtype=np.uint8))
    if not cands:
        return None

    # ---- score candidates vs the window pile; first-min wins (ALGORITHM §4) --
    LC = max(len(c) for c in cands)
    LS = max(len(s) for s in strings)
    nc, ns = len(cands), len(strings)
    Cb = np.full((nc, LC), PAD, dtype=np.uint8)
    lc = np.zeros(nc, dtype=np.int64)
    for i, c in enumerate(cands):
        Cb[i, :len(c)] = c
        lc[i] = len(c)
    Sb = np.full((ns, LS), PAD, dtype=np.uint8)
    ls = np.zeros(ns, dtype=np.int64)
    for i, s in enumerate(strings):
        Sb[i, :len(s)] = s
        ls[i] = len(s)
    Ct = np.repeat(Cb, ns, axis=0)
    lct = np.repeat(lc, ns)
    St = np.tile(Sb, (nc, 1))
    lst = np.tile(ls, nc)
    d = batch_edit_distance(Ct, lct, St, lst).reshape(nc, ns)
    cost = d.sum(axis=1)
    win = int(np.argmin(cost))
    # -e max window error (ALGORITHM §4): integer-exact mean-cost cap
    if cfg.e < 1.0 and int(cost[win]) * 10**6 > round(cfg.e * 10**6) * ns * w:
        return None
    return cands[win]


def _decode(code: int, k: int) -> List[int]:
    out = [0] * k
    for i in range(k - 1, -1, -1):
        out[i] = code & 3
        code >>= 2
    return out


def window_consensus_adaptive(strings: List[np.ndarray], cfg: DaccordConfig,
                              plq: np.ndarray,
                              pbw: Optional[np.ndarray] = None
                              ) -> Tuple[Optional[np.ndarray], int]:
    """k=8 then k2=12 retry (ALGORITHM §6). Returns (winner or None, k used)."""
    res = window_consensus(strings, cfg, plq, cfg.k, pbw)
    if res is not None:
        return res, cfg.k
    res = window_consensus(strings, cfg, plq, cfg.k2, pbw)
    return res, (cfg.k2 if res is not None else 0)
