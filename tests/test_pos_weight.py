"""Positional (k+1)-mer edge weighting (ALGORITHM §4 v2).

The OffsetLikely count-weighting analog (gt1/daccord ``src/daccord.cpp``;
SURVEY §3.4 ``c[kmer(s,j)] += weight(P, j)``): edge observations are weighted
by position/step-bin consistency so the heaviest-path search cannot use a
repeat's second occurrence to support the first's DP steps.

Asserts (a) oracle == scan == cyc-interpret bit-equality under weighting,
(b) the pinned PBW table's shape/properties, (c) the accuracy win on
tandem-repeat windows that motivates the feature.
"""

import numpy as np
import pytest

from daccord_tpu.oracle.consensus import build_pbw, build_plq
from daccord_tpu.oracle.dbg import window_consensus
from daccord_tpu.oracle.eprof import ErrorProfile
from daccord_tpu.oracle.offset_likely import PBW_CLAMP, pos_bin_weights_q6
from daccord_tpu.pipeline.batcher import consensus_batch, e_q6_of, pack_windows
from daccord_tpu.utils.config import DaccordConfig

CFG = DaccordConfig()
PROF = ErrorProfile(0.03, 0.08, 0.04)
PLQ = build_plq(PROF, CFG)
PBW = build_pbw(PROF, CFG)


def _noisy(truth, rng, wprime, ei=0.08, ed=0.04, es=0.03):
    s = []
    for b in truth:
        if rng.random() < ed:
            continue
        s.append(b if rng.random() > es else int(rng.integers(0, 4)))
        if rng.random() < ei:
            s.append(int(rng.integers(0, 4)))
    return np.array(s[:wprime], dtype=np.uint8)


def _random_piles(n, depth, rng):
    piles = []
    for _ in range(n):
        truth = rng.integers(0, 4, size=CFG.w).astype(np.uint8)
        piles.append([truth.copy()] +
                     [_noisy(truth, rng, CFG.wprime) for _ in range(depth)])
    return piles


def _repeat_pile(rng, depth=12):
    """Window = prefix + (motif x2) + suffix: the repeat-heavy shape that
    mis-ranks unweighted DBG paths."""
    mlen = int(rng.integers(8, 14))
    motif = rng.integers(0, 4, size=mlen).astype(np.uint8)
    pre = rng.integers(
        0, 4, size=int(rng.integers(0, CFG.w - 2 * mlen + 1))).astype(np.uint8)
    suf = rng.integers(0, 4, size=CFG.w - len(pre) - 2 * mlen).astype(np.uint8)
    truth = np.concatenate([pre, motif, motif, suf])
    return truth, [truth.copy()] + [_noisy(truth, rng, CFG.wprime)
                                    for _ in range(depth)]


def test_pbw_table_pinned_properties():
    assert PBW is not None and PBW.dtype == np.int32
    nb = -(-CFG.wprime // CFG.pos_bin)
    assert PBW.shape == (nb, nb)
    assert PBW.min() >= 0 and PBW.max() <= 64          # Q6 probabilities
    # near-diagonal: each step bin's heaviest position bin is itself
    assert np.array_equal(np.argmax(PBW, axis=0), np.arange(nb))
    assert build_pbw(PROF, CFG.replace(pos_weight=False)) is None


def test_weighted_oracle_equals_device_scan():
    rng = np.random.default_rng(3)
    piles = _random_piles(16, 10, rng)
    want = [window_consensus([s.copy() for s in p], CFG, PLQ, CFG.k, PBW)
            for p in piles]
    got = consensus_batch(piles, CFG, PLQ, CFG.k, pbw=PBW)
    for i, (wv, gv) in enumerate(zip(want, got)):
        assert (wv is None) == (gv is None), i
        if wv is not None:
            assert np.array_equal(wv, gv), i


@pytest.mark.parametrize("impl", ["cyc_interpret", "cyc_hbm_interpret",
                                  "cyc_xtb_interpret"])
def test_weighted_scan_equals_cyc_interpret(impl):
    """cyc_interpret = production codes layout (in-kernel MXU histograms +
    fused in-kernel traceback); cyc_hbm_interpret = the phases_h ablation
    (XLA-built histogram tables); cyc_xtb_interpret = the XLA-traceback
    ablation (backpointers written to HBM)."""
    from daccord_tpu.ops.consensus_step import consensus_step
    rng = np.random.default_rng(5)
    piles = _random_piles(6, 9, rng)
    # include a repeat window so step-bin tables actually differ
    piles.append(_repeat_pile(rng)[1])
    S, slen, nstr = pack_windows(piles, CFG)
    ps = np.ascontiguousarray(PLQ[:CFG.wprime, 0], np.int32)
    pk = np.ascontiguousarray(PLQ[:CFG.wprime, CFG.w - CFG.k], np.int32)
    kw = dict(k=CFG.k, w=CFG.w, path_delta=CFG.path_delta, e_q6=e_q6_of(CFG))
    a = consensus_step(S, slen, nstr, ps, pk, PBW, dp_impl="scan", **kw)
    b = consensus_step(S, slen, nstr, ps, pk, PBW, dp_impl=impl, **kw)
    for name in ("ok", "length", "bases", "cost"):
        assert np.array_equal(np.asarray(getattr(a, name)),
                              np.asarray(getattr(b, name))), name


def test_weighted_cyc_deep_pile_f32_scratch():
    """Deep piles push D1*pos_bin past 256, flipping the in-kernel histogram
    scratch to f32 (bf16 would round counts > 256); equality must hold."""
    from daccord_tpu.ops.consensus_step import consensus_step
    rng = np.random.default_rng(23)
    piles = _random_piles(2, 32, rng)          # D1 = 33 -> gp = 384 > 256
    S, slen, nstr = pack_windows(piles, CFG)
    assert S.shape[1] * CFG.pos_bin > 256
    ps = np.ascontiguousarray(PLQ[:CFG.wprime, 0], np.int32)
    pk = np.ascontiguousarray(PLQ[:CFG.wprime, CFG.w - CFG.k], np.int32)
    kw = dict(k=CFG.k, w=CFG.w, path_delta=CFG.path_delta, e_q6=e_q6_of(CFG))
    a = consensus_step(S, slen, nstr, ps, pk, PBW, dp_impl="scan", **kw)
    b = consensus_step(S, slen, nstr, ps, pk, PBW, dp_impl="cyc_interpret",
                       **kw)
    for name in ("ok", "length", "bases", "cost"):
        assert np.array_equal(np.asarray(getattr(a, name)),
                              np.asarray(getattr(b, name))), name


def test_weighted_cyc_per_window_pbw():
    """Mixed table groups ship a PER-WINDOW pbw stack [B, NB, NB]
    (runner.py eprof-v2 path); the cyc kernel reads its SMEM block
    per-window and must match the scan path window-for-window."""
    from daccord_tpu.ops.consensus_step import consensus_step
    rng = np.random.default_rng(29)
    piles = _random_piles(5, 9, rng)
    S, slen, nstr = pack_windows(piles, CFG)
    B = S.shape[0]
    prof2 = ErrorProfile(0.05, 0.11, 0.06)
    pbw_b = np.stack([PBW if i % 2 == 0 else build_pbw(prof2, CFG)
                      for i in range(B)])
    assert not np.array_equal(pbw_b[0], pbw_b[1])
    ps = np.ascontiguousarray(PLQ[:CFG.wprime, 0], np.int32)
    pk = np.ascontiguousarray(PLQ[:CFG.wprime, CFG.w - CFG.k], np.int32)
    kw = dict(k=CFG.k, w=CFG.w, path_delta=CFG.path_delta, e_q6=e_q6_of(CFG))
    a = consensus_step(S, slen, nstr, ps, pk, pbw_b, dp_impl="scan", **kw)
    b = consensus_step(S, slen, nstr, ps, pk, pbw_b, dp_impl="cyc_interpret",
                       **kw)
    for name in ("ok", "length", "bases", "cost"):
        assert np.array_equal(np.asarray(getattr(a, name)),
                              np.asarray(getattr(b, name))), name


def test_repeat_window_accuracy_improves():
    """Positional weighting must strictly dominate on tandem-repeat windows
    (measured across the full 400-seed sweep: 181 weighted-only recoveries
    vs 1 unweighted-only; this pinned 60-seed slice reproduces the margin)."""
    w_only = u_only = 0
    for seed in range(60):
        rng = np.random.default_rng(seed)
        truth, strings = _repeat_pile(rng)
        rw = window_consensus([s.copy() for s in strings], CFG, PLQ,
                              CFG.k, PBW)
        ru = window_consensus([s.copy() for s in strings], CFG, PLQ, CFG.k)
        okw = rw is not None and np.array_equal(rw, truth)
        oku = ru is not None and np.array_equal(ru, truth)
        w_only += okw and not oku
        u_only += oku and not okw
    assert w_only >= 15, f"expected a large weighted-only margin, got {w_only}"
    assert u_only <= 2, f"unweighted should almost never win alone: {u_only}"


def test_weighted_k2_oracle():
    """The pbw table is k-independent: the k2=12 oracle pass (the runner's
    adaptive-retry path) accepts the same table and still recovers truth."""
    rng = np.random.default_rng(9)
    for p in _random_piles(4, 8, rng):
        res = window_consensus([s.copy() for s in p], CFG, PLQ, CFG.k2, PBW)
        assert res is not None and np.array_equal(res, p[0])


def test_weighted_tie_heavy_scan_equals_cyc():
    """Tie-dense WEIGHTED inputs: the kernel's in-VMEM mix pre-biases
    absent edges to a large negative instead of excluding them (bare
    add+max inner loop), and equal-score ties must still resolve to the
    smallest predecessor char exactly like the scan path (first-wins)."""
    from daccord_tpu.ops.consensus_step import consensus_step
    rng = np.random.default_rng(17)
    piles = []
    for _ in range(8):
        truth = rng.integers(0, 2, size=CFG.w).astype(np.uint8)  # binary
        strings = [truth.copy()]
        for _ in range(6):
            s = truth.copy()
            for j in rng.integers(0, CFG.w, size=2):
                s[j] = rng.integers(0, 2)
            strings.append(s)
        piles.append(strings)
    S, slen, nstr = pack_windows(piles, CFG)
    ps = np.ascontiguousarray(PLQ[:CFG.wprime, 0], np.int32)
    pk = np.ascontiguousarray(PLQ[:CFG.wprime, CFG.w - CFG.k], np.int32)
    kw = dict(k=CFG.k, w=CFG.w, path_delta=CFG.path_delta, e_q6=e_q6_of(CFG))
    a = consensus_step(S, slen, nstr, ps, pk, PBW, dp_impl="scan", **kw)
    b = consensus_step(S, slen, nstr, ps, pk, PBW, dp_impl="cyc_interpret",
                       **kw)
    for name in ("ok", "length", "bases", "cost"):
        assert np.array_equal(np.asarray(getattr(a, name)),
                              np.asarray(getattr(b, name))), name
