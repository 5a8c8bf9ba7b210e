"""Pallas DBG-DP kernel == XLA scan path (interpret mode, small k)."""

import numpy as np
import pytest

from daccord_tpu.oracle.consensus import build_plq
from daccord_tpu.oracle.dbg import window_consensus
from daccord_tpu.oracle.eprof import ErrorProfile
from daccord_tpu.pipeline.batcher import consensus_batch, pack_windows
from daccord_tpu.ops.consensus_step import consensus_step
from daccord_tpu.utils.config import DaccordConfig

# small universe so interpret mode is fast: k=4 -> 256 nodes
CFG = DaccordConfig(w=16, a=4, k=4, path_delta=2, m=2)
PLQ = build_plq(ErrorProfile(0.03, 0.08, 0.04), CFG)


def _piles(rng, nwin, depth):
    piles = []
    for _ in range(nwin):
        truth = rng.integers(0, 4, size=CFG.w).astype(np.uint8)
        strings = [truth.copy()]
        for _ in range(depth):
            s = []
            for b in truth:
                if rng.random() < 0.04:
                    continue
                s.append(b if rng.random() > 0.03 else int(rng.integers(0, 4)))
                if rng.random() < 0.08:
                    s.append(int(rng.integers(0, 4)))
            strings.append(np.array(s[:CFG.wprime], dtype=np.uint8))
        piles.append(strings)
    return piles


def _run(piles, dp_impl):
    S, slen, nstr = pack_windows(piles, CFG, len(piles))
    ps = np.ascontiguousarray(PLQ[:CFG.wprime, 0], dtype=np.int32)
    pk = np.ascontiguousarray(PLQ[:CFG.wprime, CFG.w - CFG.k], dtype=np.int32)
    return consensus_step(S, slen, nstr, ps, pk, k=CFG.k, w=CFG.w,
                          path_delta=CFG.path_delta, dp_impl=dp_impl)


@pytest.mark.parametrize("impl", ["pallas_interpret", "cyc_interpret",
                                  "cyc_xtb_interpret",
                                  "cyc_pri_interpret"])
def test_pallas_dp_equals_scan(impl):
    rng = np.random.default_rng(3)
    piles = _piles(rng, 8, 8)
    a = _run(piles, "scan")
    b = _run(piles, impl)
    assert np.array_equal(np.asarray(a.ok), np.asarray(b.ok))
    assert np.array_equal(np.asarray(a.length), np.asarray(b.length))
    assert np.array_equal(np.asarray(a.bases), np.asarray(b.bases))
    assert np.array_equal(np.asarray(a.cost), np.asarray(b.cost))
    # and both equal the oracle
    for i, strings in enumerate(piles):
        want = window_consensus(strings, CFG, PLQ, CFG.k)
        got = (np.asarray(b.bases)[i, :b.length[i]]
               if b.ok[i] else None)
        if want is None:
            assert got is None
        else:
            assert np.array_equal(got, want)


@pytest.mark.parametrize("impl", ["pallas_interpret", "cyc_interpret"])
def test_pallas_dp_degenerate(impl):
    rng = np.random.default_rng(4)
    piles = [[np.zeros(0, dtype=np.uint8)],
             [rng.integers(0, 4, size=16).astype(np.uint8)] * 3,
             [np.zeros(16, dtype=np.uint8)] * 4]
    a = _run(piles, "scan")
    b = _run(piles, impl)
    assert np.array_equal(np.asarray(a.ok), np.asarray(b.ok))
    assert np.array_equal(np.asarray(a.bases), np.asarray(b.bases))


def test_cyc_k6_rotation_fallback():
    """k=6 exercises _digit_rot sizes (n=5, 6) with NO >=3-part rotation
    decomposition — the direct-rotation fallback must kick in.  (A raise
    here crashed every k=6 cyc config until the round-3 on-chip corner
    smoke caught it; build_elig_phases hits the path unconditionally.)"""
    cfg6 = DaccordConfig(w=20, a=5, k=6, path_delta=3, m=2)
    plq6 = build_plq(ErrorProfile(0.03, 0.08, 0.04), cfg6)
    rng = np.random.default_rng(7)
    piles = []
    for _ in range(6):
        truth = rng.integers(0, 4, size=cfg6.w).astype(np.uint8)
        strings = [truth.copy()]
        for _ in range(6):
            s = [int(b) for b in truth if rng.random() > 0.05]
            strings.append(np.array(s[:cfg6.wprime], np.uint8))
        piles.append(strings)
    S, slen, nstr = pack_windows(piles, cfg6, len(piles))
    ps = np.ascontiguousarray(plq6[:cfg6.wprime, 0], np.int32)
    pk = np.ascontiguousarray(plq6[:cfg6.wprime, cfg6.w - cfg6.k], np.int32)
    a = consensus_step(S, slen, nstr, ps, pk, k=6, w=cfg6.w, path_delta=3,
                       dp_impl="scan")
    b = consensus_step(S, slen, nstr, ps, pk, k=6, w=cfg6.w, path_delta=3,
                       dp_impl="cyc_interpret")
    for f in a._fields:
        assert np.array_equal(np.asarray(getattr(a, f)),
                              np.asarray(getattr(b, f))), f


def test_cyc_tie_heavy():
    """Tie-dense inputs (few distinct bases -> many equal scores/ends): the
    first-wins pins must agree between scan and cyc (VERDICT weak #3)."""
    rng = np.random.default_rng(11)
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
    a = _run(piles, "scan")
    b = _run(piles, "cyc_interpret")
    for f in ("ok", "length", "bases", "cost"):
        assert np.array_equal(np.asarray(getattr(a, f)),
                              np.asarray(getattr(b, f))), f
