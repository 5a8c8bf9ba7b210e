"""Device consensus step vs NumPy oracle: bit-exact equality (SURVEY §4.3)."""

import numpy as np
import pytest

from daccord_tpu.oracle.consensus import build_plq
from daccord_tpu.oracle.dbg import window_consensus
from daccord_tpu.oracle.eprof import ErrorProfile
from daccord_tpu.pipeline.batcher import consensus_batch
from daccord_tpu.utils.config import DaccordConfig

CFG = DaccordConfig()
PLQ = build_plq(ErrorProfile(0.03, 0.08, 0.04), CFG)


def _noisy_copies(rng, truth, n, e_sub=0.03, e_ins=0.08, e_del=0.04):
    out = [truth.copy()]
    for _ in range(n):
        s = []
        for b in truth:
            if rng.random() < e_del:
                continue
            s.append(b if rng.random() > e_sub else int(rng.integers(0, 4)))
            if rng.random() < e_ins:
                s.append(int(rng.integers(0, 4)))
        out.append(np.array(s[:CFG.wprime], dtype=np.uint8))
    return out


def _windows(rng, nwin, depth):
    piles = []
    for _ in range(nwin):
        truth = rng.integers(0, 4, size=CFG.w).astype(np.uint8)
        piles.append(_noisy_copies(rng, truth, depth))
    return piles


@pytest.mark.parametrize("depth", [3, 10, 30])
def test_device_matches_oracle(depth):
    rng = np.random.default_rng(depth)
    piles = _windows(rng, 12, depth)
    got = consensus_batch(piles, CFG, PLQ, CFG.k)
    for b, strings in enumerate(piles):
        want = window_consensus(strings, CFG, PLQ, CFG.k)
        if want is None:
            assert got[b] is None, b
        else:
            assert got[b] is not None, b
            assert np.array_equal(got[b], want), (
                b, got[b].tolist(), want.tolist())


def test_device_padding_slots_fail():
    rng = np.random.default_rng(0)
    piles = _windows(rng, 3, 8)
    got = consensus_batch(piles, CFG, PLQ, CFG.k, batch=8)
    assert len(got) == 3
    assert all(g is not None for g in got)


def test_device_degenerate_windows():
    rng = np.random.default_rng(1)
    # empty pile slot, single-string pile, all-same-base pile, short strings
    piles = [
        [np.zeros(0, dtype=np.uint8)],
        [rng.integers(0, 4, size=40).astype(np.uint8)],
        [np.zeros(40, dtype=np.uint8)] * 5,
        [rng.integers(0, 4, size=6).astype(np.uint8) for _ in range(4)],
    ]
    got = consensus_batch(piles, CFG, PLQ, CFG.k)
    for b, strings in enumerate(piles):
        want = window_consensus(strings, CFG, PLQ, CFG.k)
        if want is None:
            assert got[b] is None, b
        else:
            assert np.array_equal(got[b], want), b


def test_myers_scoring_matches_row_scan():
    """_cand_dists_myers (production) == _cand_dists_rows (ablation) ==
    scalar Levenshtein, across word counts NW = 1..3, slen = 0 rows,
    PAD-coded tails, and t_lo = 0 candidates."""
    import jax
    import jax.numpy as jnp

    from daccord_tpu.ops.consensus_step import (
        PAD, _cand_dists_myers, _cand_dists_rows)

    def lev(a, b):
        D = np.arange(len(b) + 1)
        for i in range(1, len(a) + 1):
            prev = D.copy()
            D[0] = i
            for j in range(1, len(b) + 1):
                D[j] = min(prev[j] + 1, D[j - 1] + 1,
                           prev[j - 1] + (a[i - 1] != b[j - 1]))
        return D[len(b)]

    rng = np.random.default_rng(7)
    for k, t_lo, t_hi, Wp, B, D1 in [(8, 18, 46, 49, 5, 9),
                                     (4, 0, 2, 8, 3, 2),
                                     (12, 28, 42, 52, 3, 5),
                                     (8, 10, 60, 70, 2, 4)]:
        nT, LC = t_hi - t_lo + 1, k + t_hi
        S = rng.integers(0, 4, size=(B, D1, Wp)).astype(np.uint8)
        slen = rng.integers(0, Wp + 1, size=(B, D1)).astype(np.int32)
        for b in range(B):
            for d in range(D1):
                S[b, d, slen[b, d]:] = PAD
        lc = ((k + np.arange(t_lo, t_hi + 1))[None, :]
              * np.ones((B, 1), np.int32)).astype(np.int32)
        cands = rng.integers(0, 4, size=(B, nT, LC)).astype(np.uint8)
        for b in range(B):
            for ti in range(nT):
                cands[b, ti, lc[b, ti]:] = PAD
        args = tuple(map(jnp.asarray, (S, slen, cands)))
        dr = np.asarray(jax.jit(lambda *a: _cand_dists_rows(
            *a, k=k, t_lo=t_lo, t_hi=t_hi))(*args))
        dm = np.asarray(jax.jit(lambda *a: _cand_dists_myers(
            *a, k=k, t_lo=t_lo, t_hi=t_hi))(*args))
        assert (dr == dm).all()
        for _ in range(20):
            b, ti, d = (rng.integers(0, B), rng.integers(0, nT),
                        rng.integers(0, D1))
            assert dm[b, ti, d] == lev(cands[b, ti, :lc[b, ti]],
                                       S[b, d, :slen[b, d]])


def test_device_deterministic_across_calls():
    rng = np.random.default_rng(2)
    piles = _windows(rng, 6, 12)
    r1 = consensus_batch(piles, CFG, PLQ, CFG.k)
    r2 = consensus_batch(piles, CFG, PLQ, CFG.k)
    for a, b in zip(r1, r2):
        assert (a is None) == (b is None)
        if a is not None:
            assert np.array_equal(a, b)
