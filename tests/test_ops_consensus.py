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


def test_device_deterministic_across_calls():
    rng = np.random.default_rng(2)
    piles = _windows(rng, 6, 12)
    r1 = consensus_batch(piles, CFG, PLQ, CFG.k)
    r2 = consensus_batch(piles, CFG, PLQ, CFG.k)
    for a, b in zip(r1, r2):
        assert (a is None) == (b is None)
        if a is not None:
            assert np.array_equal(a, b)
