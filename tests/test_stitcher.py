"""Batched stitcher vs oracle stitch: identical output (numpy + native)."""

import numpy as np
import pytest

from daccord_tpu.oracle.consensus import stitch
from daccord_tpu.pipeline.stitcher import stitch_many
from daccord_tpu.utils.config import DaccordConfig


def _rand_winners(rng, nwin, p_fail=0.15):
    out = []
    for _ in range(nwin):
        if rng.random() < p_fail:
            out.append(None)
        else:
            ln = int(rng.integers(36, 45))
            out.append(rng.integers(0, 4, size=ln).astype(np.uint8))
    return out


@pytest.mark.parametrize("native", [False, True])
def test_stitch_many_equals_oracle(native):
    rng = np.random.default_rng(9)
    cfg = DaccordConfig()
    reads = [_rand_winners(rng, int(rng.integers(0, 60))) for _ in range(25)]
    got = stitch_many(reads, cfg, native=native)
    for r, winners in enumerate(reads):
        want = stitch(winners, cfg)
        assert len(got[r]) == len(want), r
        for g, w_ in zip(got[r], want):
            assert g[0] == w_[0] and g[1] == w_[1]
            assert np.array_equal(g[2], w_[2]), r


@pytest.mark.parametrize("native", [False, True])
def test_stitch_many_realistic_overlaps(native):
    """Winners that genuinely overlap like adjacent windows do."""
    rng = np.random.default_rng(10)
    cfg = DaccordConfig()
    reads = []
    for _ in range(10):
        full = rng.integers(0, 4, size=400).astype(np.uint8)
        winners = []
        for i in range((400 - cfg.w) // cfg.a + 1):
            if rng.random() < 0.1:
                winners.append(None)
            else:
                s = full[i * cfg.a:i * cfg.a + cfg.w].copy()
                # sprinkle an error or two
                for _ in range(int(rng.integers(0, 3))):
                    p = int(rng.integers(0, len(s)))
                    s[p] = (s[p] + 1) % 4
                winners.append(s)
        reads.append(winners)
    got = stitch_many(reads, cfg, native=native)
    for r, winners in enumerate(reads):
        want = stitch(winners, cfg)
        assert len(got[r]) == len(want)
        for g, w_ in zip(got[r], want):
            assert g[:2] == w_[:2] and np.array_equal(g[2], w_[2])


def test_stitch_many_empty_and_all_failed():
    cfg = DaccordConfig()
    got = stitch_many([[], [None, None, None]], cfg)
    assert got == [[], []]
