"""Device realignment maps == host pinned rule (exact; CPU backend)."""

import numpy as np
import pytest

from daccord_tpu.align.editdp import PAD, batch_bpos_at, _batch_bpos_at_numpy
from daccord_tpu.ops.realign_dp import device_bpos_at


def _mk(rng, N, LA, LB):
    A = np.full((N, LA), PAD, np.uint8)
    B = np.full((N, LB), PAD, np.uint8)
    la = rng.integers(1, LA + 1, size=N).astype(np.int64)
    lb = rng.integers(1, LB + 1, size=N).astype(np.int64)
    for i in range(N):
        A[i, :la[i]] = rng.integers(0, 4, size=la[i])
        B[i, :lb[i]] = rng.integers(0, 4, size=lb[i])
    return A, la, B, lb


@pytest.mark.parametrize("N,LA,LB,PX", [(37, 50, 60, 7), (200, 100, 130, 13)])
def test_device_bpos_matches_host(N, LA, LB, PX):
    rng = np.random.default_rng(N)
    A, la, B, lb = _mk(rng, N, LA, LB)
    X = (rng.integers(0, LA + 1, size=(N, PX)) % (la[:, None] + 1))
    want = _batch_bpos_at_numpy(A, la, B, lb, X)
    got = device_bpos_at(A, la, B, lb, X)
    assert np.array_equal(got, want)


def test_device_bpos_chunking():
    rng = np.random.default_rng(7)
    A, la, B, lb = _mk(rng, 300, 40, 50)
    X = (rng.integers(0, 41, size=(300, 5)) % (la[:, None] + 1))
    got = device_bpos_at(A, la, B, lb, X, chunk=128)
    want = batch_bpos_at(A, la, B, lb, X)
    assert np.array_equal(got, want)
