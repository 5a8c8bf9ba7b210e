"""Pallas edit-distance kernel == pinned batched DP (interpret mode on CPU)."""

import numpy as np
import pytest

from daccord_tpu.align.editdp import PAD, batch_edit_distance
from daccord_tpu.ops.pallas_editdp import pallas_batch_edit_distance


def _pad_batch(seqs, L):
    out = np.full((len(seqs), L), PAD, dtype=np.uint8)
    lens = np.zeros(len(seqs), dtype=np.int64)
    for i, s in enumerate(seqs):
        out[i, :len(s)] = s
        lens[i] = len(s)
    return out, lens


@pytest.mark.parametrize("n", [1, 100, 300])
def test_pallas_editdp_matches_batch(n):
    rng = np.random.default_rng(n)
    As = [rng.integers(0, 4, size=rng.integers(0, 44)).astype(np.uint8)
          for _ in range(n)]
    Bs = [rng.integers(0, 4, size=rng.integers(0, 48)).astype(np.uint8)
          for _ in range(n)]
    A, la = _pad_batch(As, 44)
    B, lb = _pad_batch(Bs, 48)
    want = batch_edit_distance(A, la, B, lb)
    got = pallas_batch_edit_distance(A, la, B, lb, interpret=True)
    assert np.array_equal(got, want)
