"""Pinned edit-DP tests: scalar reference vs batched forms (SURVEY §4 item 3)."""

import numpy as np

from daccord_tpu.align.editdp import (
    PAD, batch_edit_distance, batch_realign, edit_distance, edit_table,
    traceback_bpos,
)


def _slow_edit(a, b):
    la, lb = len(a), len(b)
    D = np.zeros((la + 1, lb + 1), dtype=np.int64)
    D[0] = np.arange(lb + 1)
    D[:, 0] = np.arange(la + 1)
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            D[i, j] = min(D[i-1, j-1] + (a[i-1] != b[j-1]),
                          D[i-1, j] + 1, D[i, j-1] + 1)
    return int(D[la, lb])


def test_edit_table_matches_slow():
    rng = np.random.default_rng(0)
    for _ in range(30):
        la, lb = rng.integers(0, 25, size=2)
        a = rng.integers(0, 4, size=la).astype(np.uint8)
        b = rng.integers(0, 4, size=lb).astype(np.uint8)
        assert edit_distance(a, b) == _slow_edit(a, b)


def test_traceback_bpos_properties():
    rng = np.random.default_rng(1)
    for _ in range(30):
        la, lb = rng.integers(1, 30, size=2)
        a = rng.integers(0, 4, size=la).astype(np.uint8)
        b = rng.integers(0, 4, size=lb).astype(np.uint8)
        d, bpos = traceback_bpos(a, b)
        assert d == edit_distance(a, b)
        # first-arrival semantics: trailing B-only steps excluded at a=la
        assert bpos[0] == 0 and bpos[la] <= lb
        assert (np.diff(bpos) >= 0).all()


def test_traceback_identity():
    a = np.array([0, 1, 2, 3, 0, 1], dtype=np.uint8)
    d, bpos = traceback_bpos(a, a)
    assert d == 0
    assert np.array_equal(bpos, np.arange(7))


def _pad_batch(seqs, L):
    N = len(seqs)
    out = np.full((N, L), PAD, dtype=np.uint8)
    lens = np.zeros(N, dtype=np.int64)
    for i, s in enumerate(seqs):
        out[i, :len(s)] = s
        lens[i] = len(s)
    return out, lens


def test_batch_edit_distance_matches_scalar():
    rng = np.random.default_rng(2)
    As, Bs = [], []
    for _ in range(50):
        As.append(rng.integers(0, 4, size=rng.integers(0, 40)).astype(np.uint8))
        Bs.append(rng.integers(0, 4, size=rng.integers(0, 48)).astype(np.uint8))
    A, la = _pad_batch(As, 40)
    B, lb = _pad_batch(Bs, 48)
    got = batch_edit_distance(A, la, B, lb)
    want = [edit_distance(a, b) for a, b in zip(As, Bs)]
    assert got.tolist() == want


def test_batch_realign_matches_scalar():
    rng = np.random.default_rng(3)
    As, Bs = [], []
    for _ in range(40):
        As.append(rng.integers(0, 4, size=rng.integers(1, 60)).astype(np.uint8))
        Bs.append(rng.integers(0, 4, size=rng.integers(1, 70)).astype(np.uint8))
    A, la = _pad_batch(As, 60)
    B, lb = _pad_batch(Bs, 70)
    dist, bpos, ops = batch_realign(A, la, B, lb, want_ops=True)
    for n, (a, b) in enumerate(zip(As, Bs)):
        d, bp = traceback_bpos(a, b)
        assert dist[n] == d
        assert np.array_equal(bpos[n, :len(a) + 1], bp), n
        # op counts are consistent: mismatial+up+left == distance
        assert ops[n, 1] + ops[n, 2] + ops[n, 3] == d
        assert ops[n, 0] + ops[n, 1] + ops[n, 2] == len(a)   # A bases consumed
        assert ops[n, 0] + ops[n, 1] + ops[n, 3] == len(b)   # B bases consumed


def test_batch_bpos_pinned_properties():
    """bpos: leftmost-on-any-optimal-path (ALGORITHM §1 pinned rule)."""
    from daccord_tpu.align.editdp import batch_bpos
    rng = np.random.default_rng(4)
    As, Bs = [], []
    for _ in range(40):
        As.append(rng.integers(0, 4, size=rng.integers(1, 50)).astype(np.uint8))
        Bs.append(rng.integers(0, 4, size=rng.integers(1, 60)).astype(np.uint8))
    A, la = _pad_batch(As, 50)
    B, lb = _pad_batch(Bs, 60)
    dist, bpos = batch_bpos(A, la, B, lb)
    for n, (a, b) in enumerate(zip(As, Bs)):
        d = edit_distance(a, b)
        assert dist[n] == d
        bp = bpos[n, :len(a) + 1]
        assert bp[0] == 0
        assert (np.diff(bp) >= 0).all()
        assert bp[-1] <= len(b)
        # brute-force check on a few rows: bp[x] is the smallest j with
        # Dfwd(x,j)+Dbwd(x,j) == dist
        Df = edit_table(a, b)
        Db = edit_table(a[::-1].copy(), b[::-1].copy())
        for x in [0, len(a) // 2, len(a)]:
            tot = Df[x] + Db[len(a) - x][::-1]
            want = int(np.flatnonzero(tot == tot.min())[0])
            assert tot.min() == d
            assert bp[x] == want, (n, x)


def test_batch_bpos_identity():
    from daccord_tpu.align.editdp import batch_bpos
    a = np.array([[0, 1, 2, 3, 0, 1]], dtype=np.uint8)
    d, bp = batch_bpos(a, np.array([6]), a.copy(), np.array([6]))
    assert d[0] == 0
    assert np.array_equal(bp[0], np.arange(7))


def test_native_bpos_at_matches_numpy():
    """C++ kernel == NumPy reference on random batches (incl. lattice use)."""
    from daccord_tpu.align.editdp import batch_bpos_at, _batch_bpos_at_numpy
    from daccord_tpu.native.build import get_lib
    assert get_lib() is not None, "native library must build in this env"
    rng = np.random.default_rng(11)
    for trial in range(5):
        N = int(rng.integers(1, 40))
        LA, LB = int(rng.integers(2, 110)), int(rng.integers(2, 140))
        A = rng.integers(0, 4, size=(N, LA)).astype(np.uint8)
        B = rng.integers(0, 4, size=(N, LB)).astype(np.uint8)
        la = rng.integers(1, LA + 1, size=N).astype(np.int64)
        lb = rng.integers(1, LB + 1, size=N).astype(np.int64)
        PX = int(rng.integers(1, 14))
        X = (rng.integers(0, LA + 1, size=(N, PX)) % (la[:, None] + 1))
        got = batch_bpos_at(A, la, B, lb, X)
        want = _batch_bpos_at_numpy(A, la, B, lb, X)
        assert np.array_equal(got, want), trial


def test_native_ops_count_matches_numpy():
    from daccord_tpu.align.editdp import batch_ops_count, batch_realign
    from daccord_tpu.native.build import get_lib
    assert get_lib() is not None
    rng = np.random.default_rng(12)
    N, LA, LB = 60, 90, 120
    A = rng.integers(0, 4, size=(N, LA)).astype(np.uint8)
    B = rng.integers(0, 4, size=(N, LB)).astype(np.uint8)
    la = rng.integers(1, LA + 1, size=N).astype(np.int64)
    lb = rng.integers(1, LB + 1, size=N).astype(np.int64)
    got = batch_ops_count(A, la, B, lb)
    _, _, ops = batch_realign(A, la, B, lb, want_ops=True)
    assert np.array_equal(got, ops.sum(axis=0))


def test_bpos_at_myers_word_boundaries():
    """The bit-parallel (Myers) C++ kernel == NumPy full DP across word
    widths (lb spanning 1..200 crosses the 64/128/192-bit word edges,
    where shift/addition carry bugs live) and degenerate shapes."""
    import numpy as np

    from daccord_tpu.align.editdp import (
        PAD, _batch_bpos_at_numpy, batch_bpos_at,
    )
    rng = np.random.default_rng(99)
    N, LA, LB, PX = 80, 210, 210, 5
    A = rng.integers(0, 4, size=(N, LA)).astype(np.uint8)
    B = rng.integers(0, 4, size=(N, LB)).astype(np.uint8)
    la = rng.integers(0, LA + 1, size=N).astype(np.int64)
    lb = np.concatenate([
        np.array([0, 1, 63, 64, 65, 127, 128, 129, 191, 192, 193, 200]),
        rng.integers(0, LB + 1, size=N - 12)]).astype(np.int64)
    # degenerate rows: identical strings, all-mismatch strings
    B[0, :] = 0; A[0, :] = 0
    A[1, :] = 1; B[1, :] = 2
    X = np.sort(rng.integers(0, la[:, None] + 1, size=(N, PX)), axis=1)
    got = batch_bpos_at(A, la, B, lb, X, nthreads=3)
    ref = _batch_bpos_at_numpy(A, la, B, lb, X)
    assert np.array_equal(got, ref)


def test_batch_bpos_at_banded_identical():
    """band hints are accepted and ignored (the bit-parallel kernel is
    exact full-width): results identical for ANY band value."""
    import numpy as np

    from daccord_tpu.align.editdp import PAD, batch_bpos_at
    rng = np.random.default_rng(17)
    N, LA, LB, PX = 64, 110, 125, 6
    A = rng.integers(0, 4, size=(N, LA)).astype(np.uint8)
    B = np.full((N, LB), PAD, np.uint8)
    la = rng.integers(60, LA + 1, size=N).astype(np.int64)
    lb = np.zeros(N, np.int64)
    for n in range(N):
        # B = A with ~15% errors (realistic trace-block regime)
        src = A[n, :la[n]]
        out = []
        for ch in src:
            r = rng.random()
            if r < 0.05:
                continue
            if r < 0.10:
                out.append(rng.integers(0, 4))
            out.append(ch)
        lb[n] = min(len(out), LB)
        B[n, :lb[n]] = np.array(out[:lb[n]], np.uint8)
    X = np.sort(rng.integers(0, la[:, None] + 1, size=(N, PX)), axis=1)
    full = batch_bpos_at(A, la, B, lb, X, nthreads=2)
    for band_val in (0, 2, 8, 30, 200):
        band = np.full(N, band_val, np.int64)
        got = batch_bpos_at(A, la, B, lb, X, nthreads=2, band=band)
        assert np.array_equal(got, full), f"band={band_val} differs"
    # mixed per-problem bands
    band = rng.integers(0, 40, size=N).astype(np.int64)
    got = batch_bpos_at(A, la, B, lb, X, nthreads=2, band=band)
    assert np.array_equal(got, full)
