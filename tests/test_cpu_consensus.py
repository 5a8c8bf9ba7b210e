"""Native C++ CPU consensus (the honest baseline) == NumPy oracle.

The C++ path (native/cpu_consensus.cpp via pipeline/cpu_runner.py) is the
measured denominator for the >=10x-CPU north star (BASELINE.md); these tests
pin it bit-exactly to the oracle so the baseline is the *same algorithm*,
not a lookalike.
"""

import numpy as np
import pytest

from daccord_tpu.oracle.consensus import (
    ConsensusTables, build_pbw, build_plq, run_oracle,
)
from daccord_tpu.oracle.dbg import window_consensus_adaptive
from daccord_tpu.oracle.eprof import ErrorProfile
from daccord_tpu.sim import SimConfig, simulate
from daccord_tpu.utils.config import DaccordConfig


@pytest.fixture(scope="module")
def lib():
    from daccord_tpu.pipeline.cpu_runner import _require_lib
    return _require_lib()


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("cpu_cons")
    ds = simulate(SimConfig(seed=33, genome_len=5000, coverage=10.0,
                            read_len=(800, 1300)))
    ds.write(str(d / "r.db"), str(d / "r.las"))
    return ds, str(d / "r.db"), str(d / "r.las")


def _call_one(lib, strings, cfg, plq, pbw, k=None, k2=None):
    """Drive cpu_consensus_batch over ONE window's string list."""
    import ctypes  # noqa: F401
    from daccord_tpu.pipeline.batcher import e_q6_of
    k = cfg.k if k is None else k
    k2 = cfg.k2 if k2 is None else k2
    pool = (np.concatenate(strings) if strings
            else np.zeros(0, np.uint8)).astype(np.uint8)
    lens = np.array([len(s) for s in strings], np.int32)
    starts = (np.concatenate([[0], np.cumsum(lens)[:-1]])
              if len(strings) else np.zeros(0, np.int64)).astype(np.int64)
    win_ptr = np.array([0, len(strings)], np.int64)
    win_tab = np.zeros(1, np.int32)
    plq_stack = np.ascontiguousarray(plq[None], np.int32)
    LC = cfg.w + cfg.path_delta
    out_b = np.zeros((1, LC), np.uint8)
    out_l = np.zeros(1, np.int32)
    out_k = np.zeros(1, np.int32)
    if pbw is not None:
        pbw_stack = np.ascontiguousarray(pbw[None], np.int32)
        NB, pbw_ptr = pbw.shape[0], pbw_stack.ctypes.data
    else:
        NB, pbw_ptr = 1, None
    lib.cpu_consensus_batch(
        pool.ctypes.data, starts.ctypes.data, lens.ctypes.data,
        win_ptr.ctypes.data, win_tab.ctypes.data, plq_stack.ctypes.data,
        pbw_ptr, 1, 1, cfg.wprime, cfg.w, NB, k, k2, cfg.path_delta,
        cfg.pos_bin, e_q6_of(cfg), LC,
        out_b.ctypes.data, out_l.ctypes.data, out_k.ctypes.data, 1)
    if out_l[0] == 0:
        return None, int(out_k[0])
    return out_b[0, :out_l[0]].copy(), int(out_k[0])


def _rand_window(rng, cfg, depth, mutate=0.15):
    true = rng.integers(0, 4, size=cfg.w).astype(np.uint8)
    strings = [true.copy()]
    for _ in range(depth):
        s = list(true)
        i = 0
        out = []
        while i < len(s):
            r = rng.random()
            if r < mutate * 0.4:
                out.append(int(rng.integers(0, 4)))      # sub
                i += 1
            elif r < mutate * 0.7:
                i += 1                                   # del
            elif r < mutate:
                out.append(int(rng.integers(0, 4)))      # ins
            else:
                out.append(s[i])
                i += 1
        arr = np.array(out, np.uint8)
        lmin, lmax = cfg.w - 2 * cfg.path_delta, cfg.wprime
        if lmin <= len(arr) <= lmax:
            strings.append(arr)
    return strings


def test_cpu_window_consensus_equals_oracle_random(lib):
    """400 random windows, weighted + unweighted: bit-equal to the oracle."""
    rng = np.random.default_rng(7)
    prof = ErrorProfile(0.03, 0.08, 0.04)
    for pos_weight in (True, False):
        cfg = DaccordConfig(pos_weight=pos_weight)
        plq = build_plq(prof, cfg)
        pbw = build_pbw(prof, cfg)
        for it in range(200):
            strings = _rand_window(rng, cfg, depth=int(rng.integers(3, 12)))
            want, wk = window_consensus_adaptive(strings, cfg, plq, pbw)
            got, gk = _call_one(lib, strings, cfg, plq, pbw)
            if want is None:
                assert got is None, f"iter {it}: oracle fail, cpu won"
            else:
                assert got is not None, f"iter {it}: cpu fail, oracle won"
                assert np.array_equal(got, want), f"iter {it}: bases differ"
                assert wk == gk, f"iter {it}: kused differ"


def test_cpu_window_consensus_tandem_repeats(lib):
    """Repeat-heavy windows (k2 retries exercised): bit-equal to oracle."""
    rng = np.random.default_rng(11)
    prof = ErrorProfile(0.03, 0.08, 0.04)
    for pos_weight in (False, True):
        cfg = DaccordConfig(pos_weight=pos_weight)
        plq = build_plq(prof, cfg)
        pbw = build_pbw(prof, cfg)
        for it in range(75):
            unit = rng.integers(0, 4,
                                size=int(rng.integers(2, 7))).astype(np.uint8)
            true = np.tile(unit, cfg.w // len(unit) + 1)[:cfg.w]
            strings = [true.copy()]
            for _ in range(8):
                s = true.copy()
                npos = rng.integers(0, 4)
                for _ in range(npos):
                    p = int(rng.integers(0, cfg.w))
                    s[p] = rng.integers(0, 4)
                strings.append(s)
            want, wk = window_consensus_adaptive(strings, cfg, plq, pbw)
            got, gk = _call_one(lib, strings, cfg, plq, pbw)
            if want is None:
                assert got is None
            else:
                assert np.array_equal(got, want)
                assert wk == gk


def test_cpu_k12_pass_equals_oracle(lib):
    """The k2 pass pinned directly: run k=12 as the PRIMARY k (k = k2 = 12)
    against the k=12 oracle — the adaptive retry's second leg, including
    wins, without needing natural k=8 failures."""
    from daccord_tpu.oracle.dbg import window_consensus
    rng = np.random.default_rng(23)
    prof = ErrorProfile(0.03, 0.08, 0.04)
    cfg = DaccordConfig()
    plq = build_plq(prof, cfg)
    pbw = build_pbw(prof, cfg)
    wins = 0
    for it in range(60):
        strings = _rand_window(rng, cfg, depth=int(rng.integers(4, 10)))
        want = window_consensus(strings, cfg, plq, cfg.k2, pbw)
        got, gk = _call_one(lib, strings, cfg, plq, pbw, k=cfg.k2, k2=cfg.k2)
        if want is None:
            assert got is None
        else:
            assert got is not None and np.array_equal(got, want)
            wins += 1
    assert wins > 10, "k=12 pass should mostly succeed on clean piles"


def test_cpu_runner_equals_oracle(dataset):
    """Full run_cpu pipeline == run_oracle, byte-identical records."""
    from daccord_tpu.pipeline.cpu_runner import run_cpu
    _, db_path, las_path = dataset
    cfg = DaccordConfig(I=(0, 4))
    oracle_recs, ostats = run_oracle(db_path, las_path, cfg)
    cpu_recs, cstats = run_cpu(db_path, las_path, cfg, nthreads=2)
    assert cpu_recs == oracle_recs
    assert cstats.windows == ostats.windows
    assert cstats.windows_ok == ostats.windows_ok
    assert cstats.k2_retries == ostats.k2_retries


def test_cpu_runner_thread_count_invariant(dataset):
    """Same bytes at any thread count (windows independent, order pinned)."""
    from daccord_tpu.pipeline.cpu_runner import run_cpu
    _, db_path, las_path = dataset
    cfg = DaccordConfig(I=(4, 6))
    r1, _ = run_cpu(db_path, las_path, cfg, nthreads=1)
    r4, _ = run_cpu(db_path, las_path, cfg, nthreads=4)
    assert r1 == r4
