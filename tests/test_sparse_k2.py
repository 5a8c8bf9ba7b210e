"""Sparse device consensus step (ops/sparse_k2.py) == oracle, any k.

The k2=12 adaptive-retry pass on device (SURVEY §7.3 item 6): sorted-unique
node tables + packed-key scatter-max DP must match oracle/dbg.py bit-exactly,
including the positional weighting and all tie rules.
"""

import numpy as np
import pytest

from daccord_tpu.oracle.consensus import build_pbw, build_plq
from daccord_tpu.oracle.dbg import window_consensus
from daccord_tpu.oracle.eprof import ErrorProfile
from daccord_tpu.ops.consensus_step import consensus_step
from daccord_tpu.ops.sparse_k2 import consensus_step_sparse
from daccord_tpu.pipeline.batcher import e_q6_of, pack_windows
from daccord_tpu.utils.config import DaccordConfig

CFG = DaccordConfig()
PROF = ErrorProfile(0.03, 0.08, 0.04)
PLQ = build_plq(PROF, CFG)
PBW = build_pbw(PROF, CFG)


def _noisy(truth, rng, wprime):
    s = []
    for b in truth:
        if rng.random() < 0.04:
            continue
        s.append(b if rng.random() > 0.03 else int(rng.integers(0, 4)))
        if rng.random() < 0.08:
            s.append(int(rng.integers(0, 4)))
    return np.array(s[:wprime], dtype=np.uint8)


def _piles(rng, n, depth, repeat=False):
    piles = []
    for _ in range(n):
        if repeat:
            mlen = int(rng.integers(8, 14))
            motif = rng.integers(0, 4, size=mlen).astype(np.uint8)
            pre = rng.integers(0, 4, size=int(
                rng.integers(0, CFG.w - 2 * mlen + 1))).astype(np.uint8)
            suf = rng.integers(
                0, 4, size=CFG.w - len(pre) - 2 * mlen).astype(np.uint8)
            truth = np.concatenate([pre, motif, motif, suf])
        else:
            truth = rng.integers(0, 4, size=CFG.w).astype(np.uint8)
        piles.append([truth.copy()] +
                     [_noisy(truth, rng, CFG.wprime) for _ in range(depth)])
    return piles


def _run_sparse(piles, k, pbw, dp_mode="auto"):
    S, slen, nstr = pack_windows(piles, CFG)
    ps = np.ascontiguousarray(PLQ[:CFG.wprime, 0], np.int32)
    pk = np.ascontiguousarray(PLQ[:CFG.wprime, CFG.w - k], np.int32)
    return consensus_step_sparse(S, slen, nstr, ps, pk, pbw, k=k, w=CFG.w,
                                 path_delta=CFG.path_delta,
                                 e_q6=e_q6_of(CFG), pos_bin=CFG.pos_bin,
                                 dp_mode=dp_mode)


def _assert_matches_oracle(piles, out, k, pbw):
    ok = np.asarray(out.ok)
    length = np.asarray(out.length)
    bases = np.asarray(out.bases)
    for i, strings in enumerate(piles):
        want = window_consensus([s.copy() for s in strings], CFG, PLQ, k, pbw)
        if want is None:
            assert not ok[i], i
        else:
            assert ok[i], i
            assert np.array_equal(bases[i, :length[i]], want), i


@pytest.mark.parametrize("weighted", [True, False])
@pytest.mark.parametrize("dp_mode", ["flat", "grouped"])
def test_sparse_k12_equals_oracle(weighted, dp_mode):
    """Both DP forms (the TPU production 'grouped' two-level one-hot and
    the 'flat' compare-reduce) must equal the oracle bit-exactly."""
    rng = np.random.default_rng(21)
    piles = _piles(rng, 10, 9) + _piles(rng, 6, 9, repeat=True)
    pbw = PBW if weighted else None
    out = _run_sparse(piles, CFG.k2, pbw, dp_mode=dp_mode)
    _assert_matches_oracle(piles, out, CFG.k2, pbw)


def test_sparse_k8_equals_dense():
    """Cross-validation: the sparse step equals the dense scan at k=8."""
    rng = np.random.default_rng(22)
    piles = _piles(rng, 8, 8) + _piles(rng, 4, 8, repeat=True)
    S, slen, nstr = pack_windows(piles, CFG)
    ps = np.ascontiguousarray(PLQ[:CFG.wprime, 0], np.int32)
    pk = np.ascontiguousarray(PLQ[:CFG.wprime, CFG.w - CFG.k], np.int32)
    kw = dict(k=CFG.k, w=CFG.w, path_delta=CFG.path_delta, e_q6=e_q6_of(CFG),
              pos_bin=CFG.pos_bin)
    a = consensus_step(S, slen, nstr, ps, pk, PBW, dp_impl="scan", **kw)
    b = consensus_step_sparse(S, slen, nstr, ps, pk, PBW, **kw)
    for name in ("ok", "length", "bases", "cost"):
        assert np.array_equal(np.asarray(getattr(a, name)),
                              np.asarray(getattr(b, name))), name


def test_sparse_shallow_and_degenerate():
    """Padding slots, homopolymer windows, depth-1 piles."""
    rng = np.random.default_rng(23)
    piles = _piles(rng, 3, 6)
    piles.append([np.zeros(CFG.w, np.uint8)] * 5)          # homopolymer
    piles.append([rng.integers(0, 4, size=CFG.w).astype(np.uint8)])
    S, slen, nstr = pack_windows(piles, CFG, batch=8)      # 2 pad slots
    ps = np.ascontiguousarray(PLQ[:CFG.wprime, 0], np.int32)
    pk = np.ascontiguousarray(PLQ[:CFG.wprime, CFG.w - CFG.k2], np.int32)
    out = consensus_step_sparse(S, slen, nstr, ps, pk, PBW, k=CFG.k2,
                                w=CFG.w, path_delta=CFG.path_delta,
                                e_q6=e_q6_of(CFG), pos_bin=CFG.pos_bin)
    _assert_matches_oracle(piles, out, CFG.k2, PBW)
    assert not np.asarray(out.ok)[len(piles):].any()


def test_runner_device_k2_equals_oracle(tmp_path):
    """End-to-end: the device k2 retry pass produces byte-identical output
    to the oracle on a repeat-heavy dataset with real retries."""
    from daccord_tpu.oracle.consensus import run_oracle
    from daccord_tpu.pipeline.runner import run_tpu
    from daccord_tpu.sim.simulator import SimConfig, simulate
    ds = simulate(SimConfig(seed=31, genome_len=6000, coverage=8.0,
                            read_len=(1200, 1800), repeat_density=0.004))
    db, las = str(tmp_path / "r.db"), str(tmp_path / "r.las")
    ds.write(db, las)
    cfg = CFG.replace(I=(0, 8), k2_impl="device")
    ro, so = run_oracle(db, las, cfg)
    rt, st = run_tpu(db, las, cfg, use_mesh=False)
    assert ro == rt
    assert so.k2_retries == st.k2_retries
    assert so.k2_attempts == st.k2_attempts
    assert st.k2_attempts > 0, "dataset should push windows into the k2 pass"
