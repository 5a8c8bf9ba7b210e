#!/usr/bin/env python
"""Per-stage on-chip timing of the consensus step (SURVEY §7 perf loop).

Times each stage of ops/consensus_step.py under its own jit at the bench's
dominant batch shapes, so optimization effort goes to the real bottleneck.
Run on the real chip (no JAX_PLATFORMS override).  Stage timings include a
device round trip per iteration; the `full` row is the fused end-to-end step
(what production runs) and is the number that matters — stage rows are for
attribution only.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from daccord_tpu.ops import consensus_step as cs
from daccord_tpu.utils.config import DaccordConfig
from daccord_tpu.utils.jaxsetup import setup_compilation_cache

setup_compilation_cache()   # probe compiles persist across runs too


def _sync(out):
    """Force real completion: fetch one scalar derived from every output
    (block_until_ready alone does not flush the tunneled axon queue)."""
    leaves = jax.tree_util.tree_leaves(out)
    s = sum(jnp.sum(x.astype(jnp.int32) if x.dtype == jnp.bool_ else x)
            .astype(jnp.int64) for x in leaves)
    return int(np.asarray(s))


def timeit(fn, *args, iters=10, **kw):
    _sync(fn(*args, **kw))              # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def synth_inputs(B, D1, cfg, seed=0):
    rng = np.random.default_rng(seed)
    Wp = cfg.wprime
    S = rng.integers(0, 4, size=(B, D1, Wp)).astype(np.uint8)
    # clone row 0 into other rows with light mutation so real paths exist
    for d in range(1, D1):
        m = rng.random((B, Wp)) < 0.1
        S[:, d] = np.where(m, rng.integers(0, 4, size=(B, Wp)), S[:, 0])
    slen = np.full((B, D1), cfg.w, np.int32)
    slen[:, 1:] += rng.integers(-2, 3, size=(B, D1 - 1))
    nstr = np.full((B,), D1, np.int32)
    return jnp.asarray(S), jnp.asarray(slen), jnp.asarray(nstr)


def main():
    cfg = DaccordConfig(batch_windows=256)
    from daccord_tpu.oracle.eprof import ErrorProfile
    from daccord_tpu.oracle.consensus import build_pbw, build_plq
    prof = ErrorProfile(0.03, 0.08, 0.04)
    plq = build_plq(prof, cfg)
    pbw = build_pbw(prof, cfg)
    if os.environ.get("PROFILE_NO_PBW"):
        pbw = None
    plq_src = jnp.asarray(np.ascontiguousarray(plq[:cfg.wprime, 0], np.int32))
    plq_snk = jnp.asarray(
        np.ascontiguousarray(plq[:cfg.wprime, cfg.w - cfg.k], np.int32))
    k, w, pd = cfg.k, cfg.w, cfg.path_delta
    t_lo, t_hi = w - k - pd, w - k + pd
    g_step = cfg.pos_bin if pbw is not None else max(t_hi, 1)

    impl = sys.argv[1] if len(sys.argv) > 1 else "scan"

    if impl.startswith("cyc"):
        if pbw is not None:
            layout = "phases_h" if impl.startswith("cyc_hbm") else "codes"
        else:
            layout = "phases"
    else:
        layout = "natural"
    j_tables = jax.jit(lambda *a: cs._build_tables(
        *a, pbw, k=k, t_hi=t_hi, pos_bin=cfg.pos_bin, edges_layout=layout))
    dp_pbw = pbw if layout in ("phases_h", "codes") else None
    def _dp_arrays(e, s, n):
        (_tag, bps), ends, endok = cs._dp(e, s, n, k=k, t_lo=t_lo,
                                          t_hi=t_hi, g_step=g_step,
                                          dp_impl=impl, pbw=dp_pbw,
                                          edges_layout=layout)
        return bps, ends, endok
    j_dp = jax.jit(_dp_arrays)
    fused = impl.startswith("cyc") and "xtb" not in impl and k + t_hi <= 128
    if fused:
        # traceback runs inside the DP kernel; only the length mask remains
        j_tb = jax.jit(lambda b, e: cs._finish_traceback_fused(
            b, k=k, t_lo=t_lo, t_hi=t_hi))
    elif impl.startswith("cyc"):
        j_tb = jax.jit(lambda b, e: cs._traceback_cyc(
            b, e, k=k, t_lo=t_lo, t_hi=t_hi))
    else:
        j_tb = jax.jit(lambda b, e: cs._traceback(
            b, e, k=k, t_lo=t_lo, t_hi=t_hi))
    j_sc = jax.jit(lambda S, sl, ns, c, eo: cs._score_pick(
        S, sl, ns, c, eo, k=k, w=w, t_lo=t_lo, t_hi=t_hi, e_q6=1_000_000))
    j_full = lambda S, sl, ns: cs.consensus_step(
        S, sl, ns, plq_src, plq_snk, pbw, k=k, w=w, path_delta=pd,
        dp_impl=impl, pos_bin=cfg.pos_bin)

    print(f"devices: {jax.devices()}  impl={impl}", file=sys.stderr)
    src = snk = ecn = bps = ends = endok = cands = lc = None
    for (B, D1) in [(256, 9), (256, 17), (256, 65)]:
        del src, snk, ecn, bps, ends, endok, cands, lc  # free HBM first:
        # f32-H stage tensors are ~6.4GB at D1=65; two shapes' worth OOM
        S, slen, nstr = synth_inputs(B, D1, cfg)
        if layout == "phases_h" and D1 * cfg.pos_bin > 256:
            # f32-H stage tensors are ~6.4GB: timing stages standalone
            # queues several such outputs asynchronously and OOMs HBM.
            # Production fuses them away — report the fused row only.
            src = snk = ecn = bps = ends = endok = cands = lc = None
            t_full = timeit(j_full, S, slen, nstr)
            print(f"B={B} D1={D1}: full={t_full*1e3:7.2f}ms "
                  f"(f32-H shape: stage attribution skipped)")
            continue
        src, snk, ecn = j_tables(S, slen, nstr, plq_src, plq_snk)
        bps, ends, endok = j_dp(ecn, src, snk)
        cands, lc = j_tb(bps, ends)

        t_tab = timeit(j_tables, S, slen, nstr, plq_src, plq_snk)
        # few iters: the dp stage's bpp outputs are ~600MB each and queue
        # asynchronously; 10 in flight + materialized f32 H inputs OOM HBM
        t_dp = timeit(j_dp, ecn, src, snk, iters=3)
        t_tb = timeit(j_tb, bps, ends)
        t_sc = timeit(j_sc, S, slen, nstr, cands, endok)
        t_full = timeit(j_full, S, slen, nstr)
        print(f"B={B} D1={D1}: tables={t_tab*1e3:7.2f}ms dp={t_dp*1e3:7.2f}ms "
              f"traceback={t_tb*1e3:7.2f}ms score={t_sc*1e3:7.2f}ms | "
              f"full={t_full*1e3:7.2f}ms  (sum={1e3*(t_tab+t_dp+t_tb+t_sc):.2f})")


if __name__ == "__main__":
    main()
