#!/usr/bin/env python
"""Ablation timing of the cyc DBG kernel: which part eats the 137us/window?

Variants (cumulative code paths, results intentionally wrong for ablated
parts — timing only):
  full        the real kernel
  noend       end-picking (tt>=t_lo block) removed
  nobp        noend + backpointer packing removed
  notr        nobp + inter-group transposes removed (wrong results)
  dponly      notr (same as notr; kept for clarity)
Run on the real chip.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from daccord_tpu.ops import consensus_step as cs
from daccord_tpu.ops.pallas_dbg_cyc import (NEG, NEG_HALF, _natmaps,
                                            _transpose, build_phase_tables)
from daccord_tpu.utils.config import DaccordConfig
from scripts.profile_step import _sync, timeit, synth_inputs


def _kern(ewp_ref, eligp_ref, score0_ref, natp_ref, bpp_ref, meta_ref,
          *, k, t_lo, t_hi, endpick, bp, trans):
    h = k // 2
    gsz = h
    sc = score0_ref[0]
    bp_acc = None
    meta_ref[0] = jnp.zeros((8, 128), jnp.int32)
    for tt in range(1, t_hi + 1):
        q = (k - tt) % k
        std = q >= h
        g, field = divmod(tt - 1, gsz)
        if field == 0:
            if tt > 1 and trans:
                sc = _transpose(sc, "xlu")
            bp_acc = jnp.zeros(sc.shape, jnp.int32)
        if std:
            A, Bv = 4 ** (k - 1 - q), 4 ** (q - h)
        else:
            A, Bv = 4 ** (h - 1 - q), 4 ** q
        L = sc.shape[1]
        sc4 = sc << 2
        scv = sc4.reshape(A, 4, Bv, L)
        ew = ewp_ref[0, q]
        keys = []
        for bb in range(4):
            best = None
            for c in range(4):
                wv = ew[c * 4 + bb].reshape(A, Bv, L).astype(jnp.int32)
                cand = jnp.where(wv > 0, scv[:, c] + wv, NEG)
                best = cand if best is None else jnp.maximum(best, cand)
            keys.append(best)
        key = jnp.stack(keys, axis=1).reshape(sc.shape)
        sc = jnp.where(key > NEG_HALF, key >> 2, NEG)
        if bp:
            bpn = 3 - (key & 3)
            bp_acc = bp_acc | (bpn << (2 * field))
            if field == gsz - 1 or tt == t_hi:
                bpp_ref[0, g] = bp_acc
        if endpick and tt >= t_lo:
            nat = natp_ref[q]
            eligm = eligp_ref[0, q] != 0
            masked = jnp.where(eligm, sc, NEG)
            mx = jnp.max(masked)
            ok = mx > NEG_HALF
            natsel = jnp.where(eligm & (sc == mx), nat, 4 ** k)
            endnat = jnp.where(ok, jnp.min(natsel), 0)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            sel = lane == (tt - t_lo)
            meta_ref[0, 0:1, :] = jnp.where(sel, endnat, meta_ref[0, 0:1, :])
            meta_ref[0, 1:2, :] = jnp.where(sel, ok.astype(jnp.int32),
                                            meta_ref[0, 1:2, :])
    if not bp:
        bpp_ref[0, 0] = sc                            # keep DP chain live
        bpp_ref[0, 1:] = jnp.zeros_like(bpp_ref[0, 1:])
    if not endpick:
        meta_ref[0, 0:1, :] = jnp.full((1, 128), jnp.max(sc), jnp.int32)


def run_variant(name, endpick, bp, trans, ecn, src, snk, k, t_lo, t_hi):
    B, M = src.shape
    h = k // 2
    R = C = 4 ** h
    gsz = h
    nG = -(-t_hi // gsz)
    ewp, eligp = build_phase_tables(ecn[:, None], snk > 0, k)
    ewp = ewp[:, 0]                               # unweighted: NBT == 1
    have_src = src.max(axis=1) > 0
    source = jnp.argmax(src, axis=1).astype(jnp.int32)
    score0 = jnp.full((B, M), NEG, jnp.int32).at[
        jnp.arange(B), source].set(jnp.where(have_src, 0, NEG)
                                   ).reshape(B, R, C)
    f = pl.pallas_call(
        functools.partial(_kern, k=k, t_lo=t_lo, t_hi=t_hi,
                          endpick=endpick, bp=bp, trans=trans),
        grid=(B,),
        out_shape=(jax.ShapeDtypeStruct((B, nG, R, C), jnp.int32),
                   jax.ShapeDtypeStruct((B, 8, 128), jnp.int32)),
        in_specs=[
            pl.BlockSpec((1, k, 16, 4 ** (k - 1 - h), 4 ** h),
                         lambda b: (b, 0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, R, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, R, C), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((1, nG, R, C), lambda b: (b, 0, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2 ** 20),
    )
    # close over precomputed ewp/eligp to time the kernel alone
    jf = jax.jit(lambda a, b_, c_, d_: f(a, b_, c_, d_))
    natp = jnp.asarray(_natmaps(k))
    t = timeit(jf, ewp, eligp, score0, natp)
    B_ = B
    print(f"{name:8s} B={B_}: {t*1e3:7.2f}ms  ({t/B_*1e6:.1f} us/win)",
          flush=True)


def main():
    cfg = DaccordConfig()
    from daccord_tpu.oracle.eprof import ErrorProfile
    from daccord_tpu.oracle.consensus import build_plq
    plq = build_plq(ErrorProfile(0.03, 0.08, 0.04), cfg)
    plq_src = jnp.asarray(np.ascontiguousarray(plq[:cfg.wprime, 0], np.int32))
    plq_snk = jnp.asarray(
        np.ascontiguousarray(plq[:cfg.wprime, cfg.w - cfg.k], np.int32))
    k, w, pd = cfg.k, cfg.w, cfg.path_delta
    t_lo, t_hi = w - k - pd, w - k + pd
    B = 256
    S, slen, nstr = synth_inputs(B, 9, cfg)
    j_tables = jax.jit(lambda *a: cs._build_tables(*a, None, k=k, t_hi=t_hi))
    src, snk, ecnb = j_tables(S, slen, nstr, plq_src, plq_snk)
    ecn = ecnb[:, 0]

    # time build_phase_tables alone (XLA pre-permute, outside the kernel)
    jpt = jax.jit(lambda e, s: build_phase_tables(e[:, None], s > 0, k))
    t = timeit(jpt, ecn, snk)
    print(f"phase-tables B={B}: {t*1e3:7.2f}ms  ({t/B*1e6:.1f} us/win)",
          flush=True)

    for name, ep, bp, tr in [("full", True, True, True),
                             ("noend", False, True, True),
                             ("nobp", False, False, True)]:
        run_variant(name, ep, bp, tr, ecn, src, snk, k, t_lo, t_hi)


if __name__ == "__main__":
    main()
