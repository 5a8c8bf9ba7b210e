#!/usr/bin/env python
"""On-chip probe: full cyc-kernel time at the bench shape for wpg x
histogram-scratch-dtype combinations (round-4 mix-convert investigation).
Timing-only; equality is asserted separately (try_cyc_chip --pbw, tests)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from daccord_tpu.ops import consensus_step as cs
from daccord_tpu.ops.pallas_dbg_cyc import cyc_dbg_dp
from daccord_tpu.utils.config import DaccordConfig
from scripts.profile_step import synth_inputs, timeit


def main():
    cfg = DaccordConfig(batch_windows=256)
    from daccord_tpu.oracle.consensus import build_pbw, build_plq
    from daccord_tpu.oracle.eprof import ErrorProfile
    prof = ErrorProfile(0.03, 0.08, 0.04)
    plq = build_plq(prof, cfg)
    pbw = build_pbw(prof, cfg)
    plq_src = np.ascontiguousarray(plq[:cfg.wprime, 0], np.int32)
    plq_snk = np.ascontiguousarray(plq[:cfg.wprime, cfg.w - cfg.k], np.int32)
    k, w, pd = cfg.k, cfg.w, cfg.path_delta
    t_lo, t_hi = w - k - pd, w - k + pd

    j_tables = jax.jit(lambda *a: cs._build_tables(
        *a, pbw, k=k, t_hi=t_hi, pos_bin=cfg.pos_bin, edges_layout="codes"))
    print(f"devices: {jax.devices()}", file=sys.stderr)
    D1 = int(os.environ.get("PROBE_D1", "9"))
    B = 256
    S, slen, nstr = synth_inputs(B, D1, cfg)
    src, snk, codes = j_tables(S, slen, nstr, plq_src, plq_snk)
    jax.block_until_ready((src, snk, codes))
    ref = None
    for wpg in (2, 4, 1):
        for scr_i8 in (False, True):
            try:
                t = timeit(cyc_dbg_dp, None, src, snk, pbw, codes,
                           k=k, t_lo=t_lo, t_hi=t_hi, g_step=cfg.pos_bin,
                           pbw_band=1, fuse_tb=True,
                           cnt_bound=D1 * cfg.pos_bin, wpg=wpg,
                           scr_i8=scr_i8)
            except Exception as e:
                print(f"D1={D1} wpg={wpg} scr_i8={scr_i8}: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)
                continue
            out = cyc_dbg_dp(None, src, snk, pbw, codes,
                             k=k, t_lo=t_lo, t_hi=t_hi, g_step=cfg.pos_bin,
                             pbw_band=1, fuse_tb=True,
                             cnt_bound=D1 * cfg.pos_bin, wpg=wpg,
                             scr_i8=scr_i8)
            # fused-tb output rows >= nT are documented unwritten garbage
            # (pallas_dbg_cyc: "Rows [TT, 128) stay unwritten"); compare
            # only what consumers read
            nT = t_hi - t_lo + 1
            out = (np.asarray(out[0])[:, :nT, :k + t_hi],
                   np.asarray(out[1]), np.asarray(out[2]))
            if ref is None:
                ref = out
                eq = True
            else:
                eq = all(np.array_equal(a, b) for a, b in zip(ref, out))
            print(f"D1={D1} wpg={wpg} scr_i8={scr_i8}: {t*1e3:7.2f}ms "
                  f"equal={eq}", flush=True)


if __name__ == "__main__":
    main()
