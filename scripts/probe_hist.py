#!/usr/bin/env python
"""On-chip probe: in-kernel histogram dot operand dtype (bf16 vs int8) at
the deep shapes where the histogram stage walls the 40-60x regime
(VERDICT r4 next-steps item 1a: 7.06 of 22.13 ms/batch at D1=65).

int8 one-hot operands are exact (0/1) and v5e's MXU lists 2x int8
throughput — IF Mosaic lowers s8xs8->s32 dots natively.  Equality is
asserted against the bf16 path (counts < 2^24 are exact both ways)."""

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
    B = 256
    nT = t_hi - t_lo + 1
    for D1 in (33, 49, 65):
        S, slen, nstr = synth_inputs(B, D1, cfg)
        src, snk, codes = j_tables(S, slen, nstr, plq_src, plq_snk)
        jax.block_until_ready((src, snk, codes))
        deep = D1 * cfg.pos_bin > 256
        wpg = 2 if deep else 1
        ref = None
        for hi8 in (False, True):
            kw = dict(k=k, t_lo=t_lo, t_hi=t_hi, g_step=cfg.pos_bin,
                      pbw_band=1, fuse_tb=True, cnt_bound=D1 * cfg.pos_bin,
                      wpg=wpg, hist_i8=hi8)
            try:
                t = timeit(cyc_dbg_dp, None, src, snk, pbw, codes, **kw)
            except Exception as e:
                print(f"D1={D1} wpg={wpg} hist_i8={hi8}: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)
                continue
            o = cyc_dbg_dp(None, src, snk, pbw, codes, **kw)
            out = (np.asarray(o[0])[:, :nT, :k + t_hi],
                   np.asarray(o[1]), np.asarray(o[2]))
            if ref is None and not hi8:
                ref, eq = out, "True(ref)"
            elif ref is None:
                eq = "n/a"
            else:
                eq = all(np.array_equal(a, b) for a, b in zip(ref, out))
            print(f"D1={D1} wpg={wpg} hist_i8={hi8}: {t*1e3:7.2f}ms "
                  f"equal={eq}", flush=True)


if __name__ == "__main__":
    main()
