#!/usr/bin/env python
"""On-chip probe: per-step int8 priority scratch (pri_tb) vs 2-bit group
packing in the cyc kernel's fused traceback, at the bench shapes.
Timing + equality (the pri_tb outputs must match the default path)."""

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
    for D1 in (9, 65):
        S, slen, nstr = synth_inputs(B, D1, cfg)
        src, snk, codes = j_tables(S, slen, nstr, plq_src, plq_snk)
        jax.block_until_ready((src, snk, codes))
        nT = t_hi - t_lo + 1
        ref = None
        wpgs = (1, 2) if D1 == 9 else (2, 1)
        for wpg in wpgs:
            for pri in (False, True):
                kw = dict(k=k, t_lo=t_lo, t_hi=t_hi, g_step=cfg.pos_bin,
                          pbw_band=1, fuse_tb=True,
                          cnt_bound=D1 * cfg.pos_bin, wpg=wpg, pri_tb=pri)
                try:
                    t = timeit(cyc_dbg_dp, None, src, snk, pbw, codes, **kw)
                except Exception as e:
                    print(f"D1={D1} wpg={wpg} pri={pri}: FAILED "
                          f"{type(e).__name__}: {str(e)[:200]}", flush=True)
                    continue
                o = cyc_dbg_dp(None, src, snk, pbw, codes, **kw)
                out = (np.asarray(o[0])[:, :nT, :k + t_hi],
                       np.asarray(o[1]), np.asarray(o[2]))
                # the equality reference is pinned to a NON-pri run: if the
                # first non-pri config failed, a pri-vs-pri comparison would
                # print vacuous equal=True and mask the divergence this
                # probe exists to catch
                if ref is None and not pri:
                    ref, eq = out, "True(ref)"
                elif ref is None:
                    eq = "n/a"
                else:
                    eq = all(np.array_equal(a, b) for a, b in zip(ref, out))
                print(f"D1={D1} wpg={wpg} pri={pri}: {t*1e3:7.2f}ms "
                      f"equal={eq}", flush=True)


if __name__ == "__main__":
    main()
