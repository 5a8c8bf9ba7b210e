#!/usr/bin/env python
"""On-chip stage attribution of the PRODUCTION cyc kernel (codes mode, mix,
fused traceback) via the kernel's timing-only `ablate` flags.

Cumulative removals at the bench shape tell where the ~66us/window goes:
  full                 the production kernel
  notb                 - fused traceback walk
  notb+noend           - end-picking (kept only at the final step)
  notb+noend+mix1      - positional mix refreshes (bin-0 tables reused)
  notb+noend+hist1     - (mix1 implied) histogram builds beyond bin 0

Run on the real chip; results of ablated variants are intentionally wrong.
"""

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
    g_step = cfg.pos_bin

    j_tables = jax.jit(lambda *a: cs._build_tables(
        *a, pbw, k=k, t_hi=t_hi, pos_bin=cfg.pos_bin, edges_layout="codes"))

    import os
    wpg = int(os.environ.get("ABLATE_WPG", "2"))
    print(f"devices: {jax.devices()} wpg={wpg}", file=sys.stderr)
    for (B, D1) in [(256, 9), (256, 65)]:
        S, slen, nstr = synth_inputs(B, D1, cfg)
        src, snk, codes = j_tables(S, slen, nstr, plq_src, plq_snk)
        jax.block_until_ready((src, snk, codes))
        for ab in ["", "notb", "notb+noend", "notb+noend+mix1",
                   "notb+noend+hist1"]:
            t = timeit(cyc_dbg_dp, None, src, snk, pbw, codes,
                       k=k, t_lo=t_lo, t_hi=t_hi, g_step=g_step,
                       pbw_band=1, fuse_tb=True, ablate=ab,
                       cnt_bound=D1 * cfg.pos_bin, wpg=wpg)
            print(f"B={B} D1={D1} wpg={wpg} ablate={ab or 'full':20s} "
                  f"{t*1e3:7.2f}ms", flush=True)


if __name__ == "__main__":
    main()
