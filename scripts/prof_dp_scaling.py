#!/usr/bin/env python
"""DP-stage scaling probe: fixed-overhead floor vs per-batch compute.

Times a trivial op, then the DP stage at several batch sizes, for scan and
cyc.  If time is flat in B, dispatch/tunnel overhead dominates; if linear,
it's real device compute.  Run on the real chip.
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
from scripts.profile_step import _sync, timeit, synth_inputs


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

    triv = jax.jit(lambda x: x + 1)
    x = jnp.zeros((256, 256), jnp.int32)
    print(f"trivial: {timeit(triv, x)*1e3:7.2f}ms", flush=True)

    for impl in ("scan", "cyc"):
        layout = "phases" if impl.startswith("cyc") else "natural"
        j_tables = jax.jit(lambda *a, layout=layout: cs._build_tables(
            *a, None, k=k, t_hi=t_hi, edges_layout=layout))
        def _dp_arrays(e, s, n):
            (_t, bps), ends, endok = cs._dp(e, s, n, k=k, t_lo=t_lo,
                                            t_hi=t_hi, g_step=t_hi,
                                            dp_impl=impl)
            return bps, ends, endok
        j_dp = jax.jit(_dp_arrays)
        for B in (32, 64, 128, 256):
            S, slen, nstr = synth_inputs(B, 9, cfg)
            src, snk, ecn = j_tables(S, slen, nstr, plq_src, plq_snk)
            t = timeit(j_dp, ecn, src, snk)
            print(f"{impl} B={B}: {t*1e3:7.2f}ms  ({t/B*1e6:.1f} us/win)",
                  flush=True)


if __name__ == "__main__":
    main()
