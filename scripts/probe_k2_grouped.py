#!/usr/bin/env python
"""On-chip A/B of the round-5 sqrt-factored k2 DP (dp_mode='grouped') vs
the round-4 full compare-reduce form (dp_mode='flat'), at the retry
shapes the runner dispatches (B=64, depth-bucketed D1), with an output
equality check (both modes must be bit-identical) and a grouped-mode
stage split via the ablate flags."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from daccord_tpu.ops.sparse_k2 import consensus_step_sparse
from daccord_tpu.pipeline.batcher import e_q6_of
from daccord_tpu.utils.config import DaccordConfig
from scripts.profile_step import synth_inputs, timeit


def main():
    cfg = DaccordConfig()
    from daccord_tpu.oracle.consensus import build_pbw, build_plq
    from daccord_tpu.oracle.eprof import ErrorProfile
    prof = ErrorProfile(0.03, 0.08, 0.04)
    plq = build_plq(prof, cfg)
    pbw = build_pbw(prof, cfg)
    ps = np.ascontiguousarray(plq[:cfg.wprime, 0], np.int32)
    pk2 = np.ascontiguousarray(plq[:cfg.wprime, cfg.w - cfg.k2], np.int32)
    print(f"devices: {jax.devices()}", file=sys.stderr)
    B = int(os.environ.get("K2_BS", "64"))
    kw = dict(k=cfg.k2, w=cfg.w, path_delta=cfg.path_delta,
              e_q6=e_q6_of(cfg), pos_bin=cfg.pos_bin)
    for D1 in (9, 17, 33, 49, 65):
        S, slen, nstr = synth_inputs(B, D1, cfg)
        res = {}
        for mode in ("flat", "grouped", "grouped_limb"):
            t = timeit(consensus_step_sparse, S, slen, nstr, ps, pk2, pbw,
                       dp_mode=mode, **kw)
            o = consensus_step_sparse(S, slen, nstr, ps, pk2, pbw,
                                      dp_mode=mode, **kw)
            res[mode] = tuple(np.asarray(x) for x in o)
            print(f"B={B} D1={D1} {mode:12s} {t*1e3:7.2f}ms "
                  f"({t*1e6/B:6.1f} us/window)", flush=True)
        eq = all(all(np.array_equal(a, b)
                     for a, b in zip(res["flat"], res[m]))
                 for m in ("grouped", "grouped_limb"))
        print(f"B={B} D1={D1} equal={eq}", flush=True)
        if not eq:
            sys.exit(1)
        prev = 0.0
        for ab in ("nodes", "edges", "dp", "tb", ""):
            t = timeit(consensus_step_sparse, S, slen, nstr, ps, pk2, pbw,
                       ablate=ab, **kw)
            print(f"  grouped upto={ab or 'full':6s} {t*1e3:7.2f}ms "
                  f"(delta {max(t-prev, 0)*1e3:6.2f}ms)", flush=True)
            prev = t


if __name__ == "__main__":
    main()
