#!/usr/bin/env python
"""On-chip stage attribution of the sparse k2 retry step (VERDICT r3
item 6): time consensus_step_sparse truncated after each stage at the
retry shapes the runner actually uses (B=64, depth-bucketed D1).

Stages (cumulative; deltas attribute cost).  Round-4 note: the round-3
form used searchsorted/gather/scatter HLOs (serial element loops on TPU,
~85% of the step); all stages are now fused dense compare-reduces:
  nodes   rolling codes, node unique-sort, src/snk masked sums
  edges   + edge unique-sort, weight-bin masked sums, endpoint codes
  dp      + max-plus scan (two compare-reduces per step) and end picking
  tb      + traceback walk (compare-reduce per step)
  full    + candidate scoring (shared dense stage 4)

Truncated results are meaningless; run on the real chip.
"""

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
    for D1 in (9, 17, 65):
        S, slen, nstr = synth_inputs(B, D1, cfg)
        prev = 0.0
        for ab in ("nodes", "edges", "dp", "tb", ""):
            t = timeit(consensus_step_sparse, S, slen, nstr, ps, pk2, pbw,
                       k=cfg.k2, w=cfg.w, path_delta=cfg.path_delta,
                       e_q6=e_q6_of(cfg), pos_bin=cfg.pos_bin, ablate=ab)
            print(f"B={B} D1={D1} upto={ab or 'full':6s} {t*1e3:7.2f}ms "
                  f"(stage delta {max(t-prev, 0)*1e3:6.2f}ms, "
                  f"{t*1e6/B:6.1f} us/window)", flush=True)
            prev = t


if __name__ == "__main__":
    main()
