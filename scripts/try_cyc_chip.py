"""On-chip trial of the cycling-digit DBG kernel at production shapes.

Runs scan and cyc paths on the real chip at k=8/w=40 and compares outputs
bit-for-bit.  Also times both DP stages.  Not a pytest test (needs the chip).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from daccord_tpu.oracle.consensus import build_plq
from daccord_tpu.oracle.eprof import ErrorProfile
from daccord_tpu.pipeline.batcher import pack_windows
from daccord_tpu.ops.consensus_step import consensus_step
from daccord_tpu.utils.config import DaccordConfig

CFG = DaccordConfig()  # w=40 k=8 path_delta=4
PLQ = build_plq(ErrorProfile(0.03, 0.08, 0.04), CFG)


def piles(rng, nwin, depth):
    out = []
    for _ in range(nwin):
        truth = rng.integers(0, 4, size=CFG.w).astype(np.uint8)
        strings = [truth.copy()]
        for _ in range(depth):
            s = []
            for b in truth:
                if rng.random() < 0.04:
                    continue
                s.append(b if rng.random() > 0.03 else int(rng.integers(0, 4)))
                if rng.random() < 0.08:
                    s.append(int(rng.integers(0, 4)))
            strings.append(np.array(s[:CFG.wprime], dtype=np.uint8))
        out.append(strings)
    return out


def run(S, slen, nstr, ps, pk, impl, pbw=None):
    return consensus_step(S, slen, nstr, ps, pk, pbw, k=CFG.k, w=CFG.w,
                          path_delta=CFG.path_delta, dp_impl=impl,
                          pos_bin=CFG.pos_bin)


def main():
    impls = sys.argv[1:] or ["cyc"]
    pbw = None
    if impls and impls[0] == "--pbw":
        # WEIGHTED on-chip equality: the production mix/codes path
        # (positional edge weighting) vs the scan reference
        impls = impls[1:] or ["cyc"]
        from daccord_tpu.oracle.consensus import build_pbw
        pbw = build_pbw(ErrorProfile(0.03, 0.08, 0.04), CFG)
    rng = np.random.default_rng(7)
    B = 64
    S, slen, nstr = pack_windows(piles(rng, B, 20), CFG, B)
    ps = np.ascontiguousarray(PLQ[:CFG.wprime, 0], dtype=np.int32)
    pk = np.ascontiguousarray(PLQ[:CFG.wprime, CFG.w - CFG.k], dtype=np.int32)

    a = run(S, slen, nstr, ps, pk, "scan", pbw)
    a.ok.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(5):
        a = run(S, slen, nstr, ps, pk, "scan", pbw)
        a.ok.block_until_ready()
    t_scan = (time.perf_counter() - t0) / 5
    print(f"scan: {t_scan*1e3:.2f} ms/batch({B})")

    for impl in impls:
        try:
            b = run(S, slen, nstr, ps, pk, impl, pbw)
            b.ok.block_until_ready()
        except Exception as e:
            print(f"{impl}: FAILED {type(e).__name__}: {str(e)[:500]}")
            continue
        eq = all(np.array_equal(np.asarray(getattr(a, f)),
                                np.asarray(getattr(b, f)))
                 for f in ("ok", "length", "bases", "cost"))
        t0 = time.perf_counter()
        for _ in range(5):
            b = run(S, slen, nstr, ps, pk, impl, pbw)
            b.ok.block_until_ready()
        t_i = (time.perf_counter() - t0) / 5
        print(f"{impl}: {t_i*1e3:.2f} ms/batch({B})  equal={eq}  "
              f"speedup={t_scan/t_i:.2f}x")


if __name__ == "__main__":
    main()
