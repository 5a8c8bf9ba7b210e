"""Pallas TPU kernel: heaviest-path max-plus DP with VMEM-resident edges.

SUPERSEDED (kept as the documented design ancestor): production uses
ops/pallas_dbg_cyc.py, whose cycling-digit addressing removes the per-step
relabel that blocks this kernel from lowering on Mosaic (see STATUS at the
bottom of this file); this module still runs bit-exact in interpret mode
and pins the intermediate design point between the XLA scan and the cyc
kernel (tests/test_pallas_dbg.py).

One grid program per window: the window's edge-count tensor ew16 [4,4,M1]
(~512KB) is DMA'd to VMEM ONCE and all t_hi DP steps run against it there —
the XLA scan version re-reads it from HBM every step (36x the traffic, and
HBM bandwidth is the DP's bottleneck; SURVEY §7.1 'speed-of-light' rule).

Semantics are bit-identical to the scan in ops/consensus_step.py (and hence
to the NumPy oracle): first-max ties, NEG clamping, masked end-picking
(ALGORITHM §4).  Backpointers are written to HBM; traceback/scoring stay in
XLA.  Requires t_lo >= 1 (true for all real configs; callers fall back to
the scan otherwise).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -(2 ** 29)
NEG_HALF = -(2 ** 28)


def _dbg_kernel(ew_ref, src_ref, snk_ref, bp_ref, meta_ref,
                *, k: int, t_lo: int, t_hi: int):
    M1 = 4 ** (k - 1)
    M14 = 4 ** (k - 2)
    nT = t_hi - t_lo + 1

    src = src_ref[0]                                    # [4, M1] natural order
    snk = snk_ref[0]

    def argmax_rows(x):
        """(rowmax [R], first-max col index [R]) for int32 [R, C].

        Mosaic has no integer argmax; min-of-matching-iota is equivalent
        (and exactly first-max)."""
        mx = jnp.max(x, axis=1)
        ii = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        cand = jnp.where(x == mx[:, None], ii, x.shape[1])
        return mx, jnp.min(cand, axis=1)

    def argmax_flat(x):
        """(max, first-max flat index) over int32 [4, M1], row-major order."""
        m1, a1 = argmax_rows(x)
        m2, r2 = argmax_rows(m1.reshape(1, 4))
        r = r2[0]
        col = jnp.sum(jnp.where(jnp.arange(4) == r, a1, 0))
        return m2[0], (r * x.shape[1] + col).astype(jnp.int32)

    src_max, src_idx = argmax_flat(src)
    have_src = src_max > 0
    src_c = src_idx // M1
    src_h = src_idx % M1

    # score0: NEG everywhere except the source node (0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (4, M1), 0)
    hh = jax.lax.broadcasted_iota(jnp.int32, (4, M1), 1)
    scr = jnp.where((cc == src_c) & (hh == src_h) & have_src, 0, NEG)

    elig_base = snk > 0

    def pick_end(sc):
        masked = jnp.where(elig_base & (sc > NEG_HALF), sc, NEG)
        mx, idx = argmax_flat(masked)
        return idx, (mx > NEG_HALF) & have_src

    for t in range(1, t_hi + 1):
        # best[bb, h] = max_c scr[c, h] + ew[c, bb, h]
        e0 = ew_ref[0, 0]
        best = scr[0][None, :] + jnp.where(e0 < 0, NEG, e0.astype(jnp.int32))
        bp = jnp.zeros((4, M1), dtype=jnp.uint8)
        for c in range(1, 4):
            ec_ = ew_ref[0, c]
            cand = scr[c][None, :] + jnp.where(ec_ < 0, NEG,
                                               ec_.astype(jnp.int32))
            m = cand > best
            best = jnp.where(m, cand, best)
            bp = jnp.where(m, jnp.uint8(c), bp)
        best = jnp.where(best > NEG_HALF, best, NEG)
        bp_ref[0, t - 1] = bp
        # relabel (bb, h) -> natural (c', h'): [4,4,M14] permute
        scr = best.reshape(4, 4, M14).transpose(1, 2, 0).reshape(4, M1)
        if t >= t_lo:
            idx, okk = pick_end(scr)
            # meta rows: 0 = ends, 1 = endok (aligned [8, 128] block)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            sel = lane == (t - t_lo)
            meta_ref[0, 0:1, :] = jnp.where(sel, idx, meta_ref[0, 0:1, :])
            meta_ref[0, 1:2, :] = jnp.where(sel, okk.astype(jnp.int32),
                                            meta_ref[0, 1:2, :])


@functools.partial(jax.jit,
                   static_argnames=("k", "t_lo", "t_hi", "interpret"))
def pallas_dbg_dp(ew16: jnp.ndarray, src: jnp.ndarray, snk: jnp.ndarray,
                  *, k: int, t_lo: int, t_hi: int, interpret: bool = False):
    """(bps [t_hi,B,4,M1] u8, ends [B,nT] i32, endok [B,nT] bool).

    ew16: int16 [B, 4, 4, M1] (-1 = no edge); src/snk: int32 [B, 4**k].
    """
    assert t_lo >= 1
    B = ew16.shape[0]
    M1 = 4 ** (k - 1)
    nT = t_hi - t_lo + 1
    src4 = src.reshape(B, 4, M1)
    snk4 = snk.reshape(B, 4, M1)
    bp, meta = pl.pallas_call(
        functools.partial(_dbg_kernel, k=k, t_lo=t_lo, t_hi=t_hi),
        grid=(B,),
        out_shape=(
            jax.ShapeDtypeStruct((B, t_hi, 4, M1), jnp.uint8),
            jax.ShapeDtypeStruct((B, 8, 128), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec((1, 4, 4, M1), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, M1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, M1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, t_hi, 4, M1), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(ew16, src4, snk4)
    ends = meta[:, 0, :nT]
    endok = meta[:, 1, :nT] != 0
    # match the scan outputs: bps [t_hi, B, 4, M1]
    return bp.transpose(1, 0, 2, 3), ends, endok


# STATUS / TODO (round 1): bit-identical to the scan in interpret mode
# (tests/test_pallas_dbg.py).  On-chip Mosaic currently rejects the per-step
# digit-rotation relabel (a perfect-shuffle reshape: "infer-vector-layout:
# unsupported shape cast"), so the production DP remains the XLA scan in
# consensus_step.py.  Known fix for a future round: the cycling-digit
# addressing scheme — store scores addressed by a rotating char->digit map so
# each step reduces over ONE address digit (pure reshape+reduce, no lane
# shuffle) and pre-permute the (k+1)-mer table into the k phase layouts
# (XLA transposes, done once per batch).
