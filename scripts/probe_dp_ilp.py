#!/usr/bin/env python
"""On-chip probe (VERDICT r4 next-steps item 3): is the cyc DP chain
latency-bound enough that a SECOND INDEPENDENT dependence chain raises
throughput?

wpg=2 in the production kernel widens every vector op to [2, R, C] — the
chains advance in lockstep inside single wider ops, which tests VPU
throughput, not scheduling slack.  This probe emits the two chains as
SEPARATE [R, C] op streams interleaved in one unrolled step loop, so the
Mosaic scheduler may overlap chain A's dependent ops with chain B's
(ILP across chains, the structure wpg cannot express).

The kernel replicates the production DP step's op mix (packed-key 4x4
add+max over one exposed digit, priority strip, group-boundary clamp,
backpointer pack, XLU transpose every h steps) on synthetic tables —
timing-only, no consensus semantics.  Variants:

  chains=1 mode=solo         the baseline dependence chain
  chains=2 mode=stack        [2, R, C] wide ops (the wpg=2 structure)
  chains=2 mode=interleave   two [R, C] op streams, interleaved emission

Positive result = interleave time(2 chains) well under 2x solo time(1)
AND under stack; that would justify restructuring the production kernel.
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

K = 8
H = K // 2
R = C = 4 ** H
NEG_K = -(2 ** 26)
EW_INVALID = -(2 ** 28)


def _kernel(ew_ref, sc0_ref, out_ref, *, nsteps, chains, mode):
    if mode == "stack":
        sc = sc0_ref[0]                      # [W, R, C]
        bp = jnp.zeros((chains, R, C), jnp.int32)
        for tt in range(1, nsteps + 1):
            q = (K - tt) % K
            std = q >= H
            field = (tt - 1) % H
            if field == 0 and tt > 1:
                sc = jnp.swapaxes(sc, -1, -2)
                bp = jnp.zeros((chains, R, C), jnp.int32)
            if std:
                A_, Bv = 4 ** (K - 1 - q), 4 ** (q - H)
            else:
                A_, Bv = 4 ** (H - 1 - q), 4 ** q
            scv = sc.reshape(chains, A_, 4, Bv, C)
            ew = ew_ref[q % H]               # [16, A*Bv, C]
            keys = []
            for bb in range(4):
                best = None
                for c in range(4):
                    cand = (scv[:, :, c]
                            + ew[c * 4 + bb].reshape(1, A_, Bv, C))
                    best = cand if best is None else jnp.maximum(best, cand)
                keys.append(best)
            key = jnp.stack(keys, axis=2).reshape(sc.shape)
            sc = key & -4
            if field == H - 1 or tt == nsteps:
                sc = jnp.maximum(sc, EW_INVALID)
            bp = bp | ((key & 3) << (2 * field))
        out_ref[0] = sc + bp
    else:                                    # solo / interleave
        scs = [sc0_ref[0, w] for w in range(chains)]
        bps = [jnp.zeros((R, C), jnp.int32) for _ in range(chains)]
        for tt in range(1, nsteps + 1):
            q = (K - tt) % K
            std = q >= H
            field = (tt - 1) % H
            if field == 0 and tt > 1:
                for w in range(chains):
                    scs[w] = jnp.swapaxes(scs[w], -1, -2)
                    bps[w] = jnp.zeros((R, C), jnp.int32)
            if std:
                A_, Bv = 4 ** (K - 1 - q), 4 ** (q - H)
            else:
                A_, Bv = 4 ** (H - 1 - q), 4 ** q
            ew = ew_ref[q % H]
            for w in range(chains):          # interleaved emission
                scv = scs[w].reshape(A_, 4, Bv, C)
                keys = []
                for bb in range(4):
                    best = None
                    for c in range(4):
                        cand = (scv[:, c]
                                + ew[c * 4 + bb].reshape(A_, Bv, C))
                        best = (cand if best is None
                                else jnp.maximum(best, cand))
                    keys.append(best)
                key = jnp.stack(keys, axis=1).reshape(R, C)
                scs[w] = key & -4
                if field == H - 1 or tt == nsteps:
                    scs[w] = jnp.maximum(scs[w], EW_INVALID)
                bps[w] = bps[w] | ((key & 3) << (2 * field))
        out_ref[0] = jnp.stack([scs[w] + bps[w] for w in range(chains)])


@functools.partial(jax.jit, static_argnames=("nsteps", "chains", "mode",
                                             "grid_b"))
def run(ew, sc0, *, nsteps, chains, mode, grid_b):
    return pl.pallas_call(
        functools.partial(_kernel, nsteps=nsteps, chains=chains, mode=mode),
        grid=(grid_b,),
        out_shape=jax.ShapeDtypeStruct((grid_b, chains, R, C), jnp.int32),
        in_specs=[
            pl.BlockSpec((H, 16, R // 4, C), lambda b: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chains, R, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, chains, R, C), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 2 ** 20),
    )(ew, sc0.reshape(grid_b, chains, R, C))


from scripts.profile_step import timeit  # noqa: E402  (axon-flush sync)


def main():
    rng = np.random.default_rng(0)
    nsteps = 36
    NW = 256                                  # windows' worth of chains
    ew = jnp.asarray(rng.integers(EW_INVALID, 2 ** 17,
                                  size=(H, 16, R // 4, C)), jnp.int32)
    print(f"devices: {jax.devices()}", file=sys.stderr)
    print(f"R=C={R} nsteps={nsteps} total_chains={NW}", flush=True)
    base = None
    sc_all = np.asarray(rng.integers(0, 2 ** 20, size=(NW, R, C)), np.int32)
    outs = {}
    for chains, mode in ((1, "solo"), (2, "stack"), (2, "interleave"),
                         (4, "stack"), (4, "interleave")):
        grid_b = NW // chains
        sc0 = jnp.asarray(sc_all.reshape(grid_b, chains, R, C))
        try:
            t = timeit(run, ew, sc0, nsteps=nsteps, chains=chains,
                       mode=mode, grid_b=grid_b)
        except Exception as e:
            print(f"chains={chains} mode={mode:10s} FAILED "
                  f"{type(e).__name__}: {str(e)[:150]}", flush=True)
            continue
        o = np.asarray(run(ew, sc0, nsteps=nsteps, chains=chains,
                           mode=mode, grid_b=grid_b)).reshape(NW, R, C)
        outs[(chains, mode)] = o
        eq = ("n/a" if (1, "solo") not in outs
              else bool(np.array_equal(outs[(1, "solo")], o)))
        if base is None:
            base = t
        print(f"chains={chains} mode={mode:10s} {t*1e3:7.2f}ms "
              f"({t/base:5.2f}x of solo wall) equal_to_solo={eq}",
              flush=True)


if __name__ == "__main__":
    main()
