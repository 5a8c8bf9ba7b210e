"""Pallas TPU kernel: batched unit-cost edit distance (wavefront row-scan).

The banded-DP device kernel of SURVEY §7.1: thousands of small Levenshtein
problems are batched with the problem axis on VPU *lanes* (128 per grid
program) and the DP row on sublanes; the whole row state lives in VMEM for
all LA steps, so HBM traffic is one read of the inputs and one write of the
distances (the XLA scan version round-trips the row through HBM every step).

The in-row left-dependency ``new[j] = min_{j'<=j}(tmp[j'] + j - j')`` is a
prefix-min computed with log2(LB) shift+min steps on the (j - j')-adjusted
values — associative and exact in int32 (ALGORITHM §1 semantics; bit-equal
to align.editdp.batch_edit_distance, tested).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128
BIG = 1 << 20  # python int: jnp scalars would be captured consts in pallas


def _edit_kernel(At_ref, Bt_ref, la_ref, lb_ref, out_ref, *, LA: int, LB: int):
    T = TILE
    jr = jax.lax.broadcasted_iota(jnp.int32, (LB + 1, T), 0)
    la = la_ref[0, :]                                   # [T]
    lb = lb_ref[0, :]
    row = jr                                            # D[0][j] = j
    lb_onehot = (jr == lb[None, :]).astype(jnp.int32)   # capture mask
    out = jnp.where(la == 0, lb, 0).astype(jnp.int32)   # la==0 -> lb
    Bt = Bt_ref[:, :]                                   # [LB, T]

    for i in range(1, LA + 1):
        ai = At_ref[i - 1, :]                           # [T]
        sub = (ai[None, :] != Bt).astype(jnp.int32)     # [LB, T]
        tmp = jnp.minimum(row[:-1, :] + sub, row[1:, :] + 1)
        head = jnp.full((1, T), i, dtype=jnp.int32)
        acc = jnp.concatenate([head, tmp], axis=0) - jr
        # prefix-min along j (axis 0): log-shift
        sh = 1
        while sh <= LB:
            shifted = jnp.concatenate(
                [jnp.full((sh, T), BIG, dtype=jnp.int32), acc[:-sh, :]], axis=0)
            acc = jnp.minimum(acc, shifted)
            sh *= 2
        row = acc + jr
        at_lb = (row * lb_onehot).sum(axis=0)           # row[lb] per column
        out = jnp.where(la == i, at_lb, out)
    out_ref[0, :] = out


@functools.partial(jax.jit, static_argnames=("interpret",))
def _edit_call(At, Bt, la2, lb2, *, interpret=False):
    LA, N = At.shape
    LB = Bt.shape[0]
    grid = (N // TILE,)
    return pl.pallas_call(
        functools.partial(_edit_kernel, LA=LA, LB=LB),
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((LA, TILE), lambda p: (0, p), memory_space=pltpu.VMEM),
            pl.BlockSpec((LB, TILE), lambda p: (0, p), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda p: (0, p), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda p: (0, p), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE), lambda p: (0, p),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(At, Bt, la2, lb2)


def pallas_batch_edit_distance(A: np.ndarray, la: np.ndarray,
                               B: np.ndarray, lb: np.ndarray,
                               interpret: bool = False) -> np.ndarray:
    """Drop-in for align.editdp.batch_edit_distance (int32 [N])."""
    A = np.asarray(A)
    B = np.asarray(B)
    N, LA = A.shape
    LB = B.shape[1]
    Np = ((N + TILE - 1) // TILE) * TILE
    At = np.full((LA, Np), 4, dtype=np.int32)
    Bt = np.full((LB, Np), 5, dtype=np.int32)  # different pads: never match
    At[:, :N] = A.T
    Bt[:, :N] = B.T
    la2 = np.zeros((1, Np), dtype=np.int32)
    lb2 = np.zeros((1, Np), dtype=np.int32)
    la2[0, :N] = la
    lb2[0, :N] = lb
    out = _edit_call(At, Bt, la2, lb2, interpret=interpret)
    return np.asarray(out)[0, :N].astype(np.int32)
