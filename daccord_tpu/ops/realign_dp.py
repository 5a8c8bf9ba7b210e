"""Device trace-block realignment: batched Df/Db row-scans + argmin maps.

HOT LOOP 1 (SURVEY §3.1) on the TPU: computes the pinned A->B position map
of ALGORITHM §1 (bpos[x] = leftmost j with Dfwd(x,j)+Dbwd(x,j) = dist) for
tens of thousands of trace blocks in one call.

Layout: problems on VPU lanes ([LB+1, N] int16 rows; the row-scan is the
same wavefront-with-prefix-min used by the consensus scoring kernel).  The
full row history is stacked to HBM ([LA+1, LB+1, N] int16, ~1-2GB for a
full dataset's blocks) and the rows needed at the window-boundary lattice
positions are gathered afterwards — compute-dense, no data-dependent
control flow.

Bit-identical to align.editdp.batch_bpos_at / the native C++ kernel
(tests/test_realign_dp.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

BIGD = jnp.int16(2 ** 14)


def _fill_rows(At, Bt, LB):
    """Stacked DP rows [LA+1, LB+1, N] int16 for At [LA, N], Bt [LB, N]."""
    LA, N = At.shape
    jr = jnp.arange(LB + 1, dtype=jnp.int16)[:, None]
    row0 = jnp.broadcast_to(jr, (LB + 1, N)).astype(jnp.int16)

    def step_i(carry, ai_i):
        row, i = carry
        ai = ai_i
        sub = (ai[None, :] != Bt).astype(jnp.int16)
        tmp = jnp.minimum(row[:-1] + sub, row[1:] + jnp.int16(1))
        head = jnp.full((1, N), 0, jnp.int16) + (i + 1).astype(jnp.int16)
        t2 = jnp.concatenate([head, tmp], axis=0) - jr
        acc = jax.lax.associative_scan(jnp.minimum, t2, axis=0)
        new = acc + jr
        return (new, i + 1), new

    (_, _), rows = jax.lax.scan(step_i, (row0, jnp.int16(0)), At)
    return jnp.concatenate([row0[None], rows], axis=0)       # [LA+1, LB+1, N]


@functools.partial(jax.jit, static_argnames=())
def _bpos_kernel(At, Bt, Art, Brt, la, lb, X):
    """(bpos [N, PX] int32).  At/Bt: [LA|LB, N] uint8 (padded, forward);
    Art/Brt: reversed-padded; la/lb [N] int32; X [N, PX] int32 (clipped)."""
    LA, N = At.shape
    LB = Bt.shape[0]
    PX = X.shape[1]
    Df = _fill_rows(At, Bt, LB)                              # [LA+1, LB+1, N]
    Dr = _fill_rows(Art, Brt, LB)

    # gather the lattice rows: capf[p, :, n] = Df[X[n, p], :, n]
    Xc = jnp.minimum(X, la[:, None]).astype(jnp.int32)       # [N, PX]
    idxf = jnp.broadcast_to(Xc.transpose(1, 0)[:, None, :], (PX, LB + 1, N))
    capf = jnp.take_along_axis(Df, idxf, axis=0)             # [PX, LB+1, N]
    idxb = jnp.broadcast_to(
        jnp.clip(la[None, :] - Xc.transpose(1, 0), 0, LA)[:, None, :],
        (PX, LB + 1, N))
    capb = jnp.take_along_axis(Dr, idxb, axis=0)             # [PX, LB+1, N]

    # Dbwd(x, j) = Dr[la-x, lb-j]: reverse-shift columns per problem
    jj = jnp.arange(LB + 1, dtype=jnp.int32)[None, :, None]
    cols = lb[None, None, :] - jj                            # [1, LB+1, N]
    colsc = jnp.clip(cols, 0, LB)
    capb_sh = jnp.take_along_axis(
        capb, jnp.broadcast_to(colsc, (PX, LB + 1, N)), axis=1)
    tot = capf + capb_sh
    tot = jnp.where(cols >= 0, tot, BIGD)
    # first-min argmin over j (axis 1)
    return jnp.argmin(tot, axis=1).astype(jnp.int32).transpose(1, 0)  # [N,PX]


def device_bpos_at(A: np.ndarray, la: np.ndarray, B: np.ndarray,
                   lb: np.ndarray, X: np.ndarray,
                   chunk: int = 16384) -> np.ndarray:
    """Drop-in for align.editdp.batch_bpos_at, computed on the device.

    Pads N up to a lane multiple and chunks very large batches to bound the
    [LA+1, LB+1, N] row-history memory (int16; ~LA*LB*2 bytes per problem).
    """
    A = np.ascontiguousarray(A, dtype=np.uint8)
    B = np.ascontiguousarray(B, dtype=np.uint8)
    N, LA0 = A.shape
    LB0 = B.shape[1]
    PX0 = X.shape[1]
    # stabilize compiled shapes: round LA/LB/PX up to a coarse menu so
    # different datasets / read ranges reuse the same executable
    LA = ((LA0 + 31) // 32) * 32
    LB = ((LB0 + 31) // 32) * 32
    PX = ((PX0 + 3) // 4) * 4
    A = np.pad(A, ((0, 0), (0, LA - LA0)), constant_values=4)
    B = np.pad(B, ((0, 0), (0, LB - LB0)), constant_values=4)
    X = np.pad(np.asarray(X), ((0, 0), (0, PX - PX0)))
    out = np.zeros((N, PX), dtype=np.int64)
    for off in range(0, N, chunk):
        sl = slice(off, min(off + chunk, N))
        n = sl.stop - sl.start
        # power-of-two lane padding: bounded set of compiled shapes
        npad = max(128, 1 << (n - 1).bit_length())
        At = np.full((LA, npad), 4, np.uint8)
        Bt = np.full((LB, npad), 5, np.uint8)
        At[:, :n] = A[sl].T
        Bt[:, :n] = B[sl].T
        lar = np.asarray(la[sl], dtype=np.int32)
        lbr = np.asarray(lb[sl], dtype=np.int32)
        la2 = np.zeros(npad, np.int32)
        lb2 = np.zeros(npad, np.int32)
        la2[:n] = lar
        lb2[:n] = lbr
        # reversed-padded copies (host-side prep, vectorized)
        Ar = _rev_pad(A[sl], lar, LA)
        Br = _rev_pad(B[sl], lbr, LB)
        Art = np.full((LA, npad), 4, np.uint8)
        Brt = np.full((LB, npad), 5, np.uint8)
        Art[:, :n] = Ar.T
        Brt[:, :n] = Br.T
        X2 = np.zeros((npad, PX), np.int32)
        X2[:n] = np.asarray(X[sl], dtype=np.int32)
        res = np.asarray(_bpos_kernel(At, Bt, Art, Brt, la2, lb2, X2))
        out[sl] = res[:n]
    return out[:, :PX0]


def _rev_pad(Xarr: np.ndarray, lx: np.ndarray, L: int) -> np.ndarray:
    n = Xarr.shape[0]
    idx = lx[:, None].astype(np.int64) - 1 - np.arange(L)[None, :]
    return np.where(idx >= 0,
                    Xarr[np.arange(n)[:, None], np.maximum(idx, 0)],
                    4).astype(np.uint8)
