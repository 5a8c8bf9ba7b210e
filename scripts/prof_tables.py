#!/usr/bin/env python
"""Sub-stage attribution inside the weighted tables stage (cyc layout).

Times, at the bench shape (B=256, D1=9): the one-hot construction, the 4
phase H einsums alone, the mix+key-pack alone (from materialized H), and the
fused whole — to locate the positional-weighting premium seen in
profile_step.py (tables: 12ms unweighted vs 29ms weighted).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from daccord_tpu.ops import consensus_step as cs
from daccord_tpu.ops.pallas_dbg_cyc import phase_digit_seq
from daccord_tpu.oracle.offset_likely import PBW_CLAMP
from daccord_tpu.utils.config import DaccordConfig
from scripts.profile_step import synth_inputs, timeit  # noqa: E402


def main():
    cfg = DaccordConfig(batch_windows=256)
    from daccord_tpu.oracle.eprof import ErrorProfile
    from daccord_tpu.oracle.consensus import build_pbw, build_plq
    prof = ErrorProfile(0.03, 0.08, 0.04)
    plq = build_plq(prof, cfg)
    pbw_np = build_pbw(prof, cfg)
    k, w, pd = cfg.k, cfg.w, cfg.path_delta
    t_hi = w - k + pd
    B, D1 = 256, 9
    Wp = cfg.wprime
    P2 = Wp - k
    g = cfg.pos_bin
    nbp = -(-P2 // g)
    nbt = min(-(-t_hi // g), pbw_np.shape[-1])
    h2 = k // 2
    s = (k + 2) // 2
    eb = k + 1
    pbw = jnp.asarray(pbw_np)

    S, slen, nstr = synth_inputs(B, D1, cfg)

    def onehots(S, slen, nstr):
        Si = S.astype(jnp.int32)
        pos2 = jnp.arange(P2, dtype=jnp.int32)
        dvalid = (jnp.arange(D1, dtype=jnp.int32)[None, :] < nstr[:, None])
        kc = cs._rolling_codes(Si, k, Wp - k + 1)
        ecodes = kc[..., :P2] * 4 + Si[..., k:k + P2]
        evalid = (pos2[None, None, :] + k + 1 <= slen[:, :, None]) & dvalid[:, :, None]
        ppad = nbp * g
        ecp = jnp.pad(ecodes, ((0, 0), (0, 0), (0, ppad - P2)))
        evp = jnp.pad(evalid, ((0, 0), (0, 0), (0, ppad - P2)))
        eci = (ecp.reshape(B, D1, nbp, g).transpose(0, 2, 1, 3)
               .reshape(B, nbp, D1 * g))
        emi = (evp.reshape(B, D1, nbp, g).transpose(0, 2, 1, 3)
               .reshape(B, nbp, D1 * g))
        emi_b = emi[..., None].astype(jnp.bfloat16)
        outs = []
        for j in range(h2):
            seq = phase_digit_seq(k, j)
            row = jnp.zeros_like(eci)
            col = jnp.zeros_like(eci)
            for i, dpos in enumerate(seq):
                d = (eci >> (2 * dpos)) & 3
                if i < s:
                    row = (row << 2) | d
                else:
                    col = (col << 2) | d
            ehi = (row[..., None] == jnp.arange(4 ** s, dtype=jnp.int32)
                   ).astype(jnp.bfloat16) * emi_b
            elo = (col[..., None] == jnp.arange(4 ** (k + 1 - s), dtype=jnp.int32)
                   ).astype(jnp.bfloat16)
            outs.append((ehi, elo))
        return outs

    j_oh = jax.jit(onehots)

    def h_only(S, slen, nstr):
        outs = []
        for ehi, elo in onehots(S, slen, nstr):
            outs.append(jnp.einsum("bngh,bngl->bnhl", ehi, elo,
                                   preferred_element_type=jnp.float32))
        return outs

    j_h = jax.jit(h_only)

    def h_bf16(S, slen, nstr):
        outs = []
        for ehi, elo in onehots(S, slen, nstr):
            outs.append(jnp.einsum("bngh,bngl->bnhl", ehi, elo,
                                   preferred_element_type=jnp.float32
                                   ).astype(jnp.bfloat16))
        return outs

    j_hb = jax.jit(h_bf16)

    rows_iota = np.arange(4 ** s, dtype=np.int32)[:, None]
    pr_np = 3 - (rows_iota >> (2 * (s - 1)))

    def mixpack(Hs):
        pr = jnp.asarray(pr_np)
        outs = []
        for Hp in Hs:
            pbw_f = pbw[:nbp, :nbt].astype(Hp.dtype)
            W = jnp.einsum("ij,birc->bjrc", pbw_f, Hp,
                           preferred_element_type=jnp.float32).astype(jnp.int32)
            W = jnp.minimum(W, PBW_CLAMP)
            key = jnp.where(W > 0, (W << 2) + pr, 0).astype(jnp.uint16)
            outs.append(key)
        return outs

    j_mp = jax.jit(mixpack)

    print(f"devices: {jax.devices()}", file=sys.stderr)
    t_oh = timeit(j_oh, S, slen, nstr)
    t_h = timeit(j_h, S, slen, nstr)
    t_hb = timeit(j_hb, S, slen, nstr)
    Hs32 = j_h(S, slen, nstr)
    Hs16 = j_hb(S, slen, nstr)
    t_mp32 = timeit(j_mp, Hs32)
    t_mp16 = timeit(j_mp, Hs16)
    print(f"onehots={t_oh*1e3:7.2f}ms  H_f32={t_h*1e3:7.2f}ms  "
          f"H_bf16={t_hb*1e3:7.2f}ms  mixpack_f32={t_mp32*1e3:7.2f}ms  "
          f"mixpack_bf16={t_mp16*1e3:7.2f}ms")


if __name__ == "__main__":
    main()
