"""Sparse batched window-consensus device step (the adaptive-k retry pass).

The k2=12 universe (4^12 = 16.7M nodes) is too large for the dense tables of
ops/consensus_step.py, but a window only OBSERVES <= D1*(W'-k+1) ~ 2.4k
k-mers.  This step works in observation space — the TPU-native form of the
reference's sparse ``DebruijnGraph`` at large k (gt1/daccord
``src/daccord.cpp`` adaptive k 8->12; SURVEY §2.1, §7.3 item 6):

- nodes: per-window sorted-unique k-mer codes (two jnp.sorts; BIG-padded)
- src/snk and per-step-bin edge weights: scatter-adds into node/edge slots
  (searchsorted membership; ALGORITHM §4 positional weighting included)
- max-plus DP: gather scores at edge sources, scatter-MAX packed keys
  ``(score+w)*4 + (3-c)`` into edge targets — for a fixed target v and
  first-base c the source u is determined, so the packed key's priority
  bits reproduce the oracle's first-max smallest-c tie rule exactly
- end picking: max score then min node CODE among maxima (first-max by
  code order, matching the sorted-node oracle)
- traceback on node codes; candidate scoring reuses the dense stage 4

Bit-identical to oracle/dbg.py window_consensus at any k
(tests/test_sparse_k2.py); all integer arithmetic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from daccord_tpu.ops.consensus_step import (
    NEG, NEG_HALF, PAD, ConsensusOut, _finish_traceback, _rolling_codes,
    _score_pick,
)

BIGC = jnp.int32(2 ** 30)       # sentinel code > any (k+1)-mer code (k <= 14)


def _unique_sorted(codes: jnp.ndarray) -> jnp.ndarray:
    """Per-row sorted unique values, BIGC-padded to the input width."""
    s = jnp.sort(codes, axis=1)
    first = jnp.concatenate(
        [jnp.ones_like(s[:, :1], bool), s[:, 1:] != s[:, :-1]], axis=1)
    return jnp.sort(jnp.where(first & (s < BIGC), s, BIGC), axis=1)


def _lookup(tables: jnp.ndarray, queries: jnp.ndarray):
    """Batched searchsorted: (slot index clamped, found mask)."""
    idx = jax.vmap(jnp.searchsorted)(tables, queries)
    idxc = jnp.minimum(idx, tables.shape[1] - 1)
    found = jnp.take_along_axis(tables, idxc, axis=1) == queries
    return idxc, found


def _ablate_out(B: int, LC: int, *ts) -> ConsensusOut:
    """Timing-only truncated output: shaped like the real result, data-
    dependent on the stage tensors so nothing is dead-code-eliminated.
    Results are intentionally meaningless; never used in production."""
    acc = jnp.int32(0)
    for t in ts:
        acc = acc + t.sum().astype(jnp.int32)
    ok = jnp.broadcast_to(acc != jnp.int32(-1), (B,))
    length = jnp.broadcast_to(acc & 0, (B,))
    bases = jnp.broadcast_to((acc & 0).astype(jnp.uint8), (B, LC))
    return ConsensusOut(ok=ok, length=length, bases=bases, cost=length)


@functools.partial(jax.jit, static_argnames=("k", "w", "path_delta", "e_q6",
                                             "pos_bin", "ablate"))
def consensus_step_sparse(S: jnp.ndarray, slen: jnp.ndarray,
                          nstr: jnp.ndarray, plq_src: jnp.ndarray,
                          plq_snk: jnp.ndarray, pbw=None, *, k: int, w: int,
                          path_delta: int, e_q6: int = 1_000_000,
                          pos_bin: int = 8, ablate: str = "") -> ConsensusOut:
    """One batched consensus pass at k-mer size k, sparse tables.

    Same contract as consensus_step (S [B, D1, W'], row 0 = A substring);
    intended for the k2 retry pass but exact at any k with 4^(k+1) < 2^30.

    ablate: TIMING-ONLY truncation for on-chip stage attribution (VERDICT
    r3 item 6).  One of 'nodes' (stop after node sort + src/snk scatters),
    'edges' (+ edge sort, endpoint lookups, weight-bin scatters), 'dp'
    (+ max-plus scan and end picking), 'tb' (+ traceback walk); '' = full
    step (+ candidate scoring).  Truncated results are meaningless.
    """
    from daccord_tpu.oracle.offset_likely import PBW_CLAMP
    B, D1, Wp = S.shape
    assert 4 ** (k + 1) < 2 ** 30
    P1 = Wp - k + 1
    P2 = Wp - k
    assert P1 >= 1 and P2 >= 1 and w - k >= 0
    t_exp = w - k
    t_lo = max(0, t_exp - path_delta)
    t_hi = t_exp + path_delta
    nT = t_hi - t_lo + 1
    M1 = 4 ** (k - 1)
    g_step = pos_bin if pbw is not None else max(t_hi, 1)
    NBT = (min(-(-max(t_hi, 1) // g_step), pbw.shape[-1])
           if pbw is not None else 1)

    Si = S.astype(jnp.int32)
    pos1 = jnp.arange(P1, dtype=jnp.int32)
    pos2 = jnp.arange(P2, dtype=jnp.int32)
    dvalid = (jnp.arange(D1, dtype=jnp.int32)[None, :] < nstr[:, None])
    kcodes = _rolling_codes(Si, k, P1)
    kvalid = (pos1[None, None, :] + k <= slen[:, :, None]) & dvalid[:, :, None]
    ecodes = kcodes[..., :P2] * 4 + Si[..., k:k + P2]
    evalid = (pos2[None, None, :] + k + 1 <= slen[:, :, None]) & dvalid[:, :, None]

    Nn = D1 * P1
    Ne = D1 * P2
    b_idx = jnp.arange(B)[:, None]

    LC_ab = k + t_hi
    kf = jnp.where(kvalid, kcodes, BIGC).reshape(B, Nn)
    nodes = _unique_sorted(kf)                            # [B, Nn]
    kidx, _ = _lookup(nodes, kf)                          # invalid -> w=0
    # plq columns shared [W'] or per-window [B, W'] (ALGORITHM §7 v2)
    ps_b = plq_src[None, :P1] if plq_src.ndim == 1 else plq_src[:, :P1]
    pk_b = plq_snk[None, :P1] if plq_snk.ndim == 1 else plq_snk[:, :P1]
    wsrc = jnp.where(kvalid, ps_b[:, None, :], 0).reshape(B, Nn)
    wsnk = jnp.where(kvalid, pk_b[:, None, :], 0).reshape(B, Nn)
    src = jnp.zeros((B, Nn), jnp.int32).at[b_idx, kidx].add(wsrc)
    snk = jnp.zeros((B, Nn), jnp.int32).at[b_idx, kidx].add(wsnk)
    if ablate == "nodes":
        return _ablate_out(B, LC_ab, nodes, src, snk)

    ef = jnp.where(evalid, ecodes, BIGC).reshape(B, Ne)
    eu_all = _unique_sorted(ef)                           # [B, Ne]
    eidx, _ = _lookup(eu_all, ef)
    if pbw is None:
        ones = jnp.where(evalid, 1, 0).reshape(B, Ne)
        wbins = jnp.zeros((B, Ne, 1), jnp.int32
                          ).at[b_idx, eidx, 0].add(ones)
    else:
        pbin = jnp.minimum(pos2 // g_step, pbw.shape[-2] - 1)
        if pbw.ndim == 2:
            pr_p = pbw[pbin][:, :NBT]                      # [P2, NBT]
            rows_full = jnp.broadcast_to(pr_p[None, None], (B, D1, P2, NBT))
        else:                                              # per-window pbw
            pr_p = pbw[:, pbin, :NBT]                      # [B, P2, NBT]
            rows_full = jnp.broadcast_to(pr_p[:, None], (B, D1, P2, NBT))
        rows = jnp.where(evalid.reshape(B, Ne)[:, :, None],
                         rows_full.reshape(B, Ne, NBT), 0)
        wbins = jnp.zeros((B, Ne, NBT), jnp.int32
                          ).at[b_idx, eidx].add(rows)
        wbins = jnp.minimum(wbins, PBW_CLAMP)

    mask_k = (1 << (2 * k)) - 1
    e_u = eu_all >> 2
    e_v = eu_all & mask_k
    e_c = jnp.where(eu_all < BIGC, e_u >> (2 * (k - 1)), 0)
    eui, uok = _lookup(nodes, jnp.where(eu_all < BIGC, e_u, BIGC))
    evi, vok = _lookup(nodes, jnp.where(eu_all < BIGC, e_v, BIGC))
    ekeep = uok & vok & (eu_all < BIGC)
    pr = 3 - e_c
    if ablate == "edges":
        return _ablate_out(B, LC_ab, nodes, src, snk, wbins, eui, evi,
                           ekeep, pr)

    have_src = src.max(axis=1) > 0
    source_slot = jnp.argmax(src, axis=1).astype(jnp.int32)  # first max =
    #                                      smallest slot = smallest code
    score = jnp.full((B, Nn), NEG, jnp.int32).at[
        jnp.arange(B), source_slot].set(jnp.where(have_src, 0, NEG))

    elig = snk > 0

    def pick_end(sc):
        m = jnp.where(elig & (sc > NEG_HALF), sc, NEG)
        mx = m.max(axis=1)
        ok = mx > NEG_HALF
        codesel = jnp.where(m == mx[:, None], nodes, BIGC)
        return jnp.where(ok, codesel.min(axis=1), 0), ok

    def dp_core(sc, jb):
        sc_e = jnp.take_along_axis(sc, eui, axis=1)
        wt = wbins[:, :, jb]
        live = (sc_e > NEG_HALF) & (wt > 0) & ekeep
        key = jnp.where(live, (sc_e + wt) * 4 + pr, NEG)
        kmax = jnp.full((B, Nn), NEG, jnp.int32).at[b_idx, evi].max(key)
        new = jnp.where(kmax > NEG_HALF, kmax >> 2, NEG)
        bp = jnp.where(kmax > NEG_HALF, kmax & 3, 0).astype(jnp.uint8)
        return new, bp

    sc = score
    bps_parts, ends_parts, endok_parts = [], [], []
    for jb in range(NBT):
        seg_lo = jb * g_step + 1
        seg_hi = min((jb + 1) * g_step, t_hi) if jb < NBT - 1 else t_hi
        if seg_lo > t_hi:
            break

        def step_head(s, _, jb=jb):
            n, bp = dp_core(s, jb)
            return n, bp

        def step_tail(s, _, jb=jb):
            n, bp = dp_core(s, jb)
            e, okk = pick_end(n)
            return n, (bp, e, okk)

        n_head = max(0, min(t_lo - 1, seg_hi) - seg_lo + 1)
        n_tail = seg_hi - seg_lo + 1 - n_head
        if n_head:
            sc, bh = jax.lax.scan(step_head, sc, None, length=n_head)
            bps_parts.append(bh)
        if n_tail:
            sc, (bt, et, okt) = jax.lax.scan(step_tail, sc, None,
                                             length=n_tail)
            bps_parts.append(bt)
            ends_parts.append(et)
            endok_parts.append(okt)
    if bps_parts:
        bps = jnp.concatenate(bps_parts, axis=0)             # [t_hi, B, Nn]
    else:
        bps = jnp.zeros((0, B, Nn), jnp.uint8)
    if ends_parts:
        ends_tail = jnp.concatenate(ends_parts, axis=0)
        endok_tail = jnp.concatenate(endok_parts, axis=0)
    else:
        ends_tail = jnp.zeros((0, B), jnp.int32)
        endok_tail = jnp.zeros((0, B), bool)
    if t_lo == 0:
        e0, ok0 = pick_end(score)
        ends = jnp.concatenate([e0[None], ends_tail], axis=0).transpose(1, 0)
        endok = jnp.concatenate([ok0[None], endok_tail],
                                axis=0).transpose(1, 0) & have_src[:, None]
    else:
        ends = ends_tail.transpose(1, 0)                     # [B, nT] CODES
        endok = endok_tail.transpose(1, 0) & have_src[:, None]
    # oracle fails a window with no observed (k+1)-mer edges outright
    # (before any T=0 source-only candidate; oracle/dbg.py "len(e_u) == 0")
    endok &= evalid.reshape(B, -1).any(axis=1)[:, None]
    if ablate == "dp":
        return _ablate_out(B, LC_ab, bps, ends, endok.astype(jnp.int32))

    # ---- traceback on node codes (lax.scan: one compiled body for all
    # steps — an unrolled loop of batched binary searches measured ~150s
    # of XLA compile at k2 shapes) ----
    Ts = jnp.arange(t_lo, t_hi + 1, dtype=jnp.int32)[None, :]

    def tb_step(carry, xs):
        v, bases = carry
        bp_t, tt = xs                                        # bp_t [B, Nn]
        act = tt <= Ts
        slot, _ = _lookup(nodes, v)
        prb = jnp.take_along_axis(bp_t, slot, axis=1)
        c = 3 - prb.astype(jnp.int32)
        col = jnp.where(act, (v & 3), 0).astype(jnp.uint8)
        bases = jax.lax.dynamic_update_slice_in_dim(
            bases, col[:, :, None], tt - 1, axis=2)
        v = jnp.where(act, c * M1 + (v >> 2), v)
        return (v, bases), None

    bases0 = jnp.zeros((B, nT, max(t_hi, 1)), jnp.uint8)
    (v, bases), _ = jax.lax.scan(
        tb_step, (ends, bases0),
        (bps[::-1], jnp.arange(t_hi, 0, -1, dtype=jnp.int32)),
        length=t_hi)
    bases = bases[:, :, :t_hi]
    cands, _ = _finish_traceback(v, bases, k=k, t_lo=t_lo, t_hi=t_hi)
    if ablate == "tb":
        return _ablate_out(B, LC_ab, cands, endok.astype(jnp.int32))
    return _score_pick(S, slen, nstr, cands, endok, k=k, w=w,
                       t_lo=t_lo, t_hi=t_hi, e_q6=e_q6)
