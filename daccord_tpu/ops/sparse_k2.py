"""Sparse batched window-consensus device step (the adaptive-k retry pass).

The k2=12 universe (4^12 = 16.7M nodes) is too large for the dense tables of
ops/consensus_step.py, but a window only OBSERVES <= D1*(W'-k+1) ~ 2.4k
k-mers.  This step works in observation space — the TPU-native form of the
reference's sparse ``DebruijnGraph`` at large k (gt1/daccord
``src/daccord.cpp`` adaptive k 8->12; SURVEY §2.1, §7.3 item 6):

- nodes: per-window sorted-unique k-mer codes (two jnp.sorts; BIG-padded)
- src/snk and per-step-bin edge weights: dense compare-reduce over codes
  (ALGORITHM §4 positional weighting included)
- max-plus DP over packed keys ``(score+w)*4 + (3-c)`` — for a fixed
  target v and first-base c the source u is determined, so the packed
  key's priority bits reproduce the oracle's first-max smallest-c tie
  rule exactly
- end picking: max score then min node CODE among maxima (first-max by
  code order, matching the sorted-node oracle)
- traceback on node codes; candidate scoring reuses the dense stage 4

NO data-dependent gathers/scatters/searchsorteds anywhere (round 4): the
round-3 form used searchsorted membership + per-step
``take_along_axis``/``.at[].max``, and the on-chip stage ablation
(scripts/ablate_k2.py, BENCH r4 notes) showed those HLOs lower to
SERIAL element loops on TPU — ~150us per [B, Ne]-sized op, 85% of the
step's 404us/window at the common D1=9 retry shape.  Every index-space
operation is instead a fused dense compare-reduce over the code arrays
([B, Ne, Nn] broadcast compare + select + max/sum, which XLA fuses into
one streaming pass): "gather score at edge source" becomes
``max_n where(nodes == e_u, sc)``, "scatter-max into targets" becomes
``max_e where(e_v == nodes, key)``, and the src/snk/weight-bin
scatter-adds become masked sums over positions.  All arithmetic stays
int32; one slot matches per real code, so every reduce sees exactly the
round-3 value — bit-identical by construction and by test.

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
    r3 item 6).  One of 'nodes' (stop after node sort + src/snk sums),
    'edges' (+ edge sort, weight-bin sums, endpoint codes), 'dp'
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

    LC_ab = k + t_hi
    kf = jnp.where(kvalid, kcodes, BIGC).reshape(B, Nn)
    nodes = _unique_sorted(kf)                            # [B, Nn]
    # plq columns shared [W'] or per-window [B, W'] (ALGORITHM §7 v2).
    # src/snk accumulation as a fused masked sum over positions (invalid
    # positions carry weight 0; BIGC pad slots match only BIGC pad
    # positions, whose weight is 0 — identical to the round-3 clamped
    # scatter-add, without its serial scatter loop)
    ps_b = plq_src[None, :P1] if plq_src.ndim == 1 else plq_src[:, :P1]
    pk_b = plq_snk[None, :P1] if plq_snk.ndim == 1 else plq_snk[:, :P1]
    wsrc = jnp.where(kvalid, ps_b[:, None, :], 0).reshape(B, Nn)
    wsnk = jnp.where(kvalid, pk_b[:, None, :], 0).reshape(B, Nn)
    kmatch = kf[:, :, None] == nodes[:, None, :]          # [B, Nn, Nn]
    src = jnp.sum(jnp.where(kmatch, wsrc[:, :, None], 0),
                  axis=1, dtype=jnp.int32)                # [B, Nn]
    snk = jnp.sum(jnp.where(kmatch, wsnk[:, :, None], 0),
                  axis=1, dtype=jnp.int32)
    if ablate == "nodes":
        return _ablate_out(B, LC_ab, nodes, src, snk)

    ef = jnp.where(evalid, ecodes, BIGC).reshape(B, Ne)
    eu_all = _unique_sorted(ef)                           # [B, Ne]
    ematch = ef[:, :, None] == eu_all[:, None, :]         # [B, Ne, Ne]
    if pbw is None:
        ones = jnp.where(evalid, 1, 0).reshape(B, Ne)
        wbins = jnp.sum(jnp.where(ematch, ones[:, :, None], 0),
                        axis=1, dtype=jnp.int32)[:, :, None]
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
        wbins = jnp.stack(
            [jnp.sum(jnp.where(ematch, rows[:, :, None, j], 0),
                     axis=1, dtype=jnp.int32) for j in range(NBT)],
            axis=2)                                        # [B, Ne, NBT]
        wbins = jnp.minimum(wbins, PBW_CLAMP)

    mask_k = (1 << (2 * k)) - 1
    e_u = eu_all >> 2
    e_v = jnp.where(eu_all < BIGC, eu_all & mask_k, BIGC)
    e_c = jnp.where(eu_all < BIGC, e_u >> (2 * (k - 1)), 0)
    # real edges' endpoints are always observed k-mers (u at the same
    # position, v one right of it), so the round-3 membership tests
    # reduce to the pad guard; the compare-reduces below match nothing
    # for BIGC operands anyway
    ekeep = eu_all < BIGC
    pr = 3 - e_c
    if ablate == "edges":
        return _ablate_out(B, LC_ab, nodes, src, snk, wbins,
                           ekeep.astype(jnp.int32), pr)

    have_src = src.max(axis=1) > 0
    source_slot = jnp.argmax(src, axis=1).astype(jnp.int32)  # first max =
    #                                      smallest slot = smallest code
    score = jnp.where((jnp.arange(Nn, dtype=jnp.int32)[None, :]
                       == source_slot[:, None]) & have_src[:, None],
                      0, NEG)                              # dense, no .at[]

    elig = snk > 0

    def pick_end(sc):
        m = jnp.where(elig & (sc > NEG_HALF), sc, NEG)
        mx = m.max(axis=1)
        ok = mx > NEG_HALF
        codesel = jnp.where(m == mx[:, None], nodes, BIGC)
        return jnp.where(ok, codesel.min(axis=1), 0), ok

    def dp_core(sc, jb):
        # "gather score at edge source" as a fused compare-reduce: exactly
        # one node slot holds e_u for a real edge (nodes are unique), so
        # the max IS that score; pad edges match nothing -> NEG
        m_src = nodes[:, None, :] == e_u[:, :, None]       # [B, Ne, Nn]
        sc_e = jnp.max(jnp.where(m_src, sc[:, None, :], NEG), axis=2)
        wt = wbins[:, :, jb]
        live = (sc_e > NEG_HALF) & (wt > 0) & ekeep
        key = jnp.where(live, (sc_e + wt) * 4 + pr, NEG)
        # "scatter-max packed keys into edge targets": max over the edges
        # whose target code equals the node slot's code (same max, same
        # packed-key tie rule as the round-3 .at[].max)
        m_tgt = e_v[:, :, None] == nodes[:, None, :]       # [B, Ne, Nn]
        kmax = jnp.max(jnp.where(m_tgt, key[:, :, None], NEG), axis=1)
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
        # walk-state backpointer lookup as a compare-reduce over the nT
        # candidate states (dead candidates of not-ok windows may match
        # nothing -> 0; their cands never reach a winner, endok is false)
        m = nodes[:, None, :] == v[:, :, None]               # [B, nT, Nn]
        prb = jnp.max(jnp.where(m, bp_t[:, None, :].astype(jnp.int32), 0),
                      axis=2)
        c = 3 - prb
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
