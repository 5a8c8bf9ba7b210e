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
operation is instead a fused dense compare over the code arrays
(broadcast compare + select + max/sum — one streaming pass, no indices),
and the src/snk/weight-bin scatter-adds are masked sums over positions.

Round 5 factored the PER-STEP compares two-level ("sqrt-factored one-hot",
round-4 NEXT_STEPS #3): the round-4 DP step ran two full [B, Ne, Nn]
compare-reduces per step (~360M VPU lanes/step at D1=65 — 387 of the
479 us/window).  Node slots are split into groups of 128; which group
holds a given edge's source (and, with edges SORTED BY TARGET code so a
node's <= 4 in-edges are consecutive, which group holds a node's edge
run) is a STEP-INVARIANT one-hot computed once outside the scan.  Each
DP step then only (a) gathers the relevant 128-slot group row per edge /
per node with one batched one-hot MXU dot (one-hot f32 dots are exact:
every score/key/sentinel is an integer power-of-two-scaled value
< 2^24 in magnitude or exactly -2^29), and (b) compare-maxes inside the
gathered row — [*, 128] lanes instead of [*, Nn].  The scatter-max
becomes a windowed same-target run max (<= 4 consecutive slots, 6
masked shifts) before the gather.  All arithmetic stays int32 at the
compare/max level; exactly one slot matches per real code, so every
reduce sees exactly the round-4 value — bit-identical by construction
and by test (dp_mode='flat' keeps the round-4 form for ablation).

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
                                             "pos_bin", "ablate", "dp_mode"))
def consensus_step_sparse(S: jnp.ndarray, slen: jnp.ndarray,
                          nstr: jnp.ndarray, plq_src: jnp.ndarray,
                          plq_snk: jnp.ndarray, pbw=None, *, k: int, w: int,
                          path_delta: int, e_q6: int = 1_000_000,
                          pos_bin: int = 8, ablate: str = "",
                          dp_mode: str = "auto") -> ConsensusOut:
    """One batched consensus pass at k-mer size k, sparse tables.

    Same contract as consensus_step (S [B, D1, W'], row 0 = A substring);
    intended for the k2 retry pass but exact at any k with 4^(k+1) < 2^30.

    ablate: TIMING-ONLY truncation for on-chip stage attribution (VERDICT
    r3 item 6).  One of 'nodes' (stop after node sort + src/snk sums),
    'edges' (+ edge sort, weight-bin sums, endpoint codes), 'dp'
    (+ max-plus scan and end picking), 'tb' (+ traceback walk); '' = full
    step (+ candidate scoring).  Truncated results are meaningless.

    dp_mode: 'auto' (default: 'grouped' on TPU, 'flat' elsewhere) |
    'grouped' (two-level one-hot group gathers per DP step) | 'flat'
    (round-4 full compare-reduces, kept for ablation) — bit-identical
    outputs.
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

    if dp_mode == "auto":
        # resolved at trace time (dp_mode is static).  On-chip crossovers
        # (scripts/probe_k2_grouped.py, B=64): the flat compare-reduce wins
        # at shallow shapes (dispatch/sort-floor bound), the limb-dot
        # grouped form wins around D1=33, the single-HIGHEST-dot grouped
        # form at the deepest shapes where the doubled limb intermediates
        # are HBM-bound.  CPU (and interpret tests) always flat — the
        # compare-reduce vectorizes better there.
        try:
            plat = jax.devices()[0].platform
        except Exception:
            plat = "cpu"
        if plat != "tpu" or Nn <= 700:
            dp_mode = "flat"
        elif Nn <= 1960:
            dp_mode = "grouped_limb"
        else:
            dp_mode = "grouped"

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
    # unique edges in TARGET-major order: key2 = v*4 + c is a bijection of
    # the natural edge code e = c*4^k + v (u = c*4^(k-1) + (v >> 2),
    # bb = v & 3), so one sort in the key2 domain yields unique edges with
    # every node's <= 4 in-edges (one per leading base c) CONSECUTIVE —
    # the property the grouped scatter-max below relies on
    mask_k = (1 << (2 * k)) - 1
    ef2 = jnp.where(ef < BIGC, (ef & mask_k) * 4 + (ef >> (2 * k)), BIGC)
    ev2 = _unique_sorted(ef2)                             # [B, Ne] (v, c)
    ekeep = ev2 < BIGC
    e_v = jnp.where(ekeep, ev2 >> 2, BIGC)
    e_c = jnp.where(ekeep, ev2 & 3, 0)
    e_u = jnp.where(ekeep, e_c * (4 ** (k - 1)) + (e_v >> 2), BIGC >> 2)
    e_nat = jnp.where(ekeep, (e_c << (2 * k)) + e_v, BIGC)
    ematch = ef[:, :, None] == e_nat[:, None, :]          # [B, Ne, Ne]
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

    # real edges' endpoints are always observed k-mers (u at the same
    # position, v one right of it), so the round-3 membership tests
    # reduce to the pad guard; the compares below match nothing for
    # BIGC/sentinel operands anyway
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

    # ---- two-level ("sqrt-factored") step-invariant lookup tables ----
    # Node slots and v-sorted edge slots are split into 128-wide groups.
    # WHICH group holds a given edge's source node / a given node's
    # in-edge run depends only on the sorted code arrays, so the group
    # one-hots (and the in-group equality masks) are computed ONCE here;
    # each DP step then pays two batched one-hot MXU dots (group-row
    # gathers) plus [*, 128]-lane masked maxes instead of two full
    # [B, Ne, Nn] compare-reduces (round-4 NEXT_STEPS #3).
    SG = 128
    Gn, Ge = -(-Nn // SG), -(-Ne // SG)
    padn, pade = Gn * SG - Nn, Ge * SG - Ne

    def _grp_dot(oh, valsG, nlimb):
        """[B, X, G] one-hot @ [B, G, SG] int32 -> [B, X, SG] gathered
        group rows, as nlimb NATIVE bf16 MXU dots over 8-bit limbs.

        TPU matmuls run the operands in bf16 (8-bit mantissa); a direct
        f32 gather of values > 256 rounds (measured: corrupted every
        code gather on-chip), and Precision.HIGHEST costs 6 bf16 passes
        per dot.  Splitting the int32 values into 8-bit limbs keeps every
        operand exactly representable in bf16: limb products are one-hot
        selected integers < 2^8 (top limb: signed, |.| <= 2^7), per-slot
        sums have at most one contributor, and the f32 recombination
        (limb * 2^(8i)) stays < 2^24 per term.  nlimb = ceil(value bits
        / 8): callers pass 2 for values in [-2^15, 2^15), 4 for codes."""
        acc = None
        for i in range(nlimb - 1, -1, -1):
            limb = (valsG >> (8 * i)) if i == nlimb - 1 else \
                   ((valsG >> (8 * i)) & 255)
            # each limb dot is exact on its own (operands: 0/1 one-hot and
            # ints with |.| <= 255, both bf16-exact; single contributor per
            # slot); convert to int32 BEFORE recombining — an f32 recombine
            # would round 25-bit-plus gathered codes
            d = jax.lax.dot_general(
                oh.astype(jnp.bfloat16), limb.astype(jnp.bfloat16),
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32).astype(jnp.int32)
            acc = d if acc is None else (acc << 8) + d
        return acc

    def _grp_dot_hi(oh, valsG):
        """Single-dot gather at Precision.HIGHEST (full f32 operands, ~6
        bf16 MXU passes).  Exact for any integer |v| < 2^24 or exact
        power of two; one output tensor instead of nlimb — measured faster
        than the limb form at the deepest shape (D1=65), slower at D1=33
        (probe_k2_grouped.py), hence both are kept selectable."""
        return jax.lax.dot_general(
            oh, valsG.astype(jnp.float32), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST).astype(jnp.int32)

    nodesG = jnp.pad(nodes, ((0, 0), (0, padn)),
                     constant_values=2 ** 30).reshape(B, Gn, SG)
    leaders = nodesG[:, :, 0]                              # [B, Gn]
    # source side: real e_u is itself a node code, and group g holds all
    # node slots in [leaders[g], leaders[g+1]) (nodes unique + sorted), so
    # e_u's node lives in group (#leaders <= e_u) - 1; sentinel e_u
    # (2^28 / empty windows) either lands in a group with no matching
    # code or (all-BIGC node row) yields count 0 -> all-zero one-hot
    grp_u = jnp.sum((leaders[:, None, :] <= e_u[:, :, None])
                    .astype(jnp.int32), axis=2) - 1        # [B, Ne]
    ohu = (grp_u[:, :, None]
           == jnp.arange(Gn, dtype=jnp.int32)).astype(jnp.float32)
    m_src2 = _grp_dot(ohu, nodesG, 4) == e_u[:, :, None]   # [B, Ne, SG]
    # target side: node v's in-edge run is <= 4 consecutive v-sorted slots
    # with key2 in [4v, 4v+3]; the run's LAST slot is the last edge slot
    # with key2 <= 4v+3, i.e. it sits in group (#vleaders <= 4v+3) - 1.
    # The per-step windowed run max (below) propagates the run's max key
    # to EVERY slot of the run, so matching any run slot inside that one
    # gathered group suffices even when the run straddles the boundary.
    ev2G = jnp.pad(ev2, ((0, 0), (0, pade)),
                   constant_values=2 ** 30).reshape(B, Ge, SG)
    vleaders = ev2G[:, :, 0]
    tgt = jnp.where(nodes < BIGC, nodes * 4 + 3, BIGC)
    cnt_v = jnp.sum((vleaders[:, None, :] <= tgt[:, :, None])
                    .astype(jnp.int32), axis=2)            # [B, Nn]
    ohv = ((cnt_v - 1)[:, :, None]
           == jnp.arange(Ge, dtype=jnp.int32)).astype(jnp.float32)
    m_tgt2 = ((_grp_dot(ohv, ev2G, 4) >> 2)
              == jnp.where(nodes < BIGC, nodes, -1)[:, :, None])
    # cnt_v == 0 (node code below every edge target) must not alias the
    # all-zero one-hot's gathered zeros onto node code 0
    m_tgt2 &= (cnt_v > 0)[:, :, None]

    def _sh_up(x, i, fill):
        return jnp.concatenate(
            [x[:, i:], jnp.full((B, i), fill, x.dtype)], axis=1)

    def _sh_dn(x, i, fill):
        return jnp.concatenate(
            [jnp.full((B, i), fill, x.dtype), x[:, :-i]], axis=1)

    sup = [e_v == _sh_up(e_v, i, -1) for i in (1, 2, 3)]   # same-v masks
    sdn = [e_v == _sh_dn(e_v, i, -1) for i in (1, 2, 3)]

    # static bounds for the per-step limb gathers: valid scores are
    # monotone sums of positive step weights from 0 (never negative), so
    # score <= t_hi * max-step-weight and key = (score + wt) * 4 + 3.
    # The NEG dead-state sentinel is CLAMPED into the limb domain before
    # each gather (any bf16-exact negative works — consumers only test
    # sign, and valid scores/keys are >= 0)
    wt_max = PBW_CLAMP if pbw is not None else Ne
    key_max = (t_hi * wt_max + wt_max) * 4 + 3
    nlv = 2 if key_max < 2 ** 15 else 3
    SENT = -(2 ** (8 * nlv - 1))
    if dp_mode == "grouped_limb":
        def _pgather(oh, vG):
            return _grp_dot(oh, vG, nlv)
    else:
        _pgather = _grp_dot_hi

    def dp_core_grouped(sc, jb):
        scG = jnp.pad(jnp.maximum(sc, SENT), ((0, 0), (0, padn)),
                      constant_values=SENT).reshape(B, Gn, SG)
        sc_e = jnp.max(jnp.where(m_src2, _pgather(ohu, scG), SENT),
                       axis=2)
        wt = wbins[:, :, jb]
        live = (sc_e >= 0) & (wt > 0) & ekeep
        key = jnp.where(live, (sc_e + wt) * 4 + pr, SENT)
        # windowed same-v run max: every slot of a v-run (<= 4 slots) ends
        # up holding the run's max packed key — max is order-insensitive
        # and the packed priority bits keep the oracle tie rule
        wkey = key
        for i in (1, 2, 3):
            wkey = jnp.maximum(wkey, jnp.where(sup[i - 1],
                                               _sh_up(key, i, SENT), SENT))
            wkey = jnp.maximum(wkey, jnp.where(sdn[i - 1],
                                               _sh_dn(key, i, SENT), SENT))
        keyG = jnp.pad(wkey, ((0, 0), (0, pade)),
                       constant_values=SENT).reshape(B, Ge, SG)
        kmax = jnp.max(jnp.where(m_tgt2, _pgather(ohv, keyG), SENT),
                       axis=2)
        new = jnp.where(kmax >= 0, kmax >> 2, NEG)
        bp = jnp.where(kmax >= 0, kmax & 3, 0).astype(jnp.uint8)
        return new, bp

    def dp_core_flat(sc, jb):
        # round-4 form (ablation reference): full compare-reduces per step.
        # "gather score at edge source": exactly one node slot holds e_u
        # for a real edge (nodes unique), so the max IS that score; pad
        # edges match nothing -> NEG
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

    dp_core = dp_core_flat if dp_mode == "flat" else dp_core_grouped

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
