"""Pallas TPU kernel: cycling-digit max-plus DBG DP (VMEM-resident).

The round-1 kernel (ops/pallas_dbg.py) kept scores in NATURAL k-mer order and
relabeled (bb, h) -> (h, bb) after every step — a perfect-shuffle reshape that
Mosaic rejects on-chip.  This kernel removes the relabel entirely with
*cycling-digit addressing* (the fix sketched in that module's STATUS note):

- The char at output position j is stored in address digit-slot
  ``(k-1-j) mod k``.  A window of k consecutive positions hits every slot
  exactly once, and extending the path by one char drops position t and adds
  position t+k — the SAME slot.  So DP step tt (1-based) replaces the single
  digit ``q = (k-tt) mod k`` in place:

      new[.. slot_q=bb ..] = max_c old[.. slot_q=c ..] + EW_q[c, bb, rest]

  a pure broadcast-add-max over one address digit — no data movement.

- The score lives as a 2D ``[4^(k-h), 4^h]`` array (h = k//2).  Slots in the
  sublane half are exposed with leading-axis splits (always layout-legal in
  Mosaic).  Because q descends k-1..0 cyclically, slots fall into the lane
  half for exactly h consecutive steps — ONE physical transpose every h steps
  flips the halves so the reduced digit is always in the sublane half.  The
  transpose is either the XLU 2D transpose or an MXU ``dot_general`` against
  an identity (exact: all reachable scores < 2^24; the NEG sentinel is
  remapped to -2^23 across the matmul and restored after).

- EW_q is the (k+1)-mer edge table pre-permuted into the k per-phase layouts
  by XLA *outside* the kernel (digit-permute transposes are legal and fast
  there), int16 with -1 as the no-edge sentinel.  The kernel DMAs one
  window's phases to VMEM once and runs all t_hi steps against them — the
  XLA scan re-reads the edge tensor from HBM every step.

- Backpointers are 2-bit packed, h steps per byte; the packing groups align
  exactly with the constant-layout runs, so each group is written in a
  single physical layout.  Traceback (consensus_step._traceback_cyc) undoes
  the addressing with integer arithmetic only.

- End-picking runs in-kernel with first-max ties broken in NATURAL index
  order (min-of-matching-natural-index; Mosaic has no integer argmax), so
  ``ends``/``endok`` are bit-identical to the scan path's.

Semantics are bit-identical to ops/consensus_step.py's scan (and hence the
NumPy oracle, ALGORITHM §4): tests/test_pallas_dbg.py asserts equality.
Reference: gt1/daccord ``src/daccord.cpp`` DebruijnGraph traversal (SURVEY
§3.4); this dense formulation is the SURVEY §7.1 design.

Requires t_lo >= 1 and even k; callers fall back to the scan otherwise.
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
NEG_F32 = -(2 ** 23)        # NEG stand-in across the MXU transpose (f32-exact)
# Mix-path score sentinels (see _cyc_kernel): invalid TABLE entries are
# pre-biased to EW_INVALID so the max-plus step is a bare add+max (no
# compare/select per (c, bb)).  The score sentinel must then be small
# enough that sentinel<<2 + EW_INVALID cannot underflow int32:
#   scv in {valid >= 0} u {NEG_K<<2 = -2^28};  cand >= -2^29.
# All invalid cands are <= -2^28 + 2^22 < KEY_T; all valid keys are >= 4.
NEG_K = -(2 ** 26)
NEG_HALF_K = -(2 ** 25)
KEY_T = -(2 ** 27)
EW_INVALID = -(2 ** 28)


def _orders(k: int):
    """(std, transposed) slot orders, msb -> lsb, of the 2D score layout."""
    h = k // 2
    std = tuple(range(k - 1, -1, -1))
    tr = tuple(range(h - 1, -1, -1)) + tuple(range(k - 1, h - 1, -1))
    return std, tr


def phase_digit_seq(k: int, j: int):
    """Digit positions of the (k+1)-mer code e (0 = lsb = bb, k = msb = c)
    in phase-j layout order msb->lsb: (c, bb, d_j..d_1, d_{k-1}..d_{j+1}).

    Phase j's table is indexed ``[c*4+bb][rest]`` by the kernel during the
    step that reduces score slot q = k-1-j (mod h dedup); this sequence lets
    the edge histograms be computed DIRECTLY in each phase layout (the
    one-hot row/col split of the histogram matmul can follow any digit
    permutation), replacing the transpose-chain pre-permute."""
    return [k, 0] + list(range(j, 0, -1)) + list(range(k - 1, j, -1))


def _rot_parts(n: int, r: int):
    """Decompose digit-rotation r (mod n) into parts p with min(p, n-p) >= 3
    so every stage is a 2D transpose with both dims >= 64 — large-granule
    HBM access.  Returns the shortest such part list, or the direct [r]
    when no such decomposition exists (small n, e.g. k=6's n=5/6: the
    single-stage rotation is less HBM-efficient but always correct —
    only k=8's n=7/8 sizes are perf-relevant)."""
    lo, hi = 3, n - 3
    if hi < lo:
        return [r % n]
    from itertools import combinations_with_replacement
    for ln in range(1, 4):
        for combo in combinations_with_replacement(range(lo, hi + 1), ln):
            if sum(combo) % n == r % n:
                return list(combo)
    return [r % n]


def _digit_rot(x: jnp.ndarray, n: int, r: int) -> jnp.ndarray:
    """Rotate the last (flat 4^n) axis's digits: bottom r digits to the top.

    A direct XLA transpose of a small-r rotation reads/writes HBM in
    4^r-element granules (8-128 bytes — ~10x off stream bandwidth).  Compose
    from transposes whose two dims are both >= 4^3, with optimization
    barriers so XLA cannot re-fuse the stages into one bad permute."""
    if r % n == 0:
        return x
    head = x.shape[:-1]
    parts = _rot_parts(n, r)
    for i, p in enumerate(parts):
        if i > 0:
            x = jax.lax.optimization_barrier(x)
        x = (x.reshape(head + (4 ** (n - p), 4 ** p))
             .swapaxes(-1, -2).reshape(head + (4 ** n,)))
    return x


def build_phase_tables(ecnb: jnp.ndarray, elig: jnp.ndarray, k: int):
    """XLA pre-permute: (ewp [B,NBT,h,16,4^(k-1-h),4^h] u16,
    eligp [B,h,R,C] i8).

    ecnb: int32 [B, NBT, 4^(k+1)] natural (k+1)-mer counts per step bin
          (e = c*4^k + h*4 + bb); NBT == 1 for the unweighted path
    elig: bool  [B, 4^k]          natural sink eligibility (snk > 0)

    ewp entries are PACKED KEYS ``count*4 + (3-c)`` (0 = edge absent; valid
    entries are >= 4).  The kernel then computes the max-plus step as a pure
    ``max`` over packed keys ``score*4 + count*4 + (3-c)``: among equal
    scores the largest priority (3-c) wins, i.e. the smallest c — exactly
    the scan path's first-max-over-ascending-c tie rule.  Requires
    ``count*4 + 3 < 2^16`` (asserted by the caller via D1*(W'-k+1) bound).

    Phase q's remaining-digit order follows the physical layout of the score
    array during the step that reduces slot q: slot s holds edge-h digit
    ``(s-q-1) mod k`` and state-natural digit ``(s-q) mod k``.

    DEDUP: phase q (std layout) and phase q-h (tr layout) produce IDENTICAL
    tables — the tr slot order is the std order with every slot shifted by
    h, and the digit maps depend only on s-q, so shifting both s and q by h
    leaves every source-axis tuple unchanged.  Only h = k//2 distinct
    tables exist; index them by ``q % h``.  This halves the permute cost,
    the HBM traffic, and the kernel's VMEM block.
    """
    B, NBT = ecnb.shape[0], ecnb.shape[1]
    BN = B * NBT
    h = k // 2
    pr = (3 - jnp.arange(4, dtype=jnp.int32)).reshape(1, 4, 1)
    # base layout (= phase q=k-1): rotate (E.., bb) by 1 so bb joins c,
    # giving [BN, 16(c,bb), E_{k-2}..E_0]; phase q=k-1-j is then a j-digit
    # rotation of the E group, and eligp phases are (j+1)-digit rotations
    # of the natural state table.  All rotations run as large-granule
    # transpose chains (_digit_rot).  The step-bin axis rides the BATCH axis
    # (BN = B*NBT) so every rotation stage is ONE op over all bins — per-op
    # dispatch overhead, not bandwidth, dominates these transposes on-chip.
    ecn3 = ecnb.reshape(BN, 4, 4 ** k)
    eKn = jnp.where(ecn3 > 0, (ecn3 << 2) + pr, 0).astype(jnp.uint16)
    eK = _digit_rot(eKn, k, 1).reshape(BN, 16, 4 ** (k - 1))
    ewp = [None] * h
    for j in range(h):
        q = k - 1 - j                          # std phases; q % h indexes
        ewp[q % h] = (_digit_rot(eK, k - 1, j)
                      .reshape(B, NBT, 16, 4 ** (k - 1 - h), 4 ** h))
    return jnp.stack(ewp, 2), build_elig_phases(elig, k)


def build_elig_phases(elig: jnp.ndarray, k: int) -> jnp.ndarray:
    """Phase layouts of the sink-eligibility table: int8 [B, h, R, C].

    eligp phases are (j+1)-digit rotations of the natural state table
    (elig [B, 4^k] bool), deduped std/tr like the edge tables."""
    B = elig.shape[0]
    h = k // 2
    el = elig.astype(jnp.int8).reshape(B, 4 ** k)
    elp = [None] * h
    for j in range(h):
        q = k - 1 - j
        elp[q % h] = (_digit_rot(el, k, j + 1)
                      .reshape(B, 4 ** (k - h), 4 ** h))
    return jnp.stack(elp, 1)


@functools.lru_cache(maxsize=None)
def _natmaps(k: int):
    """Static numpy int32 [h, R, C]: natp[q % h] maps physical position ->
    NATURAL index of the state produced by the step that reduces slot q
    (slot s holds nat digit (s-q) mod k).  Only h distinct maps exist (the
    same std/tr dedup as build_phase_tables).  Computed host-side once."""
    h = k // 2
    R, C = 4 ** (k - h), 4 ** h
    assert R == C
    out = np.empty((h, R, C), np.int32)
    r_io = np.arange(R, dtype=np.int32)[:, None]
    c_io = np.arange(C, dtype=np.int32)[None, :]
    for q in range(h, k):                      # std phases; q % h indexes
        nat = np.zeros((R, C), np.int32)
        for s in range(k):
            d = ((r_io >> (2 * (s - h))) & 3 if s >= h
                 else (c_io >> (2 * s)) & 3)
            nat = nat | (d << (2 * ((s - q) % k)))
        out[q % h] = nat
    return out


def _transpose(sc, impl: str, neg: int = NEG):
    """Exact int32 2D transpose of the trailing two axes (leading batch
    axes allowed). 'xlu': native; 'mxu': dot_general vs identity in f32
    (the `neg` sentinel remapped to NEG_F32 across the matmul and restored
    after — all mix-domain sentinels are f32-exact)."""
    if impl == "xlu":
        return jnp.swapaxes(sc, -1, -2)
    if sc.ndim == 3:                     # per-window MXU dots (no batched
        return jnp.stack([_transpose(sc[w], impl, neg)   # Mosaic dots)
                          for w in range(sc.shape[0])])
    n0, n1 = sc.shape
    scm = jnp.where(sc > -(2 ** 22), sc, NEG_F32).astype(jnp.float32)
    eye = (jax.lax.broadcasted_iota(jnp.int32, (n0, n0), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (n0, n0), 1)
           ).astype(jnp.float32)
    # out[a, b] = sum_r scm[r, a] * eye[r, b] = scm[b, a]
    scT = jax.lax.dot_general(scm, eye, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    scTi = scT.astype(jnp.int32)
    return jnp.where(scTi < -(2 ** 22), neg, scTi)


def _cyc_kernel(*refs, k: int, t_lo: int, t_hi: int, g_step: int, nbt: int,
                nbp: int, pbw_band: int, transpose_impl: str,
                codes_mode: bool = False, gp: int = 0, interp: bool = False,
                fuse_tb: bool = False, ablate: str = "", wpg: int = 1,
                pri_tb: bool = False, hist_i8: bool = False,
                ilp: bool = False):
    """nbp == 0: refs[:h] are packed-key tables [1, NBT, 16, A, C] u16
    (XLA-side mix+pack).  nbp > 0: the mix + clamp + key-pack runs IN-KERNEL
    at step-bin boundaries — the XLA mix materializes its f32 dot output to
    HBM before the pack (measured ~2x this stage's traffic), while here the
    mixed table for (phase, bin) is computed once in VMEM and reused for
    every step of the bin that touches the phase.  f32 multiply-add of
    integer-exact operands (counts <= D1*g, weights <= 64, sums < 2^24), so
    the packed keys are bit-identical to the XLA path's.

    Two mix-mode input forms:
    - codes_mode=False ("phases_h"): refs[:h] are RAW position-bin histogram
      phase tables [1, nbp, 16, A, C] bf16/f32, refs[h] is the pbw block
      [1, nbp, nbt] i32 (SMEM).  XLA builds the histograms (einsum) and the
      kernel DMAs them — ~3MB/window of HBM write + read at k=8.
    - codes_mode=True ("codes", production): refs[0]/refs[1] are the tiny
      per-phase row/col CODE arrays [1, h, nbp, gp] i32 (phase_digit_seq
      digit split, invalid/padded positions = -1) and the histograms are
      built HERE as one-hot MXU dots into VMEM scratch (refs[-1],
      [h, nbp, 4^(s), 4^(k+1-s)]): H[ph][n] = ohr @ ohc^T with 0/1 bf16
      operands and f32 accumulation — exact for any count < 2^24, and equal
      to the XLA einsum bin-for-bin.  This removes the histogram HBM
      round-trip entirely (the largest input stream of the step).

    fuse_tb=True additionally runs the CANDIDATE TRACEBACK in-kernel after
    the DP loop: backpointer groups live in VMEM scratch (never written to
    HBM — the XLA traceback re-read the [B, nG, R, C] tensor across ~t_hi
    sequential dispatches), per-step byte lookups are one-hot MXU row
    selects over [128(T-lane), R] x [R, C], and the kernel emits the decoded
    candidate base rows directly (bpp_ref becomes the [1, 128, 128] u8
    candidate block: sublane = T - t_lo, col = candidate position, head
    k-mer included; consensus_step applies only the length mask).

    ablate: TIMING-ONLY stage removals for on-chip attribution (results
    intentionally wrong; never set in production).  '+'-joined subset of
    {noend: end-picking only at the last step; mix1: mixed tables built for
    bin 0 only and reused; hist1: histograms built for position-bin 0 only;
    notb: skip the fused traceback walk}.

    pri_tb (requires fuse_tb): per-step PRIORITY scratch instead of 2-bit
    group packing.  The default path spends 3 full-[R, C] int32 passes per
    DP step on backpointer bookkeeping (&3, <<2*field, |=) plus a group
    write; with pri_tb the step stores ``(key & 3)`` straight to a per-step
    int8 VMEM plane (one quarter-width store) and the traceback's one-hot
    row-selects read that plane directly (values 0..3: bf16-exact, the same
    dot shapes).  Bit-identical outputs; same VMEM footprint (t_hi int8
    planes ~= nG int32 group planes).

    wpg: windows per grid step.  The sequential t_hi-step DP chain has only
    [R, C] (~64 VPU tiles at k=8) of parallelism per op — measured ~1.2
    tile-ops/issue-slot, i.e. scheduling/latency-bound.  Batching wpg
    windows gives every op a leading W axis (W*[R, C] wide), amortizing the
    dependency chain across windows.  All per-window blocks/scratch gain a
    leading wpg dim; MXU dots (histograms, traceback row-selects) stay
    per-window loops (same count per window — Mosaic batched dots are not
    relied on).  Results are bit-identical per window for any wpg."""
    ab = set(ablate.split("+")) if ablate else set()
    from daccord_tpu.oracle.offset_likely import PBW_CLAMP
    h = k // 2
    mix = nbp > 0
    if codes_mode:
        assert mix
        rows_ref, cols_ref, pbw_ref = refs[0], refs[1], refs[2]
        rest = refs[3:]
        ewp_refs = None
    elif mix:
        ewp_refs = refs[:h]
        pbw_ref = refs[h]
        rest = refs[h + 1:]
    else:
        ewp_refs = refs[:h]
        rest = refs[h:]
    # trailing scratch refs, in order: [hscr (codes)] [bps (fuse_tb)] end
    end_scr = rest[-1]
    if fuse_tb:
        eligp_ref, score0_ref, natp_ref, bpp_ref, meta_ref = rest[:5]
        bps_scr = rest[-2]
        if codes_mode:
            hscr_ref = rest[5]
    else:
        if codes_mode:
            (eligp_ref, score0_ref, natp_ref, bpp_ref, meta_ref,
             hscr_ref) = rest[:-1]
        else:
            (eligp_ref, score0_ref, natp_ref, bpp_ref,
             meta_ref) = rest[:-1]
    R, C = 4 ** (k - h), 4 ** h
    gsz = h
    nG = pl.cdiv(t_hi, gsz)
    key_tab = [None] * h                     # per-phase mixed tables (VMEM)
    key_bin = [None] * h                     # static unroll-time bin tags

    W_ = wpg
    if codes_mode:
        # build every (window, phase, position-bin) histogram once, up
        # front: a one-hot MXU dot per table.  Operands are 0/1 (bf16-exact;
        # f32 in interpret mode — the CPU backend rejects bf16 dots at
        # dispatch); accumulation is f32, exact for any integer count
        # < 2^24.  Scratch dtype from the exact count bound (see caller).
        s = (k + 2) // 2
        NR, CW = 4 ** s, 4 ** (k + 1 - s)
        # operand dtype: 0/1 indicators are exact in bf16 AND int8; int8
        # dots ('_hi8' probe) would run at 2x MXU rate if v5e Mosaic lowers
        # s8xs8->s32 natively.  f32 in interpret mode (the CPU backend
        # rejects bf16/int8 dots at dispatch).
        odt = (jnp.float32 if interp else
               jnp.int8 if hist_i8 else jnp.bfloat16)
        acc_t = jnp.int32 if (hist_i8 and not interp) else jnp.float32
        riota = jax.lax.broadcasted_iota(jnp.int32, (NR, gp), 0)
        ciota = jax.lax.broadcasted_iota(jnp.int32, (CW, gp), 0)
        for w in range(W_):
            for ph in range(h):
                for n in range(1 if "hist1" in ab else nbp):
                    ohr = (riota == rows_ref[w, ph, n:n + 1]).astype(odt)
                    ohc = (ciota == cols_ref[w, ph, n:n + 1]).astype(odt)
                    Hf = jax.lax.dot_general(
                        ohr, ohc, (((1,), (1,)), ((), ())),
                        preferred_element_type=acc_t)
                    hscr_ref[w, ph, n] = Hf.astype(hscr_ref.dtype)

    sc = score0_ref[:]                 # [W, R, C] std layout (== natural)
    if mix:
        # mix-path state is PRE-SHIFTED (sc4 = score << 2, the "key domain"
        # minus the priority bits): the DP step is then a bare add+max with
        # no per-step <<2 / >>2 converts — sc4_next = key & ~3 strips the
        # priority bits in place.  Sentinels: invalid state = EW_INVALID
        # (-2^28; adding a valid table entry < 2^18 keeps it < KEY_T, and
        # invalid+invalid = -2^29 cannot underflow).  Valid sc4 < 2^23
        # (cumulative clamped weights * 4), so all thresholds below hold.
        negs, neghs, key_t = EW_INVALID, KEY_T, KEY_T
        sc = jnp.where(sc > NEG_HALF, sc << 2, EW_INVALID)
        # hoisted mix constants: per-row priority 3-c (as f32 for the folded
        # pack) and its clamped-key ceiling CLAMP*4 + pr (computed once,
        # reused by every (phase, bin) refresh)
        kshape = (W_, 16, 4 ** (k - 1 - h), 4 ** h)
        prf_tab = (3 - (jax.lax.broadcasted_iota(jnp.int32, kshape, 1) >> 2)
                   ).astype(jnp.float32)
        prc_tab = prf_tab + float(PBW_CLAMP * 4)
    else:
        negs, neghs, key_t = NEG, NEG_HALF, NEG_HALF
    # ilp: emit each window's DP chain as a SEPARATE [1, R, C] op stream
    # inside the same unrolled loop (chunks of width 1) instead of one
    # [W, R, C]-wide op per step (chunks = 1 of width W).  The per-chunk
    # code below is identical either way, so results are bit-identical;
    # what changes is the instruction mix the Mosaic scheduler sees — two
    # independent dependence chains can overlap where one wider chain
    # cannot (probe: scripts/probe_dp_ilp.py, ~9% at 2 chains, negative
    # at 4).
    NCh = W_ if (ilp and W_ > 1) else 1
    CWd = W_ // NCh
    bp_accs = [None] * NCh
    if fuse_tb:
        # endv[s] accumulates the end state of candidate T = t_lo + s
        # (sublane-major so the traceback's one-hot row builds need no
        # transposes); validity stays in meta row 1 as before.  The walk
        # state is padded to TT sublanes, not the full 128-row output
        # block: TT is the candidate count nT rounded to the int8 sublane
        # granule (32), which shrinks the one-hot row-select dots and the
        # per-step VPU work ~4x at the bench's nT = 2*path_delta + 1 = 29.
        nT_k = t_hi - t_lo + 1
        TT = min(128, -(-nT_k // 32) * 32)
        subl = jax.lax.broadcasted_iota(jnp.int32, (TT, 1), 0)
        endv = jnp.zeros((W_, TT, 1), jnp.int32)

    scs = ([sc[ci:ci + 1] for ci in range(NCh)] if NCh > 1 else [sc])
    for tt in range(1, t_hi + 1):
        jbin = min((tt - 1) // g_step, nbt - 1)      # static step-bin index
        if ab & {"mix1", "hist1"}:
            jbin = 0
        q = (k - tt) % k
        std = q >= h
        g, field = divmod(tt - 1, gsz)
        if field == 0:
            if tt > 1:
                scs = [_transpose(s, transpose_impl, negs) for s in scs]
            if not pri_tb:
                bp_accs = [jnp.zeros(s.shape, jnp.int32) for s in scs]

        # expose digit q as the middle axis of the sublane half
        if std:
            A, Bv = 4 ** (k - 1 - q), 4 ** (q - h)
        else:
            A, Bv = 4 ** (h - 1 - q), 4 ** q
        L = scs[0].shape[-1]
        # packed-key max-plus step: key = score*4 + count*4 + (3-c); a pure
        # 4-way max replaces the compare/select/backpointer bookkeeping
        # (among equal scores the largest 3-c, i.e. smallest c, wins — the
        # scan path's first-max tie rule).  The mix path's state is already
        # pre-shifted (sc4 domain) so no per-step shift is needed; the u16
        # path shifts here (NEG<<2 == INT32_MIN exactly; adding a packed
        # table entry < 2^16 keeps it far below NEG_HALF).
        ph = q % h
        if mix:
            if key_bin[ph] != jbin:          # static: refresh once per bin
                # banded mix: pbw[i][j] == 0 exactly outside |i-j| <=
                # pbw_band (host-verified; the drifted-walk kernel is
                # tridiagonal at realistic rates), so those terms are
                # skipped statically — exact, any summation order of
                # integer-exact f32 terms gives the same sum.  pbw_ref is
                # [1, ...] (shared table, broadcast over windows) or
                # [wpg, ...] (per-window tables).
                pshared = pbw_ref.shape[0] == 1
                # accumulate directly in the x4 key domain with the priority
                # row pre-seeded: Wf4 = sum_i H_i*(4*s_i) + pr — bitwise
                # equal to (sum_i H_i*s_i)*4 + pr in f32 (scaling by the
                # power of two 4 commutes exactly through products and
                # sums), and one full-size FMA pass cheaper per refresh
                Wf4 = None
                for i in range(max(0, jbin - pbw_band),
                               min(nbp - 1, jbin + pbw_band) + 1):
                    if codes_mode:
                        Hi = hscr_ref[:, ph, i].reshape(kshape)
                    else:
                        Hi = ewp_refs[ph][:, i]
                    if pshared:
                        scal = (pbw_ref[0, i, jbin] * 4).astype(jnp.float32)
                        term = Hi.astype(jnp.float32) * scal
                    else:
                        # per-window pbw: scalar multiply per window, then
                        # stack (Mosaic rejects reshaping a [W] vector to
                        # [W, 1, 1, 1] for a broadcast multiply)
                        term = jnp.stack(
                            [Hi[w].astype(jnp.float32)
                             * (pbw_ref[w, i, jbin] * 4).astype(jnp.float32)
                             for w in range(W_)])
                    Wf4 = (prf_tab + term) if Wf4 is None else (Wf4 + term)
                if Wf4 is None:     # band window misses every position bin
                    Wf4 = prf_tab
                # folded f32 pack: min(W, CLAMP)*4 + pr == min(W*4 + pr,
                # CLAMP*4 + pr) — one min, integer-exact in f32
                # (W*4 + pr <= 4*CLAMP + 3 < 2^24).  Validity W >= 1 <=>
                # W*4 + pr > 3.5 (W, pr integer-valued, pr <= 3).  Absent
                # edges pre-biased to EW_INVALID: the DP step is then a
                # bare add+max per (c, bb).
                key_tab[ph] = jnp.where(Wf4 > 3.5,
                                        jnp.minimum(Wf4, prc_tab),
                                        float(EW_INVALID)).astype(jnp.int32)
                key_bin[ph] = jbin
            ew = key_tab[ph]              # [W, 16, 4^(k-1-h), 4^h] i32
        else:
            ew = ewp_refs[ph][:, jbin]    # [W, 16, 4^(k-1-h), 4^h] u16

        ews = ([ew[ci:ci + 1] for ci in range(NCh)] if NCh > 1 else [ew])
        for ci in range(NCh):
            sc4 = scs[ci] if mix else (scs[ci] << 2)
            scv = sc4.reshape(CWd, A, 4, Bv, L)
            ewc = ews[ci]
            keys = []
            for bb in range(4):
                best = None
                for c in range(4):
                    if mix:
                        cand = (scv[:, :, c]
                                + ewc[:, c * 4 + bb].reshape(CWd, A, Bv, L))
                    else:
                        # widen u16 -> i32 BEFORE comparing (v5e Mosaic has
                        # no 16-bit compare: "Target does not support this
                        # comparison")
                        wv = (ewc[:, c * 4 + bb].reshape(CWd, A, Bv, L)
                              .astype(jnp.int32))
                        cand = jnp.where(wv > 0, scv[:, :, c] + wv, NEG)
                    best = cand if best is None else jnp.maximum(best, cand)
                keys.append(best)
            key = jnp.stack(keys, axis=2).reshape(scs[ci].shape)
            if mix:
                # stay in the sc4 domain: strip the priority bits in place
                # (and, vs compare/select/shift); clamp-from-below only at
                # GROUP BOUNDARIES.  Invalid states are no longer pinned to
                # EXACTLY negs — between clamps they drift within
                # [EW_INVALID * (gsz + 1), EW_INVALID + gsz * 2^18]:
                # downward at most gsz + 1 = 5 invalid+invalid adds from a
                # clamped -2^28 (5 * -2^28 > INT32_MIN, no underflow),
                # upward at most gsz valid-table adds (< 2^18 each) from
                # -2^28, always < KEY_T = -2^27.  Every consumer (max tie
                # rule, end-pick eligibility, ok-ness) only tests
                # `> KEY_T`, never equality with negs, so skipping 3 of 4
                # clamps is bit-exact — one full-[R, C] pass fewer on
                # those steps.
                nsc = key & -4
                if field == gsz - 1 or tt == t_hi:
                    nsc = jnp.maximum(nsc, negs)
            else:
                nsc = jnp.where(key > key_t, key >> 2, negs)
            scs[ci] = nsc
            # backpointer field stores the RAW priority key & 3 == 3 - c;
            # the tracebacks (in-kernel and consensus_step._traceback_cyc)
            # invert with one tiny op on their [*, nT]-sized state instead
            # of a full [R, C] pass per DP step here
            if pri_tb:
                # per-step int8 priority plane: one quarter-width store
                # replaces the shift/or/group-write int32 bookkeeping
                if NCh > 1:
                    bps_scr[tt - 1, ci] = (key & 3)[0].astype(jnp.int8)
                else:
                    bps_scr[tt - 1] = (key & 3).astype(jnp.int8)
            else:
                bp_accs[ci] = bp_accs[ci] | ((key & 3) << (2 * field))

            if (field == gsz - 1 or tt == t_hi) and not pri_tb:
                if fuse_tb:
                    if NCh > 1:
                        bps_scr[ci, g] = bp_accs[ci][0]    # VMEM only, i32
                    else:
                        bps_scr[:, g] = bp_accs[0]
                else:
                    # group bytes < 2^(2*gsz) <= 2^8: int16 halves the bpp
                    # write traffic (and the XLA-side traceback's convert)
                    if NCh > 1:
                        bpp_ref[ci, g] = bp_accs[ci][0].astype(jnp.int16)
                    else:
                        bpp_ref[:, g] = bp_accs[0].astype(jnp.int16)

            if tt >= t_lo and not ("noend" in ab and tt != t_hi):
                # DEFERRED end-picking: snapshot the post-step scores to
                # VMEM scratch (one copy) instead of running two global
                # max/min reduces + masking inline in the sequential DP
                # chain; the reductions run batched per phase group after
                # the loop.
                if NCh > 1:
                    end_scr[tt - t_lo, ci] = scs[ci][0]
                else:
                    end_scr[tt - t_lo] = scs[ci]

    # ---- deferred end-picking: one batched reduction pass per phase
    # group.  Steps sharing q % h share the eligibility mask and the
    # physical->natural map, so their saved [R, C] scores stack into one
    # [G, R, C] tensor and the global max / tie-min-natural reduce runs as
    # TWO axis reductions per group instead of 2*nT scalar-reduce chains
    # interleaved with the DP.  Semantics identical: mx == old per-step
    # max; (masked == mx) == old (eligm & (sc == mx)) at ok steps, and at
    # not-ok steps endnat is forced to 0 either way.
    nT_all = t_hi - t_lo + 1
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)
    meta0 = jnp.zeros((W_, 1, 128), jnp.int32)
    meta1 = jnp.zeros((W_, 1, 128), jnp.int32)
    for ph in range(h):
        s_list = [s for s in range(nT_all)
                  if ((k - (t_lo + s)) % k) % h == ph]
        if "noend" in ab:
            s_list = [s for s in s_list if s == nT_all - 1]
        if not s_list:
            continue
        msc = jnp.stack([end_scr[s] for s in s_list])    # [G, W, R, C]
        eligm = eligp_ref[:, ph] != 0                    # [W, R, C]
        masked = jnp.where(eligm[None], msc, negs)
        mxg = jnp.max(jnp.max(masked, axis=3), axis=2)   # [G, W]
        natsel = jnp.where(masked == mxg[:, :, None, None],
                           natp_ref[ph][None, None], 4 ** k)
        mng = jnp.min(jnp.min(natsel, axis=3), axis=2)   # [G, W]
        okg = mxg > neghs
        endg = jnp.where(okg, mng, 0)                    # [G, W]
        okg2 = okg.astype(jnp.int32)
        for i, s in enumerate(s_list):
            sel = lane == s
            ei = endg[i].reshape(W_, 1, 1)
            meta0 = jnp.where(sel, ei, meta0)
            meta1 = jnp.where(sel, okg2[i].reshape(W_, 1, 1), meta1)
            if fuse_tb:
                endv = jnp.where(subl[None] == s, ei, endv)
    meta_ref[:, 0:1, :] = meta0
    meta_ref[:, 1:2, :] = meta1

    if fuse_tb and "notb" in ab:
        bpp_ref[:] = jnp.zeros_like(bpp_ref)
    elif fuse_tb:
        # ---- in-kernel traceback (see docstring).  Walk state is
        # [W, TT, 1] (sublane s = candidate T - t_lo); byte lookups are
        # one-hot dots against the VMEM backpointer groups (looped per
        # window — the elementwise state ops batch over W).  Semantics
        # identical to consensus_step._traceback_cyc.
        std_o, tr_o = _orders(k)
        odt2 = jnp.float32 if interp else jnp.bfloat16
        Rr, Cc = bps_scr.shape[-2], bps_scr.shape[-1]
        riota2 = jax.lax.broadcasted_iota(jnp.int32, (TT, Rr), 1)
        ciota2 = jax.lax.broadcasted_iota(jnp.int32, (1, TT, Cc), 2)
        colio = jax.lax.broadcasted_iota(jnp.int32, (1, TT, 128), 2)
        v = endv                                             # [W, TT, 1]
        acc = jnp.zeros((W_, TT, 128), jnp.int32)
        for tt in range(t_hi, 0, -1):
            q = (k - tt) % k
            std = q >= h
            g, field = divmod(tt - 1, gsz)
            order = std_o if std else tr_o
            ncol = h if std else k - h
            phys = jnp.zeros_like(v)
            for p, s2 in enumerate(order):
                i = (s2 - q) % k
                phys = phys | (((v >> (2 * i)) & 3) << (2 * (k - 1 - p)))
            r = phys >> (2 * ncol)                           # [W, TT, 1]
            c = phys & ((1 << (2 * ncol)) - 1)
            # group bytes < 2^(2*gsz) <= 256 are bf16-exact; one-hot
            # products/sums exact in f32
            rows2 = []
            for w in range(W_):
                ohr = (riota2 == r[w]).astype(odt2)          # [TT, R]
                plane = bps_scr[tt - 1, w] if pri_tb else bps_scr[w, g]
                rows2.append(jax.lax.dot_general(
                    ohr, plane.astype(odt2),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))     # [TT, C]
            rows2 = jnp.stack(rows2)                         # [W, TT, C]
            ohc = (ciota2 == c).astype(jnp.float32)
            byte = jnp.sum(rows2 * ohc, axis=2,
                           keepdims=True).astype(jnp.int32)  # [W, TT, 1]
            if pri_tb:
                cc2 = 3 - byte                      # plane holds 3 - c
            else:
                cc2 = 3 - ((byte >> (2 * field)) & 3)  # fields hold 3 - c
            act = subl[None] >= (tt - t_lo)                  # tt <= T
            base = jnp.where(act, v & 3, 0)
            acc = jnp.where(colio == (k + tt - 1), base, acc)
            v = jnp.where(act, cc2 * (4 ** (k - 1)) + (v >> 2), v)
        for i in range(k):                                   # source head
            acc = jnp.where(colio == i, (v >> (2 * (k - 1 - i))) & 3, acc)
        # rows beyond nT are never read by the caller (slices tb[:, :nT]);
        # TT is a multiple of the int8 sublane granule (32) so the partial
        # write is tile-aligned.  Rows [TT, 128) stay unwritten garbage.
        bpp_ref[:, :TT] = acc.astype(bpp_ref.dtype)


@functools.partial(jax.jit, static_argnames=("k", "t_lo", "t_hi", "g_step",
                                             "pbw_band", "interpret",
                                             "transpose_impl", "fuse_tb",
                                             "ablate", "cnt_bound", "wpg",
                                             "scr_i8", "pri_tb", "hist_i8",
                                             "ilp"))
def cyc_dbg_dp(ewps, src: jnp.ndarray, snk: jnp.ndarray, pbw=None,
               codes=None,
               *, k: int, t_lo: int, t_hi: int, g_step: int = 0,
               pbw_band: int = -1,
               interpret: bool = False, transpose_impl: str = "xlu",
               fuse_tb: bool = False, ablate: str = "",
               cnt_bound: int = -1, wpg: int = 1, scr_i8: bool = False,
               pri_tb: bool = False, hist_i8: bool = False,
               ilp: bool = False):
    """Default (fuse_tb=False): (bpp [B, nG, R, C] i16 2-bit-packed,
    ends [B, nT] i32 NATURAL, endok [B, nT] bool).

    fuse_tb=True (production): the traceback runs IN-KERNEL (backpointers
    stay in VMEM scratch, never reaching HBM) and the first return value is
    instead tb [B, 128, 128] u8 — decoded candidate rows (sublane = T -
    t_lo, columns [0, k+T) = head k-mer then path bases; only the length
    mask remains for the caller).  Requires k + t_hi <= 128.

    ewps: tuple of h = k//2 phase tables.  With pbw=None: uint16 packed-key
    tables [B, NBT, 16, 4^(k-1-h), 4^h] (consensus_step._build_tables
    edges_layout="phases", or the legacy build_phase_tables pre-permute).
    With pbw (int32 [NB, NB] shared or [B, NB, NB] per-window), one of:
    - ewps = RAW position-bin histogram phase tables
      [B, nbp, 16, 4^(k-1-h), 4^h] bf16/f32 (edges_layout="phases_h"); the
      positional mix + clamp + key-pack runs in-kernel (_cyc_kernel),
      bit-identical to the XLA mix; or
    - codes = (rows, cols), both int32 [B, h, nbp, gp] per-phase row/col
      code arrays (edges_layout="codes", ewps=None, production): the
      histograms themselves are built in-kernel as one-hot MXU dots into
      VMEM scratch, removing the histogram HBM round-trip.  gp = positions
      per bin padded to a lane multiple; invalid/padded positions hold -1.
    pbw_band: static bound with pbw[..., i, j] == 0 for all |i-j| >
    pbw_band (caller-verified; -1 = unknown -> full mix).
    DP step tt uses step-bin min((tt-1)//g_step, nbt-1) of phase
    (k-tt) % k % h.  src/snk: int32 [B, 4^k].
    """
    assert t_lo >= 1 and k % 2 == 0
    B, M = src.shape
    h = k // 2
    if g_step <= 0:
        g_step = max(t_hi, 1)
    R, C = 4 ** (k - h), 4 ** h
    gsz = h
    nG = -(-t_hi // gsz)
    nT = t_hi - t_lo + 1
    assert nT <= 128
    if B % wpg != 0:
        wpg = 1                      # odd tails fall back to one-per-step

    AA, CC = 4 ** (k - 1 - h), 4 ** h
    gp = 0
    scratch_shapes = []
    if pbw is None:
        assert len(ewps) == h
        nbp = 0
        NBT = ewps[0].shape[1]
        ew_spec = pl.BlockSpec((wpg, NBT, 16, AA, CC),
                               lambda b: (b, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM)
        main_in, main_specs = tuple(ewps), (ew_spec,) * h
        extra_in, extra_specs = (), ()
        nbt = NBT
    else:
        if codes is not None:
            assert ewps is None
            rows, cols = codes
            assert rows.shape[1] == h and cols.shape == rows.shape
            nbp, gp = rows.shape[2], rows.shape[3]
            code_spec = pl.BlockSpec((wpg, h, nbp, gp),
                                     lambda b: (b, 0, 0, 0),
                                     memory_space=pltpu.VMEM)
            main_in = (rows, cols)
            main_specs = (code_spec, code_spec)
            s = (k + 2) // 2
            # histogram scratch dtype by the exact per-bin count bound
            # (cnt_bound = D1 * pos_bin positions per position-bin when the
            # caller knows it; the padded gp otherwise).  bf16 for counts
            # <= 256 (8-bit mantissa, exact): round 3 used int8 below 128
            # to halve the VMEM read traffic of the mix, but the on-chip
            # round-4 ablation showed the i8->f32 converts COST ~4ms/batch
            # at the common D1=9 shape (mix stage 4.87ms with i8 scratch
            # vs 0.89ms with direct-f32 reads at D1=65) — the convert
            # unpacking dominates the saved bandwidth.  scr_i8 keeps the
            # old choice selectable for ablation.
            bound = cnt_bound if cnt_bound >= 0 else gp
            scr_dt = (jnp.int8 if (scr_i8 and bound <= 127) else
                      jnp.bfloat16 if bound <= 256 else jnp.float32)
            scratch_shapes = [pltpu.VMEM(
                (wpg, h, nbp, 4 ** s, 4 ** (k + 1 - s)), scr_dt)]
        else:
            assert len(ewps) == h
            nbp = ewps[0].shape[1]
            ew_spec = pl.BlockSpec((wpg, nbp, 16, AA, CC),
                                   lambda b: (b, 0, 0, 0, 0),
                                   memory_space=pltpu.VMEM)
            main_in, main_specs = tuple(ewps), (ew_spec,) * h
        nbt = min(-(-t_hi // g_step), pbw.shape[-1])
        if pbw.ndim == 2:
            pbw_in = pbw[:nbp, :nbt].astype(jnp.int32)[None]
            pbw_spec = pl.BlockSpec((1, nbp, nbt), lambda b: (0, 0, 0),
                                    memory_space=pltpu.SMEM)
        else:
            pbw_in = pbw[:, :nbp, :nbt].astype(jnp.int32)
            pbw_spec = pl.BlockSpec((wpg, nbp, nbt), lambda b: (b, 0, 0),
                                    memory_space=pltpu.SMEM)
        extra_in, extra_specs = (pbw_in,), (pbw_spec,)

    eligp = build_elig_phases(snk > 0, k)
    have_src = src.max(axis=1) > 0
    source = jnp.argmax(src, axis=1).astype(jnp.int32)          # first max
    score0 = jnp.full((B, M), NEG, jnp.int32).at[
        jnp.arange(B), source].set(jnp.where(have_src, 0, NEG)
                                   ).reshape(B, R, C)

    band = nbp if pbw_band < 0 else pbw_band
    if pri_tb:
        assert fuse_tb, "pri_tb requires the fused traceback"
    if fuse_tb:
        assert k + t_hi <= 128, "fused traceback needs k + t_hi <= 128"
        scratch_shapes = scratch_shapes + [
            pltpu.VMEM((t_hi, wpg, R, C), jnp.int8) if pri_tb
            else pltpu.VMEM((wpg, nG, R, C), jnp.int32)]
        out0_shape = jax.ShapeDtypeStruct((B, 128, 128), jnp.uint8)
        out0_spec = pl.BlockSpec((wpg, 128, 128), lambda b: (b, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        out0_shape = jax.ShapeDtypeStruct((B, nG, R, C), jnp.int16)
        out0_spec = pl.BlockSpec((wpg, nG, R, C), lambda b: (b, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
    # deferred end-picking snapshot buffer (one [W, R, C] score copy per
    # candidate step; ~nT * wpg * 256KB at k=8 — within the VMEM budget)
    scratch_shapes = scratch_shapes + [
        pltpu.VMEM((nT, wpg, R, C), jnp.int32)]
    bpp, meta = pl.pallas_call(
        functools.partial(_cyc_kernel, k=k, t_lo=t_lo, t_hi=t_hi,
                          g_step=g_step, nbt=nbt, nbp=nbp, pbw_band=band,
                          transpose_impl=transpose_impl,
                          codes_mode=codes is not None, gp=gp,
                          interp=interpret, fuse_tb=fuse_tb, ablate=ablate,
                          wpg=wpg, pri_tb=pri_tb, hist_i8=hist_i8, ilp=ilp),
        grid=(B // wpg,),
        out_shape=(
            out0_shape,
            jax.ShapeDtypeStruct((B, 8, 128), jnp.int32),
        ),
        in_specs=list(main_specs) + list(extra_specs) + [
            pl.BlockSpec((wpg, h, R, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wpg, R, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, R, C), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            out0_spec,
            pl.BlockSpec((wpg, 8, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=scratch_shapes,
        # block VMEM is ~NBT*2MB ewp (or ~nbp*3MB bf16 H, or the ~21MB
        # bf16 histogram scratch in codes mode) + ~1MB rest; with
        # double-buffering, the in-kernel mixed tables (h * 1MB) and loop
        # temporaries the scoped need stays well under the chip's VMEM
        # (v5e: 128MB).  Raise the 16MB default limit (112MB: wpg=4 at the
        # bench shape needs 103.7MB — measured from the compiler's scoped
        # accounting — and the 100MB round-3 limit rejected it).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 2 ** 20),
        interpret=interpret,
    )(*main_in, *extra_in, eligp, score0, jnp.asarray(_natmaps(k)))
    ends = meta[:, 0, :nT]
    endok = (meta[:, 1, :nT] != 0) & have_src[:, None]
    return bpp, ends, endok
