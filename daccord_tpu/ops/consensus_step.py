"""Dense batched window-consensus device step (JAX/XLA).

The TPU-first reformulation of the reference's per-window pointer-chasing
``DebruijnGraph`` code (gt1/daccord ``src/daccord.cpp``; SURVEY §3.4, §7.1):
a batch of B windows is processed as dense integer tensors over the bounded
k-mer universe 4^k:

- (k+1)-mer edge counts  EC  [B, 4^(k+1)]   (one-hot matmul histogram, MXU)
- source/sink scores     SRC/SNK [B, 4^k]   (Q16-weighted one-hot matmuls)
- heaviest path          max-plus DP over T steps; the predecessor relation
  u = (c << 2(k-1)) | (v >> 2) makes each DP step a pure
  reshape [B,4^k]->[B,4,4^(k-1)] + broadcast add + max over the c axis —
  no gathers (ALGORITHM §4 dense form)
- per-T candidates, traceback via stored 2-bit backpointers
- candidate scoring: batched Levenshtein via a row-scan with an associative
  min-scan for the in-row dependency
- winner: first-min over the increasing-T candidate axis (ALGORITHM §4)

All integer arithmetic; results are bit-identical to the NumPy oracle
(daccord_tpu/oracle/dbg.py) — asserted by tests/test_ops_consensus.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

NEG = -(2 ** 29)
NEG_HALF = -(2 ** 28)
BIG = 2 ** 30
PAD = 4


class ConsensusOut(NamedTuple):
    ok: jnp.ndarray        # bool  [B]   window succeeded
    length: jnp.ndarray    # int32 [B]   winner length (k + T)
    bases: jnp.ndarray     # uint8 [B, LC] winner bases (PAD beyond length)
    cost: jnp.ndarray      # int32 [B]   winner total edit cost


def _rolling_codes(S: jnp.ndarray, k: int, P: int) -> jnp.ndarray:
    """int32 [..., P] codes of k-length windows (digits may include PAD=4;
    callers mask invalid positions)."""
    acc = jnp.zeros(S.shape[:-1] + (P,), dtype=jnp.int32)
    for j in range(k):
        acc = acc * 4 + S[..., j:j + P].astype(jnp.int32)
    return acc


def _build_tables(S: jnp.ndarray, slen: jnp.ndarray, nstr: jnp.ndarray,
                  plq_src: jnp.ndarray, plq_snk: jnp.ndarray,
                  pbw=None, *, k: int, t_hi: int = 0, pos_bin: int = 8,
                  edges_layout: str = "natural"):
    """Stage 1: k-mer/edge histograms -> (src [B,M], snk [B,M], edges).

    edges_layout="natural": edges is int32 [B, NBT, 4^(k+1)] per-step-bin
    edge tables in natural code order (the scan path's input).  With
    pbw=None (unweighted v1), NBT == 1 and entries are raw counts; with a
    pbw kernel (ALGORITHM §4 positional weighting), table j holds the
    Q6-weighted counts for DP steps t with (t-1)//pos_bin == j, saturated
    at PBW_CLAMP (fits the cyc kernel's uint16 packed keys).

    edges_layout="phases": edges is a tuple of h = k//2 uint16 packed-key
    tables [B, NBT, 16, 4^(k-1-h), 4^h] for the cyc kernel, HISTOGRAMMED
    DIRECTLY in each phase layout — the one-hot row/col split of the
    histogram matmul follows the phase's digit permutation
    (pallas_dbg_cyc.phase_digit_seq), so no transposes/pre-permutes are
    needed at all (they measured ~10x slower than the matmuls on-chip).

    edges_layout="codes" (weighted cyc production): edges is (rows, cols),
    int32 [B, h, nbp, gp] per-phase row/col CODE arrays (the same
    phase_digit_seq digit split, but shipped as codes instead of built
    histograms); the cyc kernel builds the histograms itself as one-hot MXU
    dots in VMEM (pallas_dbg_cyc codes mode) — the histogram tensors
    (~3MB/window at k=8) never touch HBM.  Invalid and padded positions
    hold -1 (their one-hot row is all zeros); gp pads D1*g to a lane
    multiple."""
    B, D1, Wp = S.shape
    M = 4 ** k
    M1 = 4 ** (k - 1)
    P1 = Wp - k + 1
    P2 = Wp - k

    Si = S.astype(jnp.int32)
    pos1 = jnp.arange(P1, dtype=jnp.int32)
    pos2 = jnp.arange(P2, dtype=jnp.int32)
    dvalid = (jnp.arange(D1, dtype=jnp.int32)[None, :] < nstr[:, None])  # [B,D1]

    kcodes = _rolling_codes(Si, k, P1)                       # [B,D1,P1]
    kvalid = (pos1[None, None, :] + k <= slen[:, :, None]) & dvalid[:, :, None]
    # (k+1)-mer codes extend the k-mer codes by one base (shared work)
    ecodes = kcodes[..., :P2] * 4 + Si[..., k:k + P2]
    evalid = (pos2[None, None, :] + k + 1 <= slen[:, :, None]) & dvalid[:, :, None]

    # ---- k-mer histograms as MXU one-hot matmuls (the dense TPU-native
    # histogram): count[b, hi, lo] = sum_p onehot_hi[b,p,hi] * onehot_lo[b,p,lo]
    # — an outer-product accumulation over positions, i.e. one batched matmul
    # per table.  Exactness: indicator products are 0/1; per-bin sums are
    # < 2^24 so f32 accumulation is exact; Q16 weights (< 2^17) require f32
    # inputs (bf16 would round them).  Invalid codes (PAD digits) are zeroed
    # via the validity mask; out-of-range hi bins one-hot to nothing.
    def _onehot(codes, bits, dtype):
        nb = 1 << bits
        return (codes[..., None] == jnp.arange(nb, dtype=jnp.int32)
                ).astype(dtype)

    # integer-exactness preconditions of the f32/bf16 matmul histograms
    # (assert at trace time so a future config violating them fails loudly
    # instead of silently rounding): f32 accumulation is exact only while
    # per-bin sums stay < 2^24.  src/snk bins sum Q16 weights whose columns
    # are normalized to ~2^16 (offset_likely_q16), so the bound is D1 * 2^16;
    # edge bins sum 0/1 indicators, so the bound is D1 * P2.
    assert plq_src.dtype == jnp.int32 and plq_snk.dtype == jnp.int32
    assert D1 * 65536 < 2 ** 24, \
        f"src/snk Q16 bins can exceed 2^24 (D1={D1}): f32 not exact"
    assert D1 * P2 < 2 ** 24, \
        f"edge-count bins can exceed 2^24 (D1={D1}, P2={P2}): f32 not exact"

    kb = k  # 2k bits split kb/kb... split as hi=k bits, lo=k bits
    kc_flat = kcodes.reshape(B, D1 * P1)
    kmask = kvalid.reshape(B, D1 * P1)
    khi = _onehot(kc_flat >> k, k, jnp.float32)          # [B,Pf,2^k]
    klo = _onehot(kc_flat & ((1 << k) - 1), k, jnp.float32)
    # plq columns are shared [W'] or PER-WINDOW [B, W'] (positional-eprof
    # table groups mixed in one batch, ALGORITHM §7 v2)
    ps_b = plq_src[None, :P1] if plq_src.ndim == 1 else plq_src[:, :P1]
    pk_b = plq_snk[None, :P1] if plq_snk.ndim == 1 else plq_snk[:, :P1]
    wsrc = (jnp.broadcast_to(ps_b[:, None, :], (B, D1, P1))
            .reshape(B, D1 * P1).astype(jnp.float32) * kmask)
    wsnk = (jnp.broadcast_to(pk_b[:, None, :], (B, D1, P1))
            .reshape(B, D1 * P1).astype(jnp.float32) * kmask)
    src = jnp.einsum("bph,bpl->bhl", khi * wsrc[:, :, None], klo,
                     preferred_element_type=jnp.float32
                     ).reshape(B, M).astype(jnp.int32)
    snk = jnp.einsum("bph,bpl->bhl", khi * wsnk[:, :, None], klo,
                     preferred_element_type=jnp.float32
                     ).reshape(B, M).astype(jnp.int32)

    # ---- edge histograms, positionally binned (ALGORITHM §4) ----
    # position bins ride the einsum batch axis: ONE batched matmul per
    # layout covers all bins (same FLOPs as an unbinned histogram — the
    # contraction axis just splits by bin).  Exactness: per-bin sums
    # <= D1*g < 2^24 (f32-exact); mixed sums <= 64*D1*P2 < 2^24.
    from daccord_tpu.oracle.offset_likely import PBW_CLAMP
    eb = k + 1
    if pbw is None:
        nbp = nbt = 1
        eci = ecodes.reshape(B, 1, D1 * P2)
        emi = evalid.reshape(B, 1, D1 * P2)
    else:
        g = pos_bin
        nbp = -(-P2 // g)
        nbt = min(-(-max(t_hi, 1) // g), pbw.shape[-1])
        assert nbp <= pbw.shape[-2], "pbw table smaller than position range"
        assert 64 * D1 * P2 < 2 ** 24, \
            f"weighted edge bins can exceed 2^24 (D1={D1}, P2={P2})"
        ppad = nbp * g
        ecp, evp = ecodes, evalid
        if ppad != P2:
            ecp = jnp.pad(ecodes, ((0, 0), (0, 0), (0, ppad - P2)))
            evp = jnp.pad(evalid, ((0, 0), (0, 0), (0, ppad - P2)))
        eci = (ecp.reshape(B, D1, nbp, g).transpose(0, 2, 1, 3)
               .reshape(B, nbp, D1 * g))
        emi = (evp.reshape(B, D1, nbp, g).transpose(0, 2, 1, 3)
               .reshape(B, nbp, D1 * g))
    emi_b = emi[..., None].astype(jnp.bfloat16)

    # H dtype: per-(b, n) histogram bins sum at most D1*g 0/1 indicators; when
    # that bound is <= 256 every count is exactly representable in bf16
    # (8-bit mantissa), so H can be MATERIALIZED in bf16 — halving the HBM
    # traffic of the dominant tensors of this stage (the mix einsum then runs
    # MXU-native bf16 x bf16 -> f32: products pbw*count <= 64*256 = 2^14 are
    # exact, per-bin sums over nbp <= 2^24 accumulate exactly in f32).
    # Falls back to f32 for deep piles / the unweighted path (counts up to
    # D1*P2 exceed 256).
    hdt = (jnp.bfloat16 if pbw is not None and D1 * pos_bin <= 256
           else jnp.float32)

    def _mix(H):
        """[B, nbp, R, C] f32/bf16 counts -> [B, nbt, R, C] int32 step-bin
        weighted tables (identity when unweighted).  pbw is shared [NB, NB]
        or per-window [B, NB, NB]; Q6 values <= 64 are bf16-exact.

        NOTE (perf): this XLA mix materializes the f32 dot output before the
        clamp/pack consumer (~2x the stage's HBM traffic); the production
        cyc path therefore skips it entirely — edges_layout="phases_h" ships
        the raw H phase tables and the Pallas kernel mixes in-VMEM
        (pallas_dbg_cyc, bit-identical f32 arithmetic).  This form remains
        the scan/TP/natural path's mix.  Dot operands are f32: the CPU
        backend rejects bf16 x bf16 -> f32 dots at dispatch ("Unsupported
        element type for DotThunk"), and exactness needs f32 anyway when H
        was materialized f32."""
        if pbw is None:
            return H.astype(jnp.int32)
        Hf = H.astype(jnp.float32)
        if pbw.ndim == 2:
            pbw_f = pbw[:nbp, :nbt].astype(jnp.float32)
            W = jnp.einsum("ij,birc->bjrc", pbw_f, Hf,
                           preferred_element_type=jnp.float32
                           ).astype(jnp.int32)
        else:
            pbw_f = pbw[:, :nbp, :nbt].astype(jnp.float32)
            W = jnp.einsum("bij,birc->bjrc", pbw_f, Hf,
                           preferred_element_type=jnp.float32
                           ).astype(jnp.int32)
        return jnp.minimum(W, PBW_CLAMP)

    if edges_layout == "natural":
        ehi = _onehot(eci >> eb, eb, jnp.bfloat16) * emi_b
        elo = _onehot(eci & ((1 << eb) - 1), eb, jnp.bfloat16)
        H = jnp.einsum("bngh,bngl->bnhl", ehi, elo,
                       preferred_element_type=jnp.float32).astype(hdt)
        # natural (k+1)-mer counts: e = c*4^k + h*4 + bb; the scan path
        # derives its [B,NBT,4,4,M1] int16 layout from this
        edges = _mix(H).reshape(B, nbt, 4 ** (k + 1))
    elif edges_layout == "codes":
        # per-phase row/col codes only — the cyc kernel histograms them
        # in-VMEM (one-hot MXU dots); nothing histogram-sized touches HBM
        from daccord_tpu.ops.pallas_dbg_cyc import phase_digit_seq
        assert pbw is not None, "codes layout is the weighted cyc path"
        h2 = k // 2
        s = (k + 2) // 2
        gD1 = eci.shape[-1]                       # D1 * g positions per bin
        gp = -(-gD1 // 128) * 128
        rows = [None] * h2
        cols = [None] * h2
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
            rows[(k - 1 - j) % h2] = jnp.where(emi, row, -1)
            cols[(k - 1 - j) % h2] = jnp.where(emi, col, -1)
        rows = jnp.stack(rows, 1)                 # [B, h, nbp, gD1]
        cols = jnp.stack(cols, 1)
        if gp != gD1:
            padw = ((0, 0), (0, 0), (0, 0), (0, gp - gD1))
            rows = jnp.pad(rows, padw, constant_values=-1)
            cols = jnp.pad(cols, padw, constant_values=-1)
        edges = (rows, cols)
    else:                     # "phases"/"phases_h": cyc kernel tables
        from daccord_tpu.ops.pallas_dbg_cyc import phase_digit_seq
        h2 = k // 2
        s = (k + 2) // 2                     # row digits: both one-hot
        #                                      widths >= 4^s ~ MXU-friendly
        tabs = [None] * h2
        rows_iota = jnp.arange(4 ** s, dtype=jnp.int32)[:, None]
        pr = 3 - (rows_iota >> (2 * (s - 1)))        # 3 - c per table row
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
            ehi = _onehot(row, 2 * s, jnp.bfloat16) * emi_b
            elo = _onehot(col, 2 * (k + 1 - s), jnp.bfloat16)
            H = jnp.einsum("bngh,bngl->bnhl", ehi, elo,
                           preferred_element_type=jnp.float32).astype(hdt)
            if edges_layout == "phases_h":
                # raw per-position-bin histograms for the kernel's in-VMEM
                # mix (requires pbw; cyc_dbg_dp(pbw=...) path)
                tabs[(k - 1 - j) % h2] = H.reshape(
                    B, nbp, 16, 4 ** (k - 1 - h2), 4 ** h2)
                continue
            W = _mix(H)                       # [B, nbt, 4^s, 4^(k+1-s)]
            key = jnp.where(W > 0, (W << 2) + pr, 0).astype(jnp.uint16)
            tabs[(k - 1 - j) % h2] = key.reshape(
                B, nbt, 16, 4 ** (k - 1 - h2), 4 ** h2)
        edges = tuple(tabs)
    return src, snk, edges


def _dp(edges, src: jnp.ndarray, snk: jnp.ndarray,
        *, k: int, t_lo: int, t_hi: int, g_step: int, dp_impl: str,
        pbw=None, pbw_band: int = -1, edges_layout: str = "",
        cnt_bound: int = -1):
    """Stage 2: max-plus heaviest-path DP.

    edges: per-step-bin edge tables from _build_tables — int32
    [B, NBT, 4^(k+1)] natural layout for the scan paths, the tuple of
    uint16/raw-histogram phase tables for the cyc kernel, or the (rows,
    cols) code pair for the cyc kernel's in-VMEM histogram path
    (edges_layout="codes").  DP step t uses table min((t-1)//g_step, NBT-1).

    Returns (bp_repr, ends [B,nT], endok) where bp_repr is
    ('dense', bps [t_hi,B,4,M1] u8) for the scan/legacy-pallas paths or
    ('cyc', bpp [B,nG,R,C] u8 2-bit-packed) for the cycling-digit kernel.
    """
    B, M = src.shape
    M1 = 4 ** (k - 1)

    if dp_impl.startswith("cyc"):
        from daccord_tpu.ops.pallas_dbg_cyc import cyc_dbg_dp
        assert isinstance(edges, tuple), \
            "cyc DP needs edges_layout='phases'/'phases_h'/'codes' tables"
        if edges_layout == "codes":
            ewps, codes = None, edges
        else:
            ewps, codes = edges, None
        # traceback fuses into the kernel (backpointers never leave VMEM)
        # unless the 'xtb' ablation (XLA-side traceback) is requested or
        # t_hi won't fit the candidate block
        fuse_tb = "xtb" not in dp_impl and k + t_hi <= 128
        # windows per grid step: depth-dependent since round 4, probed on
        # chip at B=256 (scripts/probe_wpg_scr.py).  Shallow shapes use
        # the bf16 histogram scratch (D1 * pos_bin <= 256, counts exact)
        # and favor wpg=1: 15.56ms < wpg=2 16.47 < wpg=4 18.27 at D1=9 —
        # round 3's wpg=2 win belonged to the int8 scratch's i8->f32
        # converts (20.52/19.19/18.27 with i8).  Deep shapes (f32
        # scratch) favor wpg=2: 22.13ms < wpg=1 23.5-23.7 at D1=65
        # (wpg=4 exceeds the 112MB VMEM limit there).  '_w1'/'_w2'/'_w4'
        # dp_impl tokens override for ablation; all bit-identical per
        # window.
        # cnt_bound == D1 * pos_bin on the production codes path; the
        # bf16/f32 scratch boundary is exactly cnt_bound <= 256
        deep = not (0 <= cnt_bound <= 256)
        wpg = (1 if "_w1" in dp_impl else 2 if "_w2" in dp_impl
               else 4 if "_w4" in dp_impl else (2 if deep else 1))
        # per-step int8 priority scratch ('_pri' token): replaces 3 int32
        # bookkeeping passes per DP step with one quarter-width store.
        # Measured NEUTRAL-to-slightly-worse on-chip (probe_pri_tb.py:
        # 15.64 vs 15.51ms at D1=9/wpg=1; 22.26 vs 22.37 at D1=65/wpg=2)
        # — the DP chain is latency-bound, not pass-count-bound — so the
        # 2-bit group packing stays the default; kept selectable for
        # ablation on future hardware.
        pri_tb = fuse_tb and "_pri" in dp_impl
        bpp, ends, endok = cyc_dbg_dp(
            ewps, src, snk, pbw, codes,
            k=k, t_lo=t_lo, t_hi=t_hi, g_step=g_step,
            pbw_band=pbw_band,
            interpret=dp_impl.endswith("interpret"),
            transpose_impl="mxu" if "mxu" in dp_impl else "xlu",
            fuse_tb=fuse_tb, cnt_bound=cnt_bound, wpg=wpg, pri_tb=pri_tb)
        return ("cyc_fused" if fuse_tb else "cyc", bpp), ends, endok
    ecnb = edges
    NBT = ecnb.shape[1]

    # natural e -> TPU-friendly [B, NBT, 4(c), 4(bb), M1(h)] (big axis LAST
    # so VPU lanes are full in the DP).  ec[b, j, c, bb, h]: weighted count
    # of edge u=(c,h) -> v=(h,bb) in step-bin j.  Stored int16 (counts
    # <= PBW_CLAMP < 2^15) with -1 as the no-edge sentinel: halves the HBM
    # read per DP step; widened to int32/NEG in-register at use.
    ec = ecnb.reshape(B, NBT, 4, M1, 4).transpose(0, 1, 2, 4, 3)
    ew16b = jnp.where(ec > 0, ec, -1).astype(jnp.int16)

    have_src = src.max(axis=1) > 0
    source = jnp.argmax(src, axis=1).astype(jnp.int32)       # first max

    score0 = jnp.full((B, M), NEG, jnp.int32).at[
        jnp.arange(B), source].set(jnp.where(have_src, 0, NEG))

    def pick_end(sc):
        elig = (snk > 0) & (sc > NEG_HALF)
        masked = jnp.where(elig, sc, NEG)
        return (jnp.argmax(masked, axis=1).astype(jnp.int32),
                masked.max(axis=1) > NEG_HALF)

    def dp_core(sc, ew16):
        # score flat [B, M] in natural code order; as predecessor u = (c, h)
        scr = sc.reshape(B, 4, M1)
        # unrolled 4-way max keeps one pass over memory and first-max tie
        # semantics (strict '>' preserves the smallest c, matching the oracle)
        def edge(c):
            e16 = ew16[:, c]
            return jnp.where(e16 < 0, NEG, e16.astype(jnp.int32))
        best = scr[:, 0, None, :] + edge(0)                  # [B,4(bb),M1]
        bp = jnp.zeros_like(best, dtype=jnp.uint8)
        for c in range(1, 4):
            cand = scr[:, c, None, :] + edge(c)
            m = cand > best
            best = jnp.where(m, cand, best)
            bp = jnp.where(m, jnp.uint8(c), bp)
        # reachable scores are always >= 0; anything below NEG_HALF is
        # unreachable and pinned to exactly NEG (oracle semantics: no score
        # accumulation through dead nodes)
        best = jnp.where(best > NEG_HALF, best, NEG)
        # relabel (bb, h) -> natural v = h*4 + bb for the next step
        return best.transpose(0, 2, 1).reshape(B, M), bp

    if dp_impl.startswith("pallas") and t_lo >= 1 and NBT == 1:
        # VMEM-resident DP kernel (ops/pallas_dbg.py, legacy interpret-only
        # path; unweighted tables only): edge tensor read from HBM once per
        # window instead of once per step
        from daccord_tpu.ops.pallas_dbg import pallas_dbg_dp
        bps, ends, endok = pallas_dbg_dp(
            ew16b[:, 0], src, snk, k=k, t_lo=t_lo, t_hi=t_hi,
            interpret=dp_impl.endswith("interpret"))
    else:
        # one scan segment per step-bin (table is constant within a bin);
        # within each segment the end-state argmax over [B, 4^k] runs on
        # steps >= t_lo only (the head/tail split of round 1, generalized)
        sc = score0
        bps_parts, ends_parts, endok_parts = [], [], []
        for jb in range(NBT):
            seg_lo = jb * g_step + 1
            seg_hi = min((jb + 1) * g_step, t_hi) if jb < NBT - 1 else t_hi
            if seg_lo > t_hi:
                break
            ew16 = ew16b[:, jb]

            def dp_step_head(s, _, ew16=ew16):
                newf, bp = dp_core(s, ew16)
                return newf, bp                              # no end-picking

            def dp_step_tail(s, _, ew16=ew16):
                newf, bp = dp_core(s, ew16)
                e, okk = pick_end(newf)
                return newf, (bp, e, okk)

            n_head = max(0, min(t_lo - 1, seg_hi) - seg_lo + 1)
            n_tail = seg_hi - seg_lo + 1 - n_head
            if n_head:
                sc, bh = jax.lax.scan(dp_step_head, sc, None, length=n_head)
                bps_parts.append(bh)
            if n_tail:
                sc, (bt, et, okt) = jax.lax.scan(dp_step_tail, sc, None,
                                                 length=n_tail)
                bps_parts.append(bt)
                ends_parts.append(et)
                endok_parts.append(okt)
        if bps_parts:
            bps = jnp.concatenate(bps_parts, axis=0)         # [t_hi,B,4,M1]
        else:                                                # t_hi == 0
            bps = jnp.zeros((0, B, 4, M1), jnp.uint8)
        if ends_parts:
            ends_tail = jnp.concatenate(ends_parts, axis=0)
            endok_tail = jnp.concatenate(endok_parts, axis=0)
        else:
            ends_tail = jnp.zeros((0, B), jnp.int32)
            endok_tail = jnp.zeros((0, B), bool)
        if t_lo == 0:
            e0, ok0 = pick_end(score0)
            ends = jnp.concatenate([e0[None], ends_tail],
                                   axis=0).transpose(1, 0)
            endok = jnp.concatenate([ok0[None], endok_tail],
                                    axis=0).transpose(1, 0) & have_src[:, None]
        else:
            # tail parts cover steps t_lo .. t_hi exactly
            ends = ends_tail.transpose(1, 0)                 # [B, nT]
            endok = endok_tail.transpose(1, 0) & have_src[:, None]
    return ("dense", bps), ends, endok


def _traceback(bps: jnp.ndarray, ends: jnp.ndarray,
               *, k: int, t_lo: int, t_hi: int):
    """Stage 3: decode every (window, T) candidate -> (cands [B,nT,LC], lc)."""
    B, nT = ends.shape
    M1 = 4 ** (k - 1)
    LC = k + t_hi
    Ts = jnp.arange(t_lo, t_hi + 1, dtype=jnp.int32)[None, :]    # [1, nT]
    v = ends
    bases = jnp.full((B, nT, t_hi), 0, dtype=jnp.uint8)
    b_idx = jnp.arange(B)[:, None]

    def tb_step(carry, t):
        v, bases = carry
        act = t <= Ts                                        # [B,nT] (t>=1)
        base = (v & 3).astype(jnp.uint8)
        c = bps[t - 1, b_idx, v & 3, v >> 2].astype(jnp.int32)   # [B,nT]
        vprev = c * M1 + (v >> 2)
        bases = bases.at[:, :, t - 1].set(jnp.where(act, base, bases[:, :, t - 1]))
        v = jnp.where(act, vprev, v)
        return (v, bases), None

    (v, bases), _ = jax.lax.scan(tb_step, (v, bases),
                                 jnp.arange(t_hi, 0, -1), length=t_hi)
    return _finish_traceback(v, bases, k=k, t_lo=t_lo, t_hi=t_hi)


def _finish_traceback(v, bases, *, k: int, t_lo: int, t_hi: int):
    """Shared tail of stage 3: decode the source k-mer head and pad."""
    B, nT = v.shape
    LC = k + t_hi
    Ts = jnp.arange(t_lo, t_hi + 1, dtype=jnp.int32)[None, :]
    head = jnp.stack([(v >> (2 * (k - 1 - i))) & 3 for i in range(k)],
                     axis=-1).astype(jnp.uint8)              # [B,nT,k]
    cands = jnp.concatenate([head, bases], axis=-1)          # [B,nT,k+t_hi]
    lc = (k + Ts).astype(jnp.int32) * jnp.ones((B, 1), jnp.int32)  # [B,nT]
    cpos = jnp.arange(LC, dtype=jnp.int32)[None, None, :]
    cands = jnp.where(cpos < lc[:, :, None], cands, PAD).astype(jnp.uint8)
    return cands, lc


def _finish_traceback_fused(tb: jnp.ndarray, *, k: int, t_lo: int,
                            t_hi: int):
    """Stage 3 for the kernel-fused traceback: the cyc kernel already
    decoded candidate rows (head + path bases) into tb [B, 128, 128] u8;
    only the slice and the length mask remain."""
    B = tb.shape[0]
    nT = t_hi - t_lo + 1
    LC = k + t_hi
    Ts = jnp.arange(t_lo, t_hi + 1, dtype=jnp.int32)[None, :]
    cands = tb[:, :nT, :LC]
    lc = (k + Ts).astype(jnp.int32) * jnp.ones((B, 1), jnp.int32)
    cpos = jnp.arange(LC, dtype=jnp.int32)[None, None, :]
    cands = jnp.where(cpos < lc[:, :, None], cands, PAD).astype(jnp.uint8)
    return cands, lc


def _traceback_cyc(bpp: jnp.ndarray, ends: jnp.ndarray,
                   *, k: int, t_lo: int, t_hi: int):
    """Stage 3 for the cycling-digit kernel's 2-bit-packed backpointers.

    bpp [B, nG, R, C] uint8: group g byte at the PHYSICAL position of the
    post-step state holds steps g*h+1..(g+1)*h, 2 bits per step (field =
    (tt-1) % h).  States here are NATURAL k-mer codes; only the bp lookup
    maps natural -> physical (a static digit permutation per step, so the
    loop is unrolled — every shift amount is a Python int).
    """
    from daccord_tpu.ops.pallas_dbg_cyc import _orders
    B, nT = ends.shape
    h = k // 2
    gsz = h
    Ts = jnp.arange(t_lo, t_hi + 1, dtype=jnp.int32)[None, :]    # [1, nT]
    std_o, tr_o = _orders(k)
    v = ends
    b_idx = jnp.arange(B)[:, None]
    bases_cols = [None] * t_hi

    # TPU: the t_hi data-dependent [B, nT] gathers cost ~150us each as
    # gather HLOs; a one-hot row-select dot reads the same bytes at stream
    # bandwidth (bpp values < 2^8 are bf16-exact, one-hot products/sums are
    # exact in f32).  CPU (interpret-mode tests) keeps the gather — fast
    # there, and the CPU backend rejects bf16 x bf16 dots at dispatch.
    try:
        use_onehot = jax.devices()[0].platform == "tpu"
    except Exception:
        use_onehot = False
    if use_onehot:
        bppf = bpp.astype(jnp.bfloat16)                          # [B,nG,R,C]
        CC = 4 ** h                                              # R == C
        c_iota = jnp.arange(CC, dtype=jnp.int32)

    for tt in range(t_hi, 0, -1):
        q = (k - tt) % k
        std = q >= h
        g, field = divmod(tt - 1, gsz)
        order = std_o if std else tr_o
        ncol = h if std else k - h
        # physical flat index: order[p] lists slots msb->lsb; slot s holds
        # natural digit (s - q) mod k (see pallas_dbg_cyc._natmap)
        phys = jnp.zeros_like(v)
        for p, s in enumerate(order):
            i = (s - q) % k
            phys = phys | (((v >> (2 * i)) & 3) << (2 * (k - 1 - p)))
        r = phys >> (2 * ncol)
        c = phys & ((1 << (2 * ncol)) - 1)
        if use_onehot:
            ohr = (r[:, :, None] == c_iota).astype(jnp.bfloat16)  # [B,nT,R]
            rows = jnp.einsum("bnr,brc->bnc", ohr, bppf[:, g],
                              preferred_element_type=jnp.float32)
            ohc = (c[:, :, None] == c_iota).astype(jnp.float32)
            byte = (rows * ohc).sum(axis=-1).astype(jnp.int32)    # [B, nT]
        else:
            byte = bpp[:, g][b_idx, r, c].astype(jnp.int32)       # [B, nT]
        cc = 3 - ((byte >> (2 * field)) & 3)   # bp fields hold 3 - c
        act = tt <= Ts
        bases_cols[tt - 1] = jnp.where(act, (v & 3), 0).astype(jnp.uint8)
        v = jnp.where(act, cc * (4 ** (k - 1)) + (v >> 2), v)

    bases = jnp.stack(bases_cols, axis=-1)                       # [B,nT,t_hi]
    return _finish_traceback(v, bases, k=k, t_lo=t_lo, t_hi=t_hi)


def _cand_dists_rows(S: jnp.ndarray, slen: jnp.ndarray, cands: jnp.ndarray,
                     *, k: int, t_lo: int, t_hi: int):
    """Levenshtein(cand, s) for every (b, ti, d) — cell-per-element row scan.

    Superseded as the default by _cand_dists_myers (same values bit-for-bit,
    ~5x fewer VPU element-ops); kept as the ablation/cross-check
    implementation (tests/test_ops_consensus.py asserts equality).

    TPU layout: the DP row axis j (Wp+1 ~ 49) goes FIRST (sublanes); the
    problem axes (B, nT, D1) fill the lanes.  D[i][slen] is captured at
    i == lc via a one-hot multiply-reduce (no per-column gathers).
    int8 rows: all DP values are bounded by LC + Wp < 2^7 (exactness kept,
    HBM traffic halved).
    """
    B, D1, Wp = S.shape
    nT = t_hi - t_lo + 1
    LC = k + t_hi
    # candidate lengths are static per slot: m = k + t_lo + ti
    lc = jnp.broadcast_to(
        jnp.arange(k + t_lo, k + t_hi + 1, dtype=jnp.int32)[None, :],
        (B, nT))
    jr_c = jnp.arange(Wp + 1, dtype=jnp.int8)[:, None, None, None]
    row0 = jnp.broadcast_to(jr_c, (Wp + 1, B, nT, D1)).astype(jnp.int8)
    out0 = jnp.broadcast_to(slen[:, None, :], (B, nT, D1)).astype(jnp.int32)
    ST = S.transpose(2, 0, 1)[:, :, None, :]                 # [Wp,B,1,D1]
    end_onehot = (jr_c == slen[None, :, None, :].astype(jnp.int8)
                  ).astype(jnp.int8)

    # candidate columns ride the scan's xs (leading-axis slices) — indexing
    # cands by the traced step counter would lower to a dynamic gather per
    # step (~48 of them, measured several ms of pure gather overhead)
    candsT = cands.transpose(2, 0, 1)                        # [LC, B, nT]

    def sc_row(row, i, ci):
        sub = (ci[None, :, :, None] != ST).astype(jnp.int8)  # [Wp,B,nT,D1]
        tmp = jnp.minimum(row[:-1] + sub, row[1:] + jnp.int8(1))
        headc = jnp.full((1, B, nT, D1), 0, jnp.int8) + i.astype(jnp.int8)
        t2 = jnp.concatenate([headc, tmp], axis=0) - jr_c
        acc = jax.lax.associative_scan(jnp.minimum, t2, axis=0)
        return acc + jr_c

    def sc_step_head(row, x):
        i, ci = x
        return sc_row(row, i, ci), None

    def sc_step_tail(carry, x):
        i, ci = x
        row, out = carry
        row = sc_row(row, i, ci)
        at_end = (row * end_onehot).sum(axis=0).astype(jnp.int32)  # [B,nT,D1]
        out = jnp.where(lc[:, :, None] == i, at_end, out)
        return (row, out), None

    # candidate lengths lie in [k+t_lo, LC]: capture D[lc][slen] only there
    n_sc_head = k + t_lo - 1
    row_mid, _ = jax.lax.scan(
        sc_step_head, row0,
        (jnp.arange(1, n_sc_head + 1), candsT[:n_sc_head]),
        length=n_sc_head)
    (_, dist), _ = jax.lax.scan(
        sc_step_tail, (row_mid, out0),
        (jnp.arange(n_sc_head + 1, LC + 1), candsT[n_sc_head:]),
        length=LC - n_sc_head)
    return dist


def _cand_dists_myers(S: jnp.ndarray, slen: jnp.ndarray, cands: jnp.ndarray,
                      *, k: int, t_lo: int, t_hi: int):
    """Levenshtein(cand, s) for every (b, ti, d) — Myers/Hyyro bit-parallel.

    The candidate (pattern) spans the bit vectors (NW = ceil(LC/32) uint32
    words per problem — 2 at the bench shape); the scan runs over the pile
    string's Wp chars.  Per step ~35 word-ops on [NW, B, nT, D1] replace the
    row scan's ~11 passes over [Wp+1, B, nT, D1] — ~(Wp+1)/(3*NW) ~ 5-8x
    fewer VPU element-ops at typical shapes.  Same recurrence as the host
    front half's native/realign.cpp myers_capture_rows (Hyyro d0-form with
    the (hp << 1) | 1 carry-in pinning the global D[0][j] = j boundary);
    distances are exact integers, so the winner pick downstream is
    bit-identical to the row-scan path (asserted by tests).

    Candidate lengths are static per candidate slot (m = k + t_lo + ti), so
    the score bit m-1 masks are compile-time constants; D[m][slen] is
    captured at scan step j == slen (slen == 0 rows start captured at
    D[m][0] = m).  Pattern bits >= m are PAD-coded in cands (never equal a
    real base) and carries only propagate upward, so they cannot perturb
    bits < m.
    """
    B, D1, Wp = S.shape
    nT = t_hi - t_lo + 1
    LC = k + t_hi
    NW = -(-LC // 32)
    u32 = jnp.uint32

    # pattern bitmasks PM[c][w]: bit p of word w set iff cand char 32w+p == c
    ci = cands.astype(jnp.int32)                             # [B, nT, LC]
    PM = [[None] * NW for _ in range(4)]
    for c in range(4):
        eqc = (ci == c)                                      # [B, nT, LC]
        for wd in range(NW):
            acc = jnp.zeros((B, nT), u32)
            for p in range(32 * wd, min(32 * (wd + 1), LC)):
                acc = acc | (eqc[:, :, p].astype(u32) << u32(p - 32 * wd))
            PM[c][wd] = acc[:, :, None]                      # [B, nT, 1]

    # static score-bit masks: candidate ti has m = k + t_lo + ti
    mws = np.zeros((NW, nT), np.uint32)
    for ti in range(nT):
        m = k + t_lo + ti
        mws[(m - 1) // 32, ti] = np.uint32(1) << np.uint32((m - 1) % 32)
    msel = [jnp.asarray(mws[wd])[None, :, None] for wd in range(NW)]

    shape = (B, nT, D1)
    ones = jnp.full(shape, 0xFFFFFFFF, u32)
    # D[m][0] = m from the SAME static per-slot length the score-bit masks
    # (msel) are baked from — the two cannot diverge by construction
    score0 = jnp.broadcast_to(
        jnp.arange(k + t_lo, k + t_hi + 1, dtype=jnp.int32)[None, :, None],
        shape)
    out0 = jnp.where(slen[:, None, :] == 0, score0, 0)
    slen_b = slen[:, None, :]                                # [B, 1, D1]
    STj = S.transpose(2, 0, 1).astype(jnp.int32)             # [Wp, B, D1]

    def step(carry, x):
        VP, VN, score, out = carry
        j, sj = x                                            # sj [B, D1]
        chm = [(sj[:, None, :] == c) for c in range(4)]      # [B, 1, D1]
        dz = jnp.zeros(shape, u32)
        hps_l, hns_l, d0_l = [], [], []
        carry_add = dz
        sd = jnp.zeros(shape, jnp.int32)
        hp_in, hn_in = jnp.full(shape, 1, u32), dz
        for wd in range(NW):
            vp, vn = VP[wd], VN[wd]
            eq = dz
            for c in range(4):
                eq = eq | jnp.where(chm[c], PM[c][wd], u32(0))
            x1 = eq & vp
            s1 = x1 + vp
            c1 = (s1 < x1).astype(u32)
            s2 = s1 + carry_add
            carry_add = c1 | (s2 < carry_add).astype(u32)
            d0 = (s2 ^ vp) | eq | vn
            hp = vn | ~(d0 | vp)
            hn = vp & d0
            sd = (sd + ((hp & msel[wd]) != 0).astype(jnp.int32)
                  - ((hn & msel[wd]) != 0).astype(jnp.int32))
            hps_l.append((hp << 1) | hp_in)
            hns_l.append((hn << 1) | hn_in)
            hp_in, hn_in = hp >> 31, hn >> 31
            d0_l.append(d0)
        score = score + sd
        nVP = tuple(hns_l[wd] | ~(d0_l[wd] | hps_l[wd]) for wd in range(NW))
        nVN = tuple(hps_l[wd] & d0_l[wd] for wd in range(NW))
        out = jnp.where(slen_b == j, score, out)
        return (nVP, nVN, score, out), None

    init = (tuple(ones for _ in range(NW)),
            tuple(jnp.zeros(shape, u32) for _ in range(NW)), score0, out0)
    (_, _, _, dist), _ = jax.lax.scan(
        step, init, (jnp.arange(1, Wp + 1), STj), length=Wp)
    return dist


def _score_pick(S: jnp.ndarray, slen: jnp.ndarray, nstr: jnp.ndarray,
                cands: jnp.ndarray, endok: jnp.ndarray,
                *, k: int, w: int, t_lo: int, t_hi: int,
                e_q6: int, score_impl: str = "myers") -> ConsensusOut:
    """Stage 4: batched Levenshtein scoring + first-min winner pick.

    score_impl: 'myers' (default, bit-parallel) | 'rows' (the cell-per-
    element scan, kept for ablation) — identical distances, identical pick.
    Candidate lengths are static per slot (m = k + t_lo + ti); both scorers
    derive them internally, so no runtime length can disagree with the
    compile-time score-bit masks.
    """
    B, D1, _ = S.shape
    LC = k + t_hi
    dists = _cand_dists_myers if score_impl == "myers" else _cand_dists_rows
    dist = dists(S, slen, cands, k=k, t_lo=t_lo, t_hi=t_hi)
    dvalid = (jnp.arange(D1, dtype=jnp.int32)[None, :] < nstr[:, None])
    dist = jnp.where(dvalid[:, None, :], dist, 0)            # mask pad strings
    cost = dist.sum(axis=2).astype(jnp.int32)                # [B,nT]
    cost = jnp.where(endok, cost, BIG)

    win = jnp.argmin(cost, axis=1).astype(jnp.int32)         # first min
    wincost = jnp.take_along_axis(cost, win[:, None], axis=1)[:, 0]
    ok = (wincost < BIG) & (nstr > 0)
    if e_q6 < 1_000_000:
        # -e max window error (ALGORITHM §4): integer-exact int64 compare
        ok &= (wincost.astype(jnp.int64) * 1_000_000
               <= jnp.int64(e_q6) * nstr.astype(jnp.int64) * w)
    winlen = jnp.where(ok, k + t_lo + win, 0).astype(jnp.int32)
    winbases = jnp.take_along_axis(
        cands, win[:, None, None], axis=1)[:, 0, :]          # [B, LC]
    winbases = jnp.where(jnp.arange(LC)[None, :] < winlen[:, None],
                         winbases, PAD).astype(jnp.uint8)
    return ConsensusOut(ok=ok, length=winlen, bases=winbases, cost=wincost)


def default_dp_impl() -> str:
    """'cyc' (VMEM-resident Pallas DBG kernel) on real TPU backends, 'scan'
    elsewhere (CPU has no Mosaic; interpret mode is far slower than the XLA
    scan).  Measured on v5e: cyc = 2.6x scan for the whole consensus step."""
    try:
        platform = jax.devices()[0].platform
    except Exception:                                # no backend yet
        return "scan"
    return "cyc" if platform == "tpu" else "scan"


@functools.partial(jax.jit,
                   static_argnames=("k", "w", "path_delta", "e_q6", "dp_impl",
                                    "pos_bin", "pbw_band", "tp_sharding"))
def _consensus_step_jit(S: jnp.ndarray, slen: jnp.ndarray, nstr: jnp.ndarray,
                        plq_src: jnp.ndarray, plq_snk: jnp.ndarray,
                        pbw, *, k: int, w: int, path_delta: int,
                        e_q6: int, dp_impl: str, pos_bin: int,
                        pbw_band: int = -1,
                        tp_sharding=None) -> ConsensusOut:
    """One batched consensus pass at k-mer size k.

    S:    uint8 [B, D1, W']  pile strings (row 0 = A substring), PAD beyond slen
    slen: int32 [B, D1]      string lengths
    nstr: int32 [B]          valid rows (0 => padding slot / failed window)
    plq_src/plq_snk: int32 [W'] Q16 offset-likelihood columns o=0 and o=w-k
    pbw:  int32 [NB, NB] positional edge-weight kernel, or None (ALGORITHM §4)

    The stages (_build_tables -> _dp -> _traceback -> _score_pick) are split
    out only so they can be profiled / reused individually; under this jit
    they trace inline exactly as before.
    """
    t_exp = w - k
    t_lo = max(0, t_exp - path_delta)
    t_hi = t_exp + path_delta
    g_step = pos_bin if pbw is not None else max(t_hi, 1)
    if dp_impl.startswith("cyc") and not (t_lo >= 1 and k % 2 == 0
                                          and k <= 8
                                          and tp_sharding is None):
        dp_impl = "scan"       # cyc preconditions unmet (or TP requested:
        #                        the pallas kernel is per-device; TP
        #                        partitions the scan path via GSPMD).
        #                        k > 8: the dense VMEM footprint scales
        #                        with 4^k (score grid + backpointer groups
        #                        + end snapshots) and exceeds the budget —
        #                        larger k belongs to the sparse step.
    use_cyc = dp_impl.startswith("cyc")
    if use_cyc and pbw is None:
        # cyc phase tables store packed keys count*4 + 3 in uint16; the max
        # possible unweighted edge count is D1 * P2 (weighted tables are
        # saturated at PBW_CLAMP, always in range)
        D1, Wp = S.shape[1], S.shape[2]
        assert D1 * (Wp - k) * 4 + 3 < 2 ** 16, \
            f"cyc packed edge keys can exceed uint16 (D1={D1}, W'={Wp})"
    if use_cyc:
        if pbw is not None:
            # weighted: ship per-phase row/col CODES; the kernel builds the
            # histograms as one-hot MXU dots in VMEM and mixes there too —
            # neither the raw histograms nor the mixed tables touch HBM.
            # "cyc_hbm*" keeps the previous ablation point (XLA-built raw H
            # phase tables in HBM, in-kernel mix only).
            layout = "phases_h" if dp_impl.startswith("cyc_hbm") else "codes"
        else:
            layout = "phases"
    else:
        layout = "natural"
    src, snk, edges = _build_tables(
        S, slen, nstr, plq_src, plq_snk, pbw, k=k, t_hi=t_hi,
        pos_bin=pos_bin, edges_layout=layout)
    if tp_sharding is not None:
        # TP (SURVEY §2.4): pin the (k+1)-mer universe axis to the `model`
        # mesh axis; GSPMD propagates the split through the DP tables and
        # inserts the collectives for the per-step digit relabel
        edges = jax.lax.with_sharding_constraint(edges, tp_sharding)
    (bp_tag, bps), ends, endok = _dp(edges, src, snk, k=k, t_lo=t_lo,
                                     t_hi=t_hi, g_step=g_step,
                                     dp_impl=dp_impl,
                                     pbw=pbw if use_cyc else None,
                                     pbw_band=pbw_band, edges_layout=layout,
                                     cnt_bound=(S.shape[1] * pos_bin
                                                if layout == "codes" else -1))
    if t_lo == 0:
        # oracle fails a window with no observed (k+1)-mer edges outright,
        # even when a T=0 source-only candidate would be eligible
        # (oracle/dbg.py "len(e_u) == 0"); for t_lo >= 1 no candidate can
        # exist without edges anyway
        D1, Wp = S.shape[1], S.shape[2]
        pos2 = jnp.arange(Wp - k, dtype=jnp.int32)
        dval = jnp.arange(D1, dtype=jnp.int32)[None, :] < nstr[:, None]
        evalid = ((pos2[None, None, :] + k + 1 <= slen[:, :, None])
                  & dval[:, :, None])
        endok = endok & evalid.reshape(S.shape[0], -1).any(axis=1)[:, None]
    if bp_tag == "cyc_fused":
        cands, _ = _finish_traceback_fused(bps, k=k, t_lo=t_lo, t_hi=t_hi)
    elif bp_tag == "cyc":
        cands, _ = _traceback_cyc(bps, ends, k=k, t_lo=t_lo, t_hi=t_hi)
    else:
        cands, _ = _traceback(bps, ends, k=k, t_lo=t_lo, t_hi=t_hi)
    return _score_pick(S, slen, nstr, cands, endok, k=k, w=w,
                       t_lo=t_lo, t_hi=t_hi, e_q6=e_q6)


def consensus_step(S, slen, nstr, plq_src, plq_snk, pbw=None, *, k: int,
                   w: int, path_delta: int, e_q6: int = 1_000_000,
                   dp_impl: str = "auto", pos_bin: int = 8,
                   pbw_band: int = None,
                   tp_sharding=None) -> ConsensusOut:
    """One batched consensus pass at k-mer size k (see _consensus_step_jit).

    dp_impl: 'auto' resolves per-backend (default_dp_impl); explicit values
    'scan' | 'cyc' | 'cyc_mxu' | 'cyc_hbm' | 'cyc_interpret' |
    'cyc_hbm_interpret' | 'pallas_interpret' pick a DP implementation
    directly — all bit-identical (tests/test_pallas_dbg.py).  'cyc' builds
    the weighted-path histograms in-kernel (codes layout); 'cyc_hbm' is the
    ablation point that builds them XLA-side in HBM (phases_h layout).
    pbw: optional int32 [NB, NB] positional edge-weight kernel (ALGORITHM §4,
    offset_likely.pos_bin_weights_q6); None = unweighted v1 counts.
    pbw_band: optional static band bound of pbw (|i-j| > band => 0); computed
    here when pbw is concrete, must be passed by callers tracing this
    function (e.g. inside shard_map) to keep the banded kernel mix.
    """
    if dp_impl == "auto":
        dp_impl = default_dp_impl()
    if pbw_band is not None:
        return _consensus_step_jit(S, slen, nstr, plq_src, plq_snk, pbw,
                                   k=k, w=w, path_delta=path_delta, e_q6=e_q6,
                                   dp_impl=dp_impl, pos_bin=pos_bin,
                                   pbw_band=pbw_band, tp_sharding=tp_sharding)
    pbw_band = -1
    if pbw is not None and not isinstance(pbw, jax.core.Tracer):
        # static band of the positional kernel: pbw[..., i, j] == 0 exactly
        # outside |i-j| <= band (tridiagonal at realistic rates) lets the
        # cyc kernel's in-VMEM mix skip the zero terms.  Exact: dropping
        # exact-zero terms from an integer-exact f32 sum changes nothing.
        # Traced pbw (mesh/TP path) falls back to the full mix.
        pb = np.asarray(pbw).reshape(-1, pbw.shape[-2], pbw.shape[-1])
        ii, jj = np.nonzero(pb.any(axis=0))
        pbw_band = int(np.abs(ii - jj).max()) if len(ii) else 0
    return _consensus_step_jit(S, slen, nstr, plq_src, plq_snk, pbw, k=k, w=w,
                               path_delta=path_delta, e_q6=e_q6,
                               dp_impl=dp_impl, pos_bin=pos_bin,
                               pbw_band=pbw_band, tp_sharding=tp_sharding)
