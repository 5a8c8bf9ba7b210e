"""Seeded read/pile simulator — the in-repo stand-in for DAZZ_DB + daligner.

The reference consumes piles produced by the external daligner/DAZZ_DB C tools
(SURVEY §2.3), which are not available in this environment; per SURVEY §4
items 1 and 5 this module generates synthetic-but-format-exact fixtures:

- a seeded random genome,
- PacBio-like errorful reads from random positions/strands,
- all-vs-all overlaps with exact trace points, derived by *composing* the known
  read<->genome alignments through the genome (no aligner needed; trace
  b-advances satisfy the LAcheck invariant by construction),
- written through the real format writers (.db/.idx/.bps + .las).

COMP semantics follow SURVEY A.2: when strands differ the B read is stored
reverse-complemented in the record's coordinate frame and flag bit 0 is set.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np

from daccord_tpu.formats.dazzler_db import write_db
from daccord_tpu.formats.las import FLAG_COMP, Overlap, write_las


@dataclasses.dataclass(frozen=True)
class SimConfig:
    seed: int = 0
    genome_len: int = 20_000
    coverage: float = 10.0
    read_len: Tuple[int, int] = (1_500, 2_500)  # uniform range
    e_sub: float = 0.03
    e_ins: float = 0.08
    e_del: float = 0.04
    min_overlap: int = 500
    tspace: int = 100
    circular: bool = False  # linear genome only (pinned)
    repeat_density: float = 0.0  # tandem repeats planted per genome base
    #                              (repeat-heavy configs; stresses k2 retry)
    segdup: Optional[Tuple[int, int, int]] = None
    # (src, length, dst): copy genome[src:src+length] over
    # genome[dst:dst+length] BEFORE read generation, and emit the
    # repeat-induced CROSS-COPY alignments a real aligner would find between
    # reads of different copies (the spurious alignments
    # lasdetectsimplerepeats + lasfilteralignments --repeats exist to mask;
    # gt1/daccord src/lasdetectsimplerepeats.cpp consumer role, SURVEY §2.1)
    segdup_divergence: float = 0.0
    # post-copy substitution rate applied to the dst copy: diverged repeat
    # copies make cross-copy alignments actively MISLEADING (they vote the
    # other copy's variants into the consensus) — the failure mode repeat
    # masking exists to prevent


@dataclasses.dataclass
class SimRead:
    gstart: int           # genome interval [gstart, gend)
    gend: int
    strand: int           # 0 = forward, 1 = reverse
    codes: np.ndarray     # stored read (strand applied), uint8 0..3
    g2r: np.ndarray       # int64 [glen+1]: E-frame read bases consumed before
                          # genome position gstart+i  (E = pre-strand errorful copy)
    edits: np.ndarray     # int32 [glen]: #edits attributed to genome position i

    @property
    def rlen(self) -> int:
        return len(self.codes)


@dataclasses.dataclass
class SimDataset:
    cfg: SimConfig
    genome: np.ndarray
    reads: List[SimRead]
    overlaps: List[Overlap]

    def write(self, db_path: str, las_path: str) -> None:
        write_db(db_path, [r.codes for r in self.reads])
        write_las(las_path, self.cfg.tspace, self.overlaps)


def _make_read(rng: np.random.Generator, genome: np.ndarray, cfg: SimConfig) -> SimRead:
    G = len(genome)
    lmin, lmax = cfg.read_len
    glen = int(rng.integers(lmin, lmax + 1))
    glen = min(glen, G)
    gstart = int(rng.integers(0, G - glen + 1))
    seg = genome[gstart:gstart + glen]

    dele = rng.random(glen) < cfg.e_del
    sub = (rng.random(glen) < cfg.e_sub) & ~dele
    ins = rng.random(glen) < cfg.e_ins
    subdelta = rng.integers(1, 4, size=glen).astype(np.uint8)
    insbase = rng.integers(0, 4, size=glen).astype(np.uint8)

    emitted = np.where(sub, (seg + subdelta) % 4, seg).astype(np.uint8)
    keep = ~dele
    counts = keep.astype(np.int64) + ins.astype(np.int64)
    start = np.concatenate([[0], np.cumsum(counts)])  # len glen+1; start[i] = E bases before pos i
    total = int(start[-1])
    E = np.zeros(total, dtype=np.uint8)
    E[start[:-1][keep]] = emitted[keep]
    ins_at = start[:-1] + keep.astype(np.int64)
    E[ins_at[ins]] = insbase[ins]

    strand = int(rng.integers(0, 2))
    codes = E if strand == 0 else (3 - E[::-1]).astype(np.uint8)
    edits = (dele.astype(np.int32) + sub.astype(np.int32) + ins.astype(np.int32))
    return SimRead(gstart=gstart, gend=gstart + glen, strand=strand,
                   codes=codes, g2r=start, edits=edits)


def _pair_coords(A: SimRead, B: SimRead, lo: int, hi: int, boff: int = 0):
    """(a_t, b_t, abpos, bbpos) over boundaries t=0..L in A's direction.

    boff: B's genome interval is [lo+boff, hi+boff) — nonzero only for
    segdup cross-copy records, where the two copies are base-identical so
    the coordinate shift composes a true sequence-level alignment."""
    L = hi - lo

    def rE(read: SimRead, g):
        return read.g2r[np.asarray(g) - read.gstart]

    if A.strand == 0:
        gb = lo + np.arange(L + 1)
        a_t = rE(A, gb) - int(rE(A, lo))
        abpos = int(rE(A, lo))
    else:
        gb = hi - np.arange(L + 1)
        a_t = int(rE(A, hi)) - rE(A, gb)
        abpos = A.rlen - int(rE(A, hi))
    gbB = gb + boff
    loB, hiB = lo + boff, hi + boff
    # B' is oriented like A; walking gb in A's direction:
    same_dir = (B.strand == A.strand)
    if same_dir:
        if A.strand == 0:   # both forward
            b_t = rE(B, gbB) - int(rE(B, loB))
            bbpos = int(rE(B, loB))
        else:               # both reverse: B' = E_B read backwards? No:
            # B stored = RC(E_B); comp=0 so B' = stored B = RC(E_B).
            # Walking genome downward, B' consumed = rE_B(hi) - rE_B(g).
            b_t = int(rE(B, hiB)) - rE(B, gbB)
            bbpos = B.rlen - int(rE(B, hiB))
    else:
        if A.strand == 0:   # A fwd, B rev: comp=1, B' = RC(stored B) = E_B
            b_t = rE(B, gbB) - int(rE(B, loB))
            bbpos = int(rE(B, loB))
        else:               # A rev, B fwd: comp=1, B' = RC(stored B) = RC(E_B)
            b_t = int(rE(B, hiB)) - rE(B, gbB)
            bbpos = B.rlen - int(rE(B, hiB))
    return a_t.astype(np.int64), b_t.astype(np.int64), abpos, bbpos


def truth_segment(ds: SimDataset, aread: int, astart: int, aend: int
                  ) -> np.ndarray:
    """Ground-truth genome bases underlying stored-read interval
    ``[astart, aend)`` of read ``aread``, in the read's orientation.

    This is the accuracy oracle for corrected output: a perfect corrector
    would emit exactly this segment for a fragment spanning
    ``A[astart:aend]``.  The mapping inverts the read's E-frame g2r table
    (g2r[i] = errorful-read bases consumed before genome offset i) and, for
    reverse-strand reads, flips both the read coordinates and the genome
    into the stored (reverse-complemented) frame.
    """
    read = ds.reads[aread]
    g = ds.genome if read.strand == 0 else (3 - ds.genome[::-1]).astype(np.uint8)
    if read.strand == 0:
        r0, r1 = astart, aend
    else:
        r0, r1 = read.rlen - aend, read.rlen - astart
    i0, i1 = np.searchsorted(read.g2r, [r0, r1], side="left")
    lo, hi = read.gstart + int(i0), read.gstart + int(i1)
    if read.strand == 0:
        return g[lo:hi]
    G = len(g)
    return g[G - hi:G - lo]


def simulate(cfg: SimConfig) -> SimDataset:
    rng = np.random.Generator(np.random.PCG64(cfg.seed))
    genome = rng.integers(0, 4, size=cfg.genome_len).astype(np.uint8)
    if cfg.repeat_density > 0:
        # plant tandem repeats (motif duplicated in place): the window shape
        # that defeats k=8 DBG path search and triggers the k2 retry
        for _ in range(int(cfg.genome_len * cfg.repeat_density)):
            mlen = int(rng.integers(8, 15))
            p = int(rng.integers(0, cfg.genome_len - 2 * mlen))
            genome[p + mlen:p + 2 * mlen] = genome[p:p + mlen]
    if cfg.segdup is not None:
        src, L, dst = cfg.segdup
        assert 0 <= src and src + L <= cfg.genome_len
        assert 0 <= dst and dst + L <= cfg.genome_len
        assert dst >= src + L or src >= dst + L, "segdup copies must be disjoint"
        genome[dst:dst + L] = genome[src:src + L]
        if cfg.segdup_divergence > 0:
            div = rng.random(L) < cfg.segdup_divergence
            delta = rng.integers(1, 4, size=L).astype(np.uint8)
            genome[dst:dst + L] = np.where(
                div, (genome[dst:dst + L] + delta) % 4, genome[dst:dst + L])
    lmean = (cfg.read_len[0] + cfg.read_len[1]) / 2
    nreads = max(2, int(round(cfg.genome_len * cfg.coverage / lmean)))
    reads = [_make_read(rng, genome, cfg) for _ in range(nreads)]

    # candidate pairs via interval sweep (avoids the O(N^2) python scan)
    gstarts = np.array([r.gstart for r in reads], dtype=np.int64)
    gends = np.array([r.gend for r in reads], dtype=np.int64)
    order = np.argsort(gstarts, kind="stable")
    overlaps: List[Overlap] = []
    for ai, A in enumerate(reads):
        # reads with gstart < A.gend - min_overlap and gend > A.gstart + min_overlap
        hi_cut = np.searchsorted(gstarts[order], A.gend - cfg.min_overlap,
                                 side="left")
        cand = order[:hi_cut]
        cand = cand[gends[cand] >= A.gstart + cfg.min_overlap]
        for bi in sorted(int(x) for x in cand):
            B = reads[bi]
            if ai == bi:
                continue
            lo = max(A.gstart, B.gstart)
            hi = min(A.gend, B.gend)
            if hi - lo < cfg.min_overlap:
                continue
            ov = _make_overlap(cfg, reads, ai, bi, lo, hi)
            if ov is not None:
                overlaps.append(ov)

    if cfg.segdup is not None:
        # repeat-induced CROSS-COPY alignments: reads of copy 1 align to
        # reads of copy 2 over the duplicated segment (base-identical by
        # construction), exactly as an aligner would report; only pairs
        # with no true genomic overlap are added
        src, L, dst = cfg.segdup
        for ai, A in enumerate(reads):
            for bi, B in enumerate(reads):
                if ai == bi:
                    continue
                if (min(A.gend, B.gend) - max(A.gstart, B.gstart)
                        >= cfg.min_overlap):
                    continue        # true overlap already recorded
                for off, s0, s1 in ((dst - src, src, src + L),
                                    (src - dst, dst, dst + L)):
                    lo = max(A.gstart, s0, B.gstart - off)
                    hi = min(A.gend, s1, B.gend - off)
                    if hi - lo < cfg.min_overlap:
                        continue
                    ov = _make_overlap(cfg, reads, ai, bi, lo, hi, boff=off)
                    if ov is not None:
                        overlaps.append(ov)
    overlaps.sort(key=lambda o: (o.aread, o.bread, o.flags, o.abpos))
    return SimDataset(cfg=cfg, genome=genome, reads=reads, overlaps=overlaps)


def _make_overlap(cfg: SimConfig, reads: List[SimRead], ai: int, bi: int,
                  lo: int, hi: int, boff: int = 0) -> Optional[Overlap]:
    """Compose one .las record for reads ai/bi over genome interval
    [lo, hi) of A (B's interval shifted by boff — segdup cross-copy)."""
    A, B = reads[ai], reads[bi]
    a_t, b_t, abpos, bbpos = _pair_coords(A, B, lo, hi, boff)
    aepos = abpos + int(a_t[-1])
    bepos = bbpos + int(b_t[-1])
    if aepos <= abpos or bepos <= bbpos:
        return None
    eA = np.concatenate([[0], np.cumsum(A.edits[lo - A.gstart:hi - A.gstart])])
    eB = np.concatenate([[0], np.cumsum(
        B.edits[lo + boff - B.gstart:hi + boff - B.gstart])])
    if A.strand == 0:
        ed_t = eA + eB
    else:
        ed_t = (eA[-1] - eA[::-1]) + (eB[-1] - eB[::-1])
    ts = cfg.tspace
    first = (abpos // ts + 1) * ts
    vbound = np.concatenate([[abpos], np.arange(first, aepos, ts), [aepos]])
    # A position v lies in the genome cell t(v) = last t with a_t <= v;
    # composed B position at v is b_t[t(v)].  Deriving bbpos/bepos from
    # the SAME map keeps the LAcheck invariant sum(b_j)==bepos-bbpos
    # exact under plateaus/jumps of a_t (deletions/insertions).
    tb = np.searchsorted(a_t, vbound - abpos, side="right") - 1
    bbpos_f = bbpos + int(b_t[tb[0]])
    bepos_f = bbpos + int(b_t[tb[-1]])
    if bepos_f <= bbpos_f:
        return None
    badv = np.diff(b_t[tb]).astype(np.int64)
    dblk = np.minimum(np.diff(ed_t[tb]).astype(np.int64), 255)
    trace = np.stack([dblk, badv], axis=1).astype(np.int32)
    return Overlap(
        aread=ai, bread=bi,
        flags=FLAG_COMP if A.strand != B.strand else 0,
        abpos=abpos, aepos=aepos, bbpos=bbpos_f, bepos=bepos_f,
        diffs=int(dblk.sum()), trace=trace)
