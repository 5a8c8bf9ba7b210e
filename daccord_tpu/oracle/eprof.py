"""Error-profile estimation (the reference's ``-E``/eprof path, SURVEY §2.1).

Estimated from realignment traceback op counts over a sample of piles
(ALGORITHM §7); serialized as JSON (our own artifact format per SURVEY A.3).
"""

from __future__ import annotations

import dataclasses
import json
from typing import List, Optional

import numpy as np

from daccord_tpu.formats.dazzler_db import DazzlerDB
from daccord_tpu.formats.las import LasFile, open_piles
from daccord_tpu.utils.config import DaccordConfig


@dataclasses.dataclass(frozen=True)
class ErrorProfile:
    e_sub: float
    e_ins: float
    e_del: float
    n_bases: int = 0

    def rounded(self) -> "ErrorProfile":
        return ErrorProfile(round(self.e_sub, 6), round(self.e_ins, 6),
                            round(self.e_del, 6), self.n_bases)

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(dataclasses.asdict(self), f)

    @classmethod
    def load(cls, path: str) -> "ErrorProfile":
        with open(path) as f:
            return cls(**json.load(f))

    @classmethod
    def default(cls, cfg: DaccordConfig) -> "ErrorProfile":
        return cls(cfg.default_e_sub, cfg.default_e_ins, cfg.default_e_del, 0)


# number of read-position bins of the positional profile (ALGORITHM §7 v2)
EPROF_BINS = 10


@dataclasses.dataclass(frozen=True)
class PositionalErrorProfile:
    """Per read-position-decile rates (the reference's positional eprof
    analog: gt1/daccord ``src/daccord.cpp`` -E path estimates rates from
    per-trace-block diffs; SURVEY §2.1).  Bin b covers relative A positions
    [b/NB, (b+1)/NB) of each read; each bin feeds its own PLq/PBW tables
    (oracle/consensus.ConsensusTables)."""
    e_sub: tuple
    e_ins: tuple
    e_del: tuple
    n_bases: tuple

    def bin_profile(self, b: int) -> ErrorProfile:
        return ErrorProfile(self.e_sub[b], self.e_ins[b], self.e_del[b],
                            self.n_bases[b])

    def scalar(self) -> ErrorProfile:
        """n_bases-weighted mean rates (the v1 summary)."""
        n = np.array(self.n_bases, dtype=np.float64)
        tot = n.sum()
        if tot == 0:
            return ErrorProfile(float(np.mean(self.e_sub)),
                                float(np.mean(self.e_ins)),
                                float(np.mean(self.e_del)), 0).rounded()
        w = n / tot
        return ErrorProfile(float(np.dot(w, self.e_sub)),
                            float(np.dot(w, self.e_ins)),
                            float(np.dot(w, self.e_del)),
                            int(tot)).rounded()

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump({"version": 2,
                       "e_sub": list(self.e_sub), "e_ins": list(self.e_ins),
                       "e_del": list(self.e_del),
                       "n_bases": list(self.n_bases)}, f)

    @classmethod
    def load(cls, path: str) -> "PositionalErrorProfile":
        with open(path) as f:
            d = json.load(f)
        assert d.get("version") == 2
        return cls(tuple(d["e_sub"]), tuple(d["e_ins"]), tuple(d["e_del"]),
                   tuple(d["n_bases"]))


def load_profile(path: str):
    """-E artifact loader: v2 positional profile or the v1 scalar JSON."""
    with open(path) as f:
        d = json.load(f)
    if isinstance(d, dict) and d.get("version") == 2:
        return PositionalErrorProfile(
            tuple(d["e_sub"]), tuple(d["e_ins"]), tuple(d["e_del"]),
            tuple(d["n_bases"]))
    return ErrorProfile(**d)


def estimate_error_profile_v2(db: DazzlerDB, las: LasFile,
                              cfg: DaccordConfig) -> PositionalErrorProfile:
    """Positional estimation: realign the sample piles' trace blocks, bin
    each block's pinned-traceback op counts by the block midpoint's read
    decile (blocks are <= tspace bases, far shorter than reads, so the
    per-block decile is the pinned positional resolution; ALGORITHM §7 v2).
    Empty bins fall back to the global (all-bin) rates."""
    from daccord_tpu.align.editdp import batch_ops_count_rows
    from daccord_tpu.pipeline.windows import ReadCache, pile_block_batch

    cache = ReadCache(db)
    areads = las.areads()[: cfg.eprof_sample]
    tot = np.zeros((EPROF_BINS, 4), dtype=np.int64)
    for aread in areads:
        A = db.read_codes(int(aread))
        pile = las.pile(int(aread))
        if not pile or len(A) == 0:
            continue
        Abuf, la, Bbuf, lb, owners = pile_block_batch(A, pile, cache,
                                                      las.tspace)
        if len(la) == 0:
            continue
        ops = batch_ops_count_rows(Abuf, la, Bbuf, lb)
        astart = np.array([ow[1] for ow in owners], dtype=np.int64)
        dec = np.minimum(EPROF_BINS - 1,
                         EPROF_BINS * (astart + la // 2) // len(A))
        np.add.at(tot, dec, ops)
    glob = tot.sum(axis=0)
    n_glob = int(glob[0] + glob[1] + glob[2])
    if n_glob == 0:
        d = ErrorProfile.default(cfg)
        return PositionalErrorProfile((d.e_sub,) * EPROF_BINS,
                                      (d.e_ins,) * EPROF_BINS,
                                      (d.e_del,) * EPROF_BINS,
                                      (0,) * EPROF_BINS)
    gs = round(float(glob[1]) / n_glob / 2.0, 6)
    gi = round(float(glob[2]) / n_glob / 2.0, 6)
    gd = round(float(glob[3]) / n_glob / 2.0, 6)
    es, ei, ed, nb = [], [], [], []
    for b in range(EPROF_BINS):
        n_a = int(tot[b, 0] + tot[b, 1] + tot[b, 2])
        if n_a == 0:
            es.append(gs); ei.append(gi); ed.append(gd); nb.append(0)
        else:
            es.append(round(float(tot[b, 1]) / n_a / 2.0, 6))
            ei.append(round(float(tot[b, 2]) / n_a / 2.0, 6))
            ed.append(round(float(tot[b, 3]) / n_a / 2.0, 6))
            nb.append(n_a)
    return PositionalErrorProfile(tuple(es), tuple(ei), tuple(ed), tuple(nb))


def estimate_error_profile(db: DazzlerDB, las: LasFile,
                           cfg: DaccordConfig) -> ErrorProfile:
    """Sample the first ``eprof_sample`` areads; realign; count traceback ops.

    Op semantics (ALGORITHM §1/§7): per A-base rates; 'U' steps consume an
    A base only (A insertion relative to B), 'L' steps consume a B base only.
    """
    from daccord_tpu.align.editdp import batch_ops_count
    from daccord_tpu.pipeline.windows import ReadCache, pile_block_batch

    cache = ReadCache(db)
    areads = las.areads()[: cfg.eprof_sample]
    tot = np.zeros(4, dtype=np.int64)
    for aread in areads:
        A = db.read_codes(int(aread))
        pile = las.pile(int(aread))
        if not pile:
            continue
        Abuf, la, Bbuf, lb, _ = pile_block_batch(A, pile, cache, las.tspace)
        tot += batch_ops_count(Abuf, la, Bbuf, lb)
    n_a = int(tot[0] + tot[1] + tot[2])  # A bases consumed
    if n_a == 0:
        return ErrorProfile.default(cfg)
    # pair-rate halved: each op reflects errors of two ~independent reads
    return ErrorProfile(
        e_sub=float(tot[1]) / n_a / 2.0,
        e_ins=float(tot[2]) / n_a / 2.0,
        e_del=float(tot[3]) / n_a / 2.0,
        n_bases=n_a,
    ).rounded()
