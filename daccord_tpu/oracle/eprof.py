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
