"""OffsetLikely — positional likelihood tables (ALGORITHM §3).

The reference's ``OffsetLikely``/``computeOffsetLikely`` (gt1/daccord
``src/daccord.cpp``, SURVEY §2.1) weights k-mer observations by the
probability that observed string position p corresponds to true window offset
o, derived from indel rates.  The exact upstream tables are unknowable (empty
mount); the pinned model here is a drifted-walk Gaussian, computed once in
float64 and quantized to Q16 fixed point so all consumers (NumPy oracle and
device kernels) use identical integers.
"""

from __future__ import annotations

import numpy as np


def offset_likely_q16(wprime: int, omax: int, e_ins: float, e_del: float) -> np.ndarray:
    """int32 [wprime, omax+1] Q16 table PLq[p][o] (ALGORITHM §3).

    Rates are rounded to 6 decimals first (reproducibility rule, ALGORITHM §7).
    """
    e_ins = round(float(e_ins), 6)
    e_del = round(float(e_del), 6)
    o = np.arange(omax + 1, dtype=np.float64)[None, :]
    p = np.arange(wprime, dtype=np.float64)[:, None]
    mean = o * (1.0 + e_ins - e_del)
    sd = np.sqrt(o * (e_ins + e_del)) + 0.5
    pl = np.exp(-((p - mean) ** 2) / (2.0 * sd * sd))
    norm = pl.sum(axis=0, keepdims=True)
    pl = pl / np.where(norm == 0, 1.0, norm)
    return np.round(pl * 65536.0).astype(np.int32)
