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


def _pl_float(wprime: int, omax: int, e_ins: float, e_del: float) -> np.ndarray:
    """float64 [wprime, omax+1] column-normalized PL[p][o] (shared model)."""
    e_ins = round(float(e_ins), 6)
    e_del = round(float(e_del), 6)
    o = np.arange(omax + 1, dtype=np.float64)[None, :]
    p = np.arange(wprime, dtype=np.float64)[:, None]
    mean = o * (1.0 + e_ins - e_del)
    sd = np.sqrt(o * (e_ins + e_del)) + 0.5
    pl = np.exp(-((p - mean) ** 2) / (2.0 * sd * sd))
    norm = pl.sum(axis=0, keepdims=True)
    return pl / np.where(norm == 0, 1.0, norm)


def offset_likely_q16(wprime: int, omax: int, e_ins: float, e_del: float) -> np.ndarray:
    """int32 [wprime, omax+1] Q16 table PLq[p][o] (ALGORITHM §3).

    Rates are rounded to 6 decimals first (reproducibility rule, ALGORITHM §7).
    """
    return np.round(_pl_float(wprime, omax, e_ins, e_del) * 65536.0
                    ).astype(np.int32)


# pinned saturation bound for positionally-weighted edge counts: fits the
# cyc kernel's uint16 packed keys (count*4 + 3 <= 65535; ALGORITHM §4)
PBW_CLAMP = 16383


def pos_bin_weights_q6(wprime: int, g: int, e_ins: float, e_del: float
                       ) -> np.ndarray:
    """int32 [NB, NB] Q6 positional edge-weight kernel PBW[i][j] (ALGORITHM §4).

    The positional k-mer weighting of the reference's ``OffsetLikely``
    consumers (gt1/daccord ``src/daccord.cpp``; SURVEY §3.4
    ``c[kmer(s,j)] += weight(P, j)``), binned for the dense device path:
    positions p and DP steps t are grouped into width-``g`` bins
    (NB = ceil(wprime/g)); a (k+1)-mer observation at position p contributes
    weight PBW[p//g][(t-1)//g] to the edge table used at DP step t.

    Pinned derivation from the same drifted-walk model as PLq:
      mass[i][o] = sum_{p in bin i} PL[p][o]   (prob. an offset-o observation
                                                lands in position-bin i)
      K[i][j]    = mean_{o in bin j, o < wprime} mass[i][o]
      PBW[i][j]  = round(64 * K[i][j])          (Q6, int32)

    The table is k-independent (offsets/positions up to wprime cover both the
    k and k2 passes).
    """
    nb = -(-wprime // g)
    pl = _pl_float(wprime, wprime - 1, e_ins, e_del)    # [wprime, wprime]
    padp = nb * g - wprime
    plp = np.pad(pl, ((0, padp), (0, padp)))
    mass = plp.reshape(nb, g, nb * g).sum(axis=1)       # [nb, p*]
    # mean over offsets o in bin j that exist (< wprime)
    cnt = np.minimum(np.arange(1, nb + 1) * g, wprime) - np.arange(nb) * g
    ksum = plp.reshape(nb, g, nb, g).sum(axis=(1, 3))   # == mass binned over o
    k_ij = ksum / cnt[None, :].astype(np.float64)
    return np.round(k_ij * 64.0).astype(np.int32)
