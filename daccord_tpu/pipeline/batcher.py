"""Host packing: window piles -> padded device batches -> winners.

The bridge between host window extraction (pipeline/windows.py) and the dense
device step (ops/consensus_step.py).  Batches use the fixed shape menu of
SURVEY §7.3 item 2: depth buckets D1 in DEPTH_MENU and width W', so a handful
of compiled specializations cover all pile depths without recompilation
storms, and shallow piles don't pay the deep-pile padding cost.

Dispatch and collection are split so the runner can queue many batches on the
device asynchronously (JAX async dispatch) and overlap host work.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from daccord_tpu.ops.consensus_step import PAD, ConsensusOut, consensus_step
from daccord_tpu.utils.config import DaccordConfig

# D1 menu (strings per window incl. the A row); actual cap is cfg.d + 1.
# Round 5 added 25 and 49: at the paper's 40-60x coverage most windows hold
# 34-64 strings, and with the round-4 menu every one of them paid the
# D1=65 padding premium (the deep kernel shape costs ~40% more than D1=49
# and the histogram/scoring stages scale with D1).  Finer buckets cost only
# more compiled variants (warmed by pipeline/warmup.py), not correctness:
# per-window results are depth-padding-invariant (tests/test_e2e.py).
DEPTH_MENU = (9, 17, 25, 33, 49, 65)


def bucket_d1(nstr: int, cap_d1: int) -> int:
    """Smallest menu depth >= nstr (bounded by the config cap)."""
    for d1 in DEPTH_MENU:
        if d1 >= min(nstr, cap_d1):
            return min(d1, cap_d1)
    return cap_d1


def pack_windows(piles: Sequence[Sequence[np.ndarray]], cfg: DaccordConfig,
                 batch: Optional[int] = None, d1: Optional[int] = None
                 ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pack per-window string lists into (S [B,D1,W'], slen [B,D1], nstr [B])."""
    D1 = d1 or (cfg.d + 1)
    Wp = cfg.wprime
    B = batch or len(piles)
    assert len(piles) <= B
    S = np.full((B, D1, Wp), PAD, dtype=np.uint8)
    slen = np.zeros((B, D1), dtype=np.int32)
    nstr = np.zeros((B,), dtype=np.int32)
    for b, strings in enumerate(piles):
        assert len(strings) <= D1, "caller must cap depth (extract_windows)"
        for d, s in enumerate(strings):
            assert len(s) <= Wp, "caller must drop over-long strings"
            S[b, d, :len(s)] = s
            slen[b, d] = len(s)
        nstr[b] = len(strings)
    return S, slen, nstr


def dispatch_batch(piles: Sequence[Sequence[np.ndarray]], cfg: DaccordConfig,
                   plq: np.ndarray, k: int, batch: int,
                   d1: Optional[int] = None,
                   pbw: Optional[np.ndarray] = None) -> ConsensusOut:
    """Queue one device batch; returns un-fetched device arrays."""
    S, slen, nstr = pack_windows(piles, cfg, batch, d1)
    plq_src = np.ascontiguousarray(plq[:cfg.wprime, 0], dtype=np.int32)
    plq_snk = np.ascontiguousarray(plq[:cfg.wprime, cfg.w - k], dtype=np.int32)
    return consensus_step(S, slen, nstr, plq_src, plq_snk, pbw,
                          k=k, w=cfg.w, path_delta=cfg.path_delta,
                          e_q6=e_q6_of(cfg), pos_bin=cfg.pos_bin)


def e_q6_of(cfg: DaccordConfig) -> int:
    """Static quantized -e threshold (ALGORITHM §4)."""
    return round(cfg.e * 1_000_000) if cfg.e < 1.0 else 1_000_000


def collect_batch(out: ConsensusOut, n: int) -> List[Optional[np.ndarray]]:
    """Fetch a dispatched batch's first n winners (None = failed window)."""
    ok = np.asarray(out.ok)
    length = np.asarray(out.length)
    bases = np.asarray(out.bases)
    res: List[Optional[np.ndarray]] = []
    for b in range(n):
        if ok[b]:
            res.append(bases[b, :length[b]].astype(np.uint8))
        else:
            res.append(None)
    return res


def consensus_batch(piles: Sequence[Sequence[np.ndarray]], cfg: DaccordConfig,
                    plq: np.ndarray, k: int, batch: Optional[int] = None,
                    d1: Optional[int] = None,
                    pbw: Optional[np.ndarray] = None
                    ) -> List[Optional[np.ndarray]]:
    """Synchronous convenience wrapper (tests, small runs).

    Bit-identical to oracle.window_consensus on each pile (tests enforce).
    """
    if not piles:
        return []
    out = dispatch_batch(piles, cfg, plq, k, batch or len(piles), d1, pbw)
    return collect_batch(out, len(piles))
