"""Host packing: window piles -> padded device batches -> winners.

The bridge between the host window extraction (pipeline/windows.py) and the
dense device step (ops/consensus_step.py).  Batches use the fixed shape menu
of SURVEY §7.3 item 2: [B, D+1, W'] uint8 with PAD=4 and length arrays.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from daccord_tpu.ops.consensus_step import PAD, consensus_step
from daccord_tpu.utils.config import DaccordConfig


def pack_windows(piles: Sequence[Sequence[np.ndarray]], cfg: DaccordConfig,
                 batch: Optional[int] = None
                 ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pack per-window string lists into (S [B,D1,W'], slen [B,D1], nstr [B]).

    B is padded up to ``batch`` (or len(piles)); windows beyond len(piles) get
    nstr=0 (the device marks them failed).
    """
    D1 = cfg.d + 1
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


def consensus_batch(piles: Sequence[Sequence[np.ndarray]], cfg: DaccordConfig,
                    plq: np.ndarray, k: int, batch: Optional[int] = None
                    ) -> List[Optional[np.ndarray]]:
    """Device consensus for a list of window piles; None for failed windows.

    Bit-identical to oracle.window_consensus on each pile (tests enforce).
    """
    if not piles:
        return []
    S, slen, nstr = pack_windows(piles, cfg, batch)
    plq_src = np.ascontiguousarray(plq[:cfg.wprime, 0], dtype=np.int32)
    plq_snk = np.ascontiguousarray(plq[:cfg.wprime, cfg.w - k], dtype=np.int32)
    out = consensus_step(S, slen, nstr, plq_src, plq_snk,
                         k=k, w=cfg.w, path_delta=cfg.path_delta)
    ok = np.asarray(out.ok)
    length = np.asarray(out.length)
    bases = np.asarray(out.bases)
    res: List[Optional[np.ndarray]] = []
    for b in range(len(piles)):
        if ok[b]:
            res.append(bases[b, :length[b]].astype(np.uint8))
        else:
            res.append(None)
    return res
