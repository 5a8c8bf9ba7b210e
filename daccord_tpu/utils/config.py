"""Configuration for the consensus engine.

Flag-name parity with the reference CLI (SURVEY.md Appendix B: gt1/daccord
``src/daccord.cpp`` argument conventions): ``-w -a -k -t -d -m -e -l -I -J -E
-f -V``.  Defaults marked [UNCERTAIN] in the survey are pinned here and in
ALGORITHM.md.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class DaccordConfig:
    """Frozen config; the ``libmaus2::util::ArgParser`` analog (SURVEY §5)."""

    # --- reference flags (SURVEY Appendix B) ---
    w: int = 40                # -w window size
    a: int = 10                # -a window advance
    k: int = 8                 # -k k-mer size (first pass)
    t: int = 0                 # -t host pipeline workers (0 = auto: up to
                               #    16 cores when mean pile depth >= 20
                               #    overlaps/read, else inline; flip point
                               #    measured by scripts/probe_pool_flip.py)
    d: int = 64                # -d/--maxalign max pile depth per window [PINNED]
    m: int = 3                 # -m min window coverage (B strings) [PINNED]
    e: float = 1.0             # -e max window error (1.0 = off) [PINNED]
    l: int = 0                 # -l min output fragment length [PINNED]
    I: Optional[Tuple[int, int]] = None  # -I from,to read-id interval
    J: Tuple[int, int] = (0, 1)          # -J i,n  process part i of n
    E: Optional[str] = None    # -E error profile artifact path
    f: bool = False            # -f full-sequence output mode
    V: int = 0                 # -V verbosity

    # --- pinned extensions (ALGORITHM.md) ---
    k2: int = 12               # adaptive-k retry size (SURVEY §2.1)
    k2_impl: str = "auto"      # adaptive-k retry pass: 'host' (sparse
                               # oracle), 'device' (ops/sparse_k2.py,
                               # bit-equal), 'auto' = device when the batch
                               # is large enough to amortize dispatch
    path_delta: int = 4        # path-length slack around w-k (ALGORITHM §4)
    eprof_sample: int = 32     # reads sampled for error-profile estimation
    pos_weight: bool = True    # positional (k+1)-mer edge weighting (§4,
                               # the OffsetLikely count-weighting analog)
    pos_bin: int = 8           # position/step bin width g for pos_weight

    # --- device batching knobs (shape menu; SURVEY §7.3 item 2) ---
    batch_windows: int = 256   # windows per device batch
    realign_device: bool = False  # trace-block realignment on the device
                                  # (ops/realign_dp.py) instead of host C++
    # --- streaming back half (bounded memory at config-5 scale) ---
    max_flight_batches: int = 128  # fetch device outputs when more than this
                                   # many batches are un-fetched (bounds both
                                   # winner memory and ReadRows lifetime);
                                   # small runs (< limit) fetch exactly once
    bucket_flush_reads: int = 512  # dispatch a partial depth bucket once its
                                   # oldest window is this many reads old
                                   # (bounds ReadRows held by rare-depth
                                   # buckets; per-window results are batch-
                                   # invariant so output bytes are unchanged)
    # default error profile when no -E artifact given (ALGORITHM §7)
    default_e_sub: float = 0.03
    default_e_ins: float = 0.08
    default_e_del: float = 0.04

    @property
    def wprime(self) -> int:
        """Padded window-substring length W' (ALGORITHM §2 item 4)."""
        return self.w + 2 * self.path_delta

    @property
    def n_candidates(self) -> int:
        """Candidate path lengths per window: T in [w-k-delta, w-k+delta]."""
        return 2 * self.path_delta + 1

    def windows_for_length(self, rlen: int) -> int:
        """Number of windows for a read of length rlen (ALGORITHM §2)."""
        if rlen < self.w:
            return 0
        return (rlen - self.w) // self.a + 1

    def replace(self, **kw) -> "DaccordConfig":
        return dataclasses.replace(self, **kw)
