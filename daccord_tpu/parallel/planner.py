"""Work-balanced read-interval planner — the ``computeintervals`` analog.

Reference: gt1/daccord ``src/computeintervals.cpp`` (SURVEY §2.1, §3.2):
scan the .las index + DB metadata and emit read-id intervals of ~equal work
for n parts, consumed as ``-I<from>,<to>`` jobs.  Here the same logic is also
the multi-host sharding planner (SURVEY §2.4 DP row): each host/process gets
a contiguous aread range.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from daccord_tpu.formats.dazzler_db import DazzlerDB
from daccord_tpu.formats.las import LasFile


def work_per_read(db: DazzlerDB, las) -> np.ndarray:
    """Estimated work units per read id: pile record count x read length.

    The dominant cost is realignment+consensus over the pile, proportional to
    (depth x windows) ~ (records x rlen); reads without piles cost ~0.
    ``las`` may be a LasFile or MultiLas (pile_counts interface).
    """
    a, c = las.pile_counts()
    counts = np.zeros(db.nreads, dtype=np.int64)
    inrange = a < db.nreads
    counts[a[inrange]] = c[inrange]
    return counts * np.maximum(db.rlen, 1)


def plan_intervals(work: np.ndarray, n: int) -> List[Tuple[int, int]]:
    """Greedy contiguous split of read ids into n parts of ~equal work.

    Deterministic: walks read ids in order, cutting when the running sum
    reaches the ideal per-part share of the remaining work.
    """
    total = int(work.sum())
    nreads = len(work)
    out: List[Tuple[int, int]] = []
    start = 0
    remaining = total
    for part in range(n):
        if start >= nreads:
            out.append((nreads, nreads))
            continue
        parts_left = n - part
        target = remaining / parts_left if parts_left else 0
        acc = 0
        end = start
        while end < nreads and (acc < target or parts_left == 1):
            acc += int(work[end])
            end += 1
        out.append((start, end))
        remaining -= acc
        start = end
    return out
