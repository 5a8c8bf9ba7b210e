"""Structured observability: JSON-line logging, phase timers, throughput.

The build-side replacement for the reference's ``-V`` stderr prints and
``libmaus2::timing::RealTimeClock`` wall-clock reports (SURVEY §5 tracing/
metrics rows): one JSON line per event on stderr (or a file), phase timers
accumulated into a final summary with reads/s and windows/s — the BASELINE
metrics — plus an optional jax.profiler trace capture.
"""

from __future__ import annotations

import contextlib
import json
import sys
import time
from typing import Dict, Optional


class RunLog:
    def __init__(self, enabled: bool = True, stream=None, run_id: str = ""):
        self.enabled = enabled
        self.stream = stream or sys.stderr
        self.run_id = run_id
        self.t0 = time.time()
        self.phases: Dict[str, float] = {}
        self.counters: Dict[str, int] = {}

    def event(self, kind: str, **fields) -> None:
        if not self.enabled:
            return
        rec = {"ts": round(time.time() - self.t0, 3), "kind": kind}
        if self.run_id:
            rec["run"] = self.run_id
        rec.update(fields)
        print(json.dumps(rec), file=self.stream, flush=True)

    @contextlib.contextmanager
    def phase(self, name: str):
        t = time.time()
        try:
            yield
        finally:
            dt = time.time() - t
            self.phases[name] = self.phases.get(name, 0.0) + dt
            self.event("phase", name=name, seconds=round(dt, 3))

    def count(self, name: str, n: int = 1) -> None:
        self.counters[name] = self.counters.get(name, 0) + n

    def summary(self, **extra) -> dict:
        total = time.time() - self.t0
        out = {"total_s": round(total, 3),
               "phases": {k: round(v, 3) for k, v in self.phases.items()},
               **self.counters, **extra}
        reads = self.counters.get("reads", 0)
        wins = self.counters.get("windows", 0)
        if total > 0:
            out["reads_per_s"] = round(reads / total, 3)
            out["windows_per_s"] = round(wins / total, 1)
        self.event("summary", **out)
        return out


@contextlib.contextmanager
def maybe_profile(trace_dir: Optional[str]):
    """jax.profiler trace capture (Perfetto/XProf) when a dir is given."""
    if not trace_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
