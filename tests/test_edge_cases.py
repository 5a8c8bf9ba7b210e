"""Robustness edge cases: empty piles, short reads, no-overlap reads."""

import numpy as np
import pytest

from daccord_tpu.formats.dazzler_db import write_db
from daccord_tpu.formats.las import write_las
from daccord_tpu.oracle.consensus import run_oracle
from daccord_tpu.pipeline.runner import run_tpu
from daccord_tpu.sim import SimConfig, simulate
from daccord_tpu.utils.config import DaccordConfig


def test_empty_las(tmp_path):
    rng = np.random.default_rng(0)
    reads = [rng.integers(0, 4, size=500).astype(np.uint8) for _ in range(3)]
    db = str(tmp_path / "r.db")
    las = str(tmp_path / "r.las")
    write_db(db, reads)
    write_las(las, 100, [])
    cfg = DaccordConfig(batch_windows=16)
    for runner in (run_oracle, run_tpu):
        recs, stats = runner(db, las, cfg)
        assert recs == []                      # no evidence -> no fragments
        assert stats.windows_ok == 0
    # -f mode emits raw reads
    recs, _ = run_oracle(db, las, cfg.replace(f=True))
    assert len(recs) == 3
    recs2, _ = run_tpu(db, las, cfg.replace(f=True))
    assert recs2 == recs


def test_reads_shorter_than_window(tmp_path):
    rng = np.random.default_rng(1)
    reads = [rng.integers(0, 4, size=30).astype(np.uint8),   # < w
             rng.integers(0, 4, size=500).astype(np.uint8)]
    db = str(tmp_path / "r.db")
    las = str(tmp_path / "r.las")
    write_db(db, reads)
    write_las(las, 100, [])
    cfg = DaccordConfig(batch_windows=16, f=True)
    recs, stats = run_oracle(db, las, cfg)
    assert len(recs) == 2                      # short read emitted raw in -f
    assert len(recs[0][1]) == 30
    recs2, _ = run_tpu(db, las, cfg)
    assert recs2 == recs


def test_min_fragment_length_filter(tmp_path):
    d = tmp_path
    ds = simulate(SimConfig(seed=3, genome_len=3000, coverage=9.0,
                            read_len=(600, 900)))
    db, las = str(d / "r.db"), str(d / "r.las")
    ds.write(db, las)
    cfg = DaccordConfig(I=(0, 3), batch_windows=16, l=10_000)
    recs, _ = run_tpu(db, las, cfg)
    assert recs == []                          # every fragment filtered
    recs2, _ = run_oracle(db, las, cfg)
    assert recs2 == []


def test_interval_beyond_db(tmp_path):
    ds = simulate(SimConfig(seed=4, genome_len=3000, coverage=8.0,
                            read_len=(600, 900)))
    db, las = str(tmp_path / "r.db"), str(tmp_path / "r.las")
    ds.write(db, las)
    cfg = DaccordConfig(I=(10_000, 20_000), batch_windows=16)
    recs, stats = run_tpu(db, las, cfg)
    assert recs == [] and stats.reads == 0
