"""Positional error profile (eprof v2, ALGORITHM §7 v2).

The reference estimates a positional error profile from per-trace-block
diffs (gt1/daccord ``src/daccord.cpp`` -E path; SURVEY §2.1).  Here: rates
per read-position decile, each feeding its own PLq/PBW tables via
ConsensusTables; windows select by midpoint decile.
"""

import numpy as np
import pytest

from daccord_tpu.oracle.consensus import ConsensusTables
from daccord_tpu.oracle.eprof import (
    EPROF_BINS, ErrorProfile, PositionalErrorProfile,
    estimate_error_profile, estimate_error_profile_v2, load_profile,
)
from daccord_tpu.utils.config import DaccordConfig


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    from daccord_tpu.sim.simulator import SimConfig, simulate
    d = tmp_path_factory.mktemp("eprofv2")
    ds = simulate(SimConfig(seed=5, genome_len=6000, coverage=8.0,
                            read_len=(1200, 1800)))
    db, las = str(d / "x.db"), str(d / "x.las")
    ds.write(db, las)
    return db, las


def test_v2_estimation_and_roundtrip(dataset, tmp_path):
    from daccord_tpu.formats.dazzler_db import DazzlerDB
    from daccord_tpu.formats.las import open_piles
    db, las = DazzlerDB.open(dataset[0]), open_piles(dataset[1])
    cfg = DaccordConfig()
    prof = estimate_error_profile_v2(db, las, cfg)
    assert len(prof.e_sub) == EPROF_BINS
    assert sum(prof.n_bases) > 0
    # uniform-error simulation: per-bin rates near the global scalar
    v1 = estimate_error_profile(db, las, cfg)
    s = prof.scalar()
    assert abs(s.e_ins - v1.e_ins) < 0.02
    assert abs(s.e_del - v1.e_del) < 0.02
    # artifact roundtrip + deterministic estimation
    p = str(tmp_path / "p.json")
    prof.save(p)
    prof2 = load_profile(p)
    assert isinstance(prof2, PositionalErrorProfile)
    assert prof2 == prof
    assert estimate_error_profile_v2(db, las, cfg) == prof


def test_v1_artifact_still_loads(tmp_path):
    p = str(tmp_path / "v1.json")
    ErrorProfile(0.03, 0.08, 0.04, 100).save(p)
    prof = load_profile(p)
    assert isinstance(prof, ErrorProfile) and prof.e_ins == 0.08


def test_consensus_tables_dedup_and_selection():
    cfg = DaccordConfig()
    # scalar profile -> one table set
    t1 = ConsensusTables(ErrorProfile(0.03, 0.08, 0.04), cfg)
    assert len(t1.plq) == 1 and t1.table_of(0, 2000) == 0
    # uniform positional profile -> deduped to one table set
    u = PositionalErrorProfile((0.03,) * EPROF_BINS, (0.08,) * EPROF_BINS,
                               (0.04,) * EPROF_BINS, (1,) * EPROF_BINS)
    t2 = ConsensusTables(u, cfg)
    assert len(t2.plq) == 1
    # gradient profile -> distinct tables; early/late windows differ
    ei = tuple(0.04 + 0.01 * b for b in range(EPROF_BINS))
    g = PositionalErrorProfile((0.03,) * EPROF_BINS, ei,
                               (0.04,) * EPROF_BINS, (1,) * EPROF_BINS)
    t3 = ConsensusTables(g, cfg)
    assert len(t3.plq) == EPROF_BINS
    rlen = 2000
    assert t3.table_of(0, rlen) == 0
    assert t3.table_of(rlen - cfg.w, rlen) == EPROF_BINS - 1
    # monotone selection over window starts
    tabs = [t3.table_of(ws, rlen) for ws in range(0, rlen - cfg.w, cfg.a)]
    assert tabs == sorted(tabs)
    # tables built from different rates really differ
    assert not np.array_equal(t3.plq[0], t3.plq[-1])
    assert not np.array_equal(t3.pbw[0], t3.pbw[-1])


def test_v2_profile_changes_decisions(dataset):
    """The positional tables are LIVE, not decorative (round-2 verdict weak
    item): under a strong read-position error gradient, the v2 profile
    changes at least one corrected output vs the flattened scalar (v1)
    profile of the same rates.  (Byte-equality oracle == device under v2 is
    pinned separately below.)"""
    from daccord_tpu.oracle.consensus import run_oracle
    cfg = DaccordConfig(I=(0, 10))
    ei = tuple(0.02 + 0.014 * b for b in range(EPROF_BINS))
    ed = tuple(0.10 - 0.009 * b for b in range(EPROF_BINS))
    v2 = PositionalErrorProfile((0.03,) * EPROF_BINS, ei, ed,
                                (1,) * EPROF_BINS)
    v1 = v2.scalar().rounded()
    r2, _ = run_oracle(dataset[0], dataset[1], cfg, profile=v2)
    r1, _ = run_oracle(dataset[0], dataset[1], cfg, profile=v1)
    assert r1 != r2, "positional profile never changed a decision"


def test_oracle_device_equal_with_gradient_profile(dataset):
    """oracle == device byte-equality under a non-uniform positional
    profile (windows land in different table groups)."""
    from daccord_tpu.oracle.consensus import run_oracle
    from daccord_tpu.pipeline.runner import run_tpu
    cfg = DaccordConfig(I=(0, 6))
    ei = tuple(0.05 + 0.008 * b for b in range(EPROF_BINS))
    ed = tuple(0.06 - 0.003 * b for b in range(EPROF_BINS))
    prof = PositionalErrorProfile((0.03,) * EPROF_BINS, ei, ed,
                                  (1,) * EPROF_BINS)
    ro, so = run_oracle(dataset[0], dataset[1], cfg, profile=prof)
    rt, st = run_tpu(dataset[0], dataset[1], cfg, profile=prof,
                     use_mesh=False)
    assert ro == rt
    assert so.windows_ok == st.windows_ok
