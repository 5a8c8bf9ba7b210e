"""Cross-config fuzz: oracle == device pipeline on non-default geometries.

Exercises code paths the default config never hits: w not a multiple of a
(second lattice remainder class in realign_pile), different k (universe
sizes), small depth caps, tight coverage thresholds.
"""

import numpy as np
import pytest

from daccord_tpu.oracle.consensus import run_oracle
from daccord_tpu.pipeline.runner import run_tpu
from daccord_tpu.sim import SimConfig, simulate
from daccord_tpu.utils.config import DaccordConfig


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("fuzz")
    ds = simulate(SimConfig(seed=101, genome_len=4000, coverage=10.0,
                            read_len=(700, 1100)))
    db, las = str(d / "r.db"), str(d / "r.las")
    ds.write(db, las)
    return db, las


CONFIGS = [
    dict(w=30, a=8, k=6, k2=10, path_delta=3),     # w % a != 0
    dict(w=48, a=12, k=7, k2=11, path_delta=4),    # odd k
    dict(w=40, a=10, k=8, k2=12, d=8, m=2),        # tight depth cap
    dict(w=24, a=6, k=5, k2=9, path_delta=2, m=4), # small windows
]


@pytest.mark.parametrize("kw", CONFIGS)
def test_fuzz_config_equality(dataset, kw):
    db, las = dataset
    cfg = DaccordConfig(I=(0, 2), batch_windows=32, **kw)
    o, ostats = run_oracle(db, las, cfg)
    t, tstats = run_tpu(db, las, cfg)
    assert ostats.windows == tstats.windows
    assert o == t, f"mismatch for {kw}"
    assert tstats.windows_ok > 0  # configs must actually correct something
