"""End-to-end: device pipeline output byte-equals the oracle (north star)."""

import numpy as np
import pytest

from daccord_tpu.oracle.consensus import run_oracle
from daccord_tpu.pipeline.runner import run_tpu
from daccord_tpu.sim import SimConfig, simulate
from daccord_tpu.utils.config import DaccordConfig


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e")
    ds = simulate(SimConfig(seed=21, genome_len=5000, coverage=10.0,
                            read_len=(800, 1300)))
    ds.write(str(d / "r.db"), str(d / "r.las"))
    return ds, str(d / "r.db"), str(d / "r.las")


def test_device_pipeline_equals_oracle(dataset):
    ds, db_path, las_path = dataset
    cfg = DaccordConfig(I=(0, 3), batch_windows=64)
    oracle_recs, ostats = run_oracle(db_path, las_path, cfg)
    tpu_recs, tstats = run_tpu(db_path, las_path, cfg)
    assert ostats.windows == tstats.windows
    assert ostats.windows_ok == tstats.windows_ok
    assert tpu_recs == oracle_recs  # byte-identical FASTA records


def test_device_pipeline_full_mode_equals_oracle(dataset):
    ds, db_path, las_path = dataset
    cfg = DaccordConfig(I=(3, 5), f=True, batch_windows=64)
    oracle_recs, _ = run_oracle(db_path, las_path, cfg)
    tpu_recs, _ = run_tpu(db_path, las_path, cfg)
    assert tpu_recs == oracle_recs


def test_mesh_sharded_pipeline_equals_oracle(dataset):
    """run_tpu with the 8-device data mesh == oracle (SURVEY §4 item 4)."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    ds, db_path, las_path = dataset
    cfg = DaccordConfig(I=(0, 3), batch_windows=64)
    oracle_recs, _ = run_oracle(db_path, las_path, cfg)
    tpu_recs, _ = run_tpu(db_path, las_path, cfg, use_mesh=True)
    assert tpu_recs == oracle_recs


def test_device_realign_pipeline_equals_oracle(dataset):
    """realign_device=True path == oracle (device trace-block DPs)."""
    ds, db_path, las_path = dataset
    cfg = DaccordConfig(I=(0, 3), batch_windows=64, realign_device=True)
    oracle_recs, _ = run_oracle(db_path, las_path, cfg.replace(realign_device=False))
    tpu_recs, _ = run_tpu(db_path, las_path, cfg)
    assert tpu_recs == oracle_recs


def test_process_pool_front_half_equals_serial(dataset):
    """-t N>1 fans the front half over worker processes; output identical."""
    from daccord_tpu.pipeline.runner import run_tpu
    _, db, las = dataset[0], dataset[1], dataset[2]
    cfg = DaccordConfig(I=(0, 6))
    r1, s1 = run_tpu(db, las, cfg, use_mesh=False)
    r2, s2 = run_tpu(db, las, cfg.replace(t=4), use_mesh=False)
    assert r1 == r2
    assert s1.windows_ok == s2.windows_ok
