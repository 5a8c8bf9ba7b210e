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


def test_streaming_collector_equals_oracle(dataset):
    """Tiny flight/flush limits force mid-run fetches, partial bucket
    flushes and per-read stitch+emit (the bounded-memory path, VERDICT r2
    item 2); output must stay byte-identical to the oracle."""
    ds, db_path, las_path = dataset
    cfg = DaccordConfig(I=(0, 6), batch_windows=32,
                        max_flight_batches=2, bucket_flush_reads=1)
    oracle_recs, ostats = run_oracle(db_path, las_path, cfg)
    tpu_recs, tstats = run_tpu(db_path, las_path, cfg, use_mesh=False)
    assert tstats.batches > cfg.max_flight_batches  # streaming really hit
    assert tpu_recs == oracle_recs
    assert tstats.windows_ok == ostats.windows_ok
    assert tstats.k2_retries == ostats.k2_retries


def test_streaming_sink_equals_records(dataset):
    """run_tpu(sink=...) streams the SAME records in the same order as the
    returned list, and the returned list stays empty (bounded-output mode,
    VERDICT r3 weak 6: nothing output-sized accumulates in RAM)."""
    ds, db_path, las_path = dataset
    cfg = DaccordConfig(I=(0, 6), batch_windows=32,
                        max_flight_batches=2, bucket_flush_reads=1)
    base_recs, _ = run_tpu(db_path, las_path, cfg, use_mesh=False)
    streamed = []
    ret_recs, _ = run_tpu(db_path, las_path, cfg, use_mesh=False,
                          sink=lambda name, seq: streamed.append((name, seq)))
    assert ret_recs == []
    assert streamed == base_recs


def test_streaming_frees_row_pools(dataset, monkeypatch):
    """The bounded-memory invariant: every ReadRows the streamed run builds
    is released by the end of the run (row pools do not accumulate)."""
    import gc
    import weakref

    import daccord_tpu.pipeline.rows as rows_mod
    ds, db_path, las_path = dataset
    cfg = DaccordConfig(I=(0, 6), batch_windows=32,
                        max_flight_batches=2, bucket_flush_reads=1)
    refs = []
    orig = rows_mod.extract_rows

    def tracking(*a, **kw):
        rr = orig(*a, **kw)
        refs.append(weakref.ref(rr))
        return rr

    monkeypatch.setattr(rows_mod, "extract_rows", tracking)
    recs, stats = run_tpu(db_path, las_path, cfg, use_mesh=False)
    gc.collect()
    alive = sum(1 for r in refs if r() is not None)
    assert len(refs) == stats.reads
    assert alive == 0, f"{alive}/{len(refs)} ReadRows pools still alive"


def test_process_pool_front_half_equals_serial(dataset):
    """-t N>1 fans the front half over worker processes; output identical —
    under BOTH IPC transports (pickled ReadRows and the shared-memory
    segment variant)."""
    import os

    from daccord_tpu.pipeline.runner import run_tpu
    _, db, las = dataset[0], dataset[1], dataset[2]
    cfg = DaccordConfig(I=(0, 6))
    r1, s1 = run_tpu(db, las, cfg, use_mesh=False)
    r2, s2 = run_tpu(db, las, cfg.replace(t=4), use_mesh=False)
    assert r1 == r2
    assert s1.windows_ok == s2.windows_ok
    os.environ["DACCORD_FRONT_IPC"] = "shm"
    try:
        r3, s3 = run_tpu(db, las, cfg.replace(t=4), use_mesh=False)
    finally:
        del os.environ["DACCORD_FRONT_IPC"]
    assert r1 == r3
    assert s1.windows_ok == s3.windows_ok


def test_rows_shm_roundtrip():
    """rows_to_shm/rows_from_shm reconstruct every array bit-exactly as
    zero-copy views, and the segment name is gone from /dev/shm after
    attach (unlinked; memory freed when the views die)."""
    import os

    import numpy as np

    from daccord_tpu.pipeline.rows import (
        _SHM_FIELDS, extract_rows, rows_from_shm, rows_to_shm,
    )
    rng = np.random.default_rng(9)
    A = rng.integers(0, 4, size=500).astype(np.uint8)
    rr = extract_rows(A, [], DaccordConfig())
    meta = rows_to_shm(rr)
    rr2 = rows_from_shm(meta)
    assert rr2.nwin == rr.nwin
    for f in _SHM_FIELDS:
        a, b = getattr(rr, f), getattr(rr2, f)
        assert a.dtype == b.dtype and a.shape == b.shape
        assert (np.asarray(a) == np.asarray(b)).all()
    assert not os.path.exists(
        "/dev/shm/" + meta["name"].lstrip("/"))  # unlinked after attach
    # window_strings copies (must not pin the segment)
    if rr2.nwin:
        s = rr2.window_strings(0)
        assert all(x.base is None for x in s)
