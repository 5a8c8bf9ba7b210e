"""Scale-out tests: sharded parts == single run; resume; fault injection;
multi-device mesh execution (SURVEY §4 items 4-5, §5)."""

import json

import os

import numpy as np
import pytest

from daccord_tpu.oracle.consensus import run_oracle
from daccord_tpu.parallel.distributed import (
    manifest_path, merge_parts, missing_parts, part_path, plan, run_part,
)
from daccord_tpu.sim import SimConfig, simulate
from daccord_tpu.utils.config import DaccordConfig


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("dist")
    ds = simulate(SimConfig(seed=55, genome_len=4000, coverage=9.0,
                            read_len=(700, 1100)))
    db, las = str(d / "r.db"), str(d / "r.las")
    ds.write(db, las)
    return str(d), db, las


def test_parts_equal_single_run(dataset, tmp_path):
    root, db, las = dataset
    cfg = DaccordConfig(batch_windows=32)
    single, _ = run_oracle(db, las, cfg)

    outdir = str(tmp_path / "parts")
    nparts = 3
    for p in range(nparts):
        run_part(db, las, cfg, p, nparts, outdir, use_oracle=False)
    dest = str(tmp_path / "merged.fasta")
    n = merge_parts(outdir, nparts, dest)
    from daccord_tpu.formats.fasta import read_fasta
    merged = list(read_fasta(dest))
    assert merged == single
    assert n == len(single)


def test_resume_skips_done_parts(dataset, tmp_path):
    root, db, las = dataset
    cfg = DaccordConfig(batch_windows=32)
    outdir = str(tmp_path / "parts")
    e1 = run_part(db, las, cfg, 0, 2, outdir, use_oracle=True)
    m0 = os.path.getmtime(part_path(outdir, 0))
    e2 = run_part(db, las, cfg, 0, 2, outdir, use_oracle=True)
    assert e1 == e2
    assert os.path.getmtime(part_path(outdir, 0)) == m0  # untouched
    assert missing_parts(db, las, 2, outdir) == [1]


def test_fault_injection_corrupt_part_redone(dataset, tmp_path):
    """A crashed/corrupted part is detected and re-run (SURVEY §5)."""
    root, db, las = dataset
    cfg = DaccordConfig(batch_windows=32)
    outdir = str(tmp_path / "parts")
    run_part(db, las, cfg, 0, 2, outdir, use_oracle=True)
    with open(part_path(outdir, 0), "a") as f:
        f.write(">junk\nACGT\n")  # simulate partial/corrupt write
    assert 0 in missing_parts(db, las, 2, outdir)
    e = run_part(db, las, cfg, 0, 2, outdir, use_oracle=True)
    assert 0 not in missing_parts(db, las, 2, outdir)
    assert e["records"] > 0


_PART_SCRIPT = """
import sys
sys.path.insert(0, {root!r})
import jax
jax.config.update("jax_platforms", "cpu")
from daccord_tpu.parallel.distributed import run_part
from daccord_tpu.utils.config import DaccordConfig
run_part({db!r}, {las!r}, DaccordConfig(batch_windows=32), {part}, {nparts},
         {outdir!r})
"""


def test_multiprocess_parts(dataset, tmp_path):
    """N separate OS processes produce parts equal to the single run
    (the multi-host execution model without a cluster, SURVEY §4 item 4)."""
    import subprocess
    import sys as _sys

    root, db, las = dataset
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = str(tmp_path / "parts")
    nparts = 2
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # children must not touch the TPU
    procs = [subprocess.Popen(
        [_sys.executable, "-c", _PART_SCRIPT.format(
            root=repo, db=db, las=las, part=p, nparts=nparts, outdir=outdir)],
        env=env) for p in range(nparts)]
    done = [p.wait(timeout=600) for p in procs]
    assert done == [0, 0]
    dest = str(tmp_path / "merged.fasta")
    merge_parts(outdir, nparts, dest)
    single, _ = run_oracle(db, las, DaccordConfig())
    from daccord_tpu.formats.fasta import read_fasta
    assert list(read_fasta(dest)) == single


def test_plan_covers_all_reads(dataset):
    root, db, las = dataset
    iv = plan(db, las, 4)
    assert iv[0][0] == 0
    for (a, b), (c, d) in zip(iv, iv[1:]):
        assert b == c


def test_mesh_sharded_step_runs_on_8_devices():
    """Sharded consensus step on the 8-device virtual mesh (SURVEY §4.4)."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import __graft_entry__ as g
    g.dryrun_multichip(8)
