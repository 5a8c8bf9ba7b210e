"""CLI tool tests (SURVEY §2.1 tool inventory parity)."""

import io
import sys

import numpy as np
import pytest

from daccord_tpu.formats.dazzler_db import DazzlerDB
from daccord_tpu.formats.las import LasFile
from daccord_tpu.parallel.planner import plan_intervals, work_per_read
from daccord_tpu.sim import SimConfig, simulate


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("tools")
    ds = simulate(SimConfig(seed=33, genome_len=5000, coverage=9.0,
                            read_len=(800, 1200)))
    db, las = str(d / "r.db"), str(d / "r.las")
    ds.write(db, las)
    return ds, db, las, d


def test_planner_balances(dataset):
    ds, db_path, las_path, _ = dataset
    db = DazzlerDB.open(db_path)
    las = LasFile.open(las_path)
    work = work_per_read(db, las)
    assert work.sum() > 0
    parts = plan_intervals(work, 4)
    assert len(parts) == 4
    assert parts[0][0] == 0 and parts[-1][1] == db.nreads
    for (f1, t1), (f2, t2) in zip(parts, parts[1:]):
        assert t1 == f2
    sums = [int(work[f:t].sum()) for (f, t) in parts]
    assert max(sums) < work.sum() * 0.5  # roughly balanced


def test_computeintervals_cli(dataset, capsys):
    _, db_path, las_path, _ = dataset
    from daccord_tpu.tools.computeintervals import main
    assert main(["3", las_path, db_path]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 3
    assert all(line.startswith("-I") for line in out)


def test_daccord_cli_oracle_vs_device(dataset, tmp_path):
    _, db_path, las_path, _ = dataset
    from daccord_tpu.tools.daccord import main
    o1, o2 = str(tmp_path / "o.fa"), str(tmp_path / "d.fa")
    assert main([las_path, db_path, "--oracle", "--out", o1,
                 "-I", "0,2", "-V"]) == 0
    assert main([las_path, db_path, "--out", o2, "-I", "0,2"]) == 0
    assert open(o1).read() == open(o2).read()
    assert open(o1).read().startswith(">0/")


def test_lasfilteralignments_cli(dataset, tmp_path):
    _, db_path, las_path, _ = dataset
    from daccord_tpu.tools.lasfilteralignments import main
    out = str(tmp_path / "f.las")
    assert main([out, las_path, "--sigma", "2.0"]) == 0
    fl = LasFile.open(out)
    orig = LasFile.open(las_path)
    assert 0 < fl.novl <= orig.novl
    keys = [(o.aread, o.bread, o.flags, o.abpos) for o in fl]
    assert keys == sorted(keys)


def test_lasfilteralignments_absolute_cut(dataset, tmp_path):
    _, db_path, las_path, _ = dataset
    from daccord_tpu.tools.lasfilteralignments import main
    out = str(tmp_path / "g.las")
    assert main([out, las_path, "-e", "0.0"]) == 0
    assert LasFile.open(out).novl == 0


def test_filterchains_cli(dataset, tmp_path):
    _, db_path, las_path, _ = dataset
    from daccord_tpu.tools.filterchains import main
    out = str(tmp_path / "c.las")
    assert main([out, las_path]) == 0
    fl = LasFile.open(out)
    seen = set()
    for o in fl:
        key = (o.aread, o.bread, o.flags & 1)
        assert key not in seen
        seen.add(key)


def test_lasdetectsimplerepeats_cli(dataset, capsys):
    _, db_path, las_path, _ = dataset
    from daccord_tpu.tools.lasdetectsimplerepeats import main
    assert main([las_path, db_path, "--factor", "0.5", "--minlen", "10"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out, "low factor must flag intervals"
    cols = out[0].split("\t")
    assert len(cols) == 4


def test_fillfasta(tmp_path):
    from daccord_tpu.tools.fillfasta import fill_seq, main
    assert fill_seq("acgt") == "ACGT"
    assert fill_seq("ANGT") == "ACGT"[0] + "C" + "GT"
    s = fill_seq("NNNNN")
    assert set(s) <= set("ACGT") and len(s) == 5
    src = tmp_path / "in.fa"
    dst = tmp_path / "out.fa"
    src.write_text(">x\nACNNGT\n")
    assert main([str(src), str(dst)]) == 0
    from daccord_tpu.formats.fasta import read_fasta
    (name, seq), = read_fasta(str(dst))
    assert name == "x" and set(seq) <= set("ACGT")


def test_daccord_save_eprof_roundtrip(dataset, tmp_path):
    _, db_path, las_path, _ = dataset
    from daccord_tpu.tools.daccord import main
    ep = str(tmp_path / "prof.json")
    assert main([las_path, db_path, "--save-eprof", ep]) == 0
    from daccord_tpu.oracle.eprof import PositionalErrorProfile, load_profile
    prof = load_profile(ep)
    assert isinstance(prof, PositionalErrorProfile)
    assert prof.scalar().n_bases > 0
    # reuse via -E gives identical output to inline estimation
    o1, o2 = str(tmp_path / "a.fa"), str(tmp_path / "b.fa")
    assert main([las_path, db_path, "--oracle", "--out", o1, "-I", "0,2"]) == 0
    assert main([las_path, db_path, "--oracle", "--out", o2, "-I", "0,2",
                 "-E", ep]) == 0
    assert open(o1).read() == open(o2).read()


def test_daccord_dist_parts_and_merge(dataset, tmp_path):
    _, db_path, las_path, _ = dataset
    from daccord_tpu.tools.daccord_dist import main
    outdir = str(tmp_path / "parts")
    for p in range(2):
        assert main([las_path, db_path, "--outdir", outdir, "--part", str(p),
                     "--nparts", "2", "--oracle"]) == 0
    dest = str(tmp_path / "all.fasta")
    assert main([las_path, db_path, "--outdir", outdir, "--nparts", "2",
                 "--merge", dest]) == 0
    from daccord_tpu.formats.fasta import read_fasta
    from daccord_tpu.oracle.consensus import run_oracle
    from daccord_tpu.utils.config import DaccordConfig
    single, _ = run_oracle(db_path, las_path, DaccordConfig())
    assert list(read_fasta(dest)) == single


def test_daccord_dist_merge_refuses_missing(dataset, tmp_path):
    _, db_path, las_path, _ = dataset
    from daccord_tpu.tools.daccord_dist import main
    outdir = str(tmp_path / "parts0")
    assert main([las_path, db_path, "--outdir", outdir, "--nparts", "2",
                 "--merge", str(tmp_path / "x.fa")]) == 1
