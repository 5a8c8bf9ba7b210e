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


def test_lasfilteralignments_windowed_drops_repeat_induced(tmp_path):
    """The windowed two-pass filter (SURVEY §3.3) drops a repeat-induced
    spurious alignment (good repeat core, terrible flanks) that a GLOBAL
    mean+sigma cut keeps."""
    import numpy as np
    from daccord_tpu.formats.las import Overlap, write_las
    from daccord_tpu.tools.lasfilteralignments import (
        block_tables, global_rates, main,
    )

    tspace = 100
    rng = np.random.default_rng(0)

    def mk(aread, bread, blocks):
        nb = len(blocks)
        trace = np.stack([np.asarray(blocks, np.int64),
                          np.full(nb, tspace, np.int64)], axis=1)
        return Overlap(aread=aread, bread=bread, flags=0, abpos=0,
                       aepos=nb * tspace, bbpos=0, bepos=nb * tspace,
                       diffs=int(sum(blocks)), trace=trace)

    ovls = []
    # 30 true overlaps with heterogeneous base quality (3%..12%)
    for i in range(30):
        base = 3 + (9 * i) // 29
        blocks = base + rng.integers(-1, 2, size=30)
        ovls.append(mk(0, 1 + i, np.maximum(blocks, 1)))
    # spurious: repeat core at 4% with 3 flank blocks at 60%
    spur_blocks = [60, 60, 60] + [4] * 27
    ovls.append(mk(0, 99, spur_blocks))
    src = str(tmp_path / "in.las")
    write_las(src, tspace, ovls)

    # the global mean+3*std cut would KEEP the spurious alignment
    from daccord_tpu.formats.las import LasFile
    las = LasFile.open(src)
    g = global_rates(*block_tables(las))
    gcut = g.mean() + 3.0 * g.std()
    assert g[-1] <= gcut, "setup: global cut must keep the spurious record"

    out = str(tmp_path / "out.las")
    assert main([out, src]) == 0
    fl = LasFile.open(out)
    kept_breads = {o.bread for o in fl}
    assert 99 not in kept_breads, "windowed filter must drop the spurious"
    assert len(kept_breads) >= 27, "true overlaps overwhelmingly kept"


def test_filterchains_chain_flags(tmp_path):
    """Chain-flag semantics: keep ALL members of the BEST-flagged chain,
    even when another chain has a larger span; spanning rule without BEST."""
    import numpy as np
    from daccord_tpu.formats.las import LasFile, Overlap, write_las
    from daccord_tpu.tools.filterchains import (
        CHAIN_BEST, CHAIN_NEXT, CHAIN_START, main,
    )

    def mk(aread, bread, abpos, aepos, flags):
        nb = max(1, (aepos - abpos) // 100)
        trace = np.stack([np.full(nb, 2, np.int64),
                          np.full(nb, (aepos - abpos) // nb, np.int64)], 1)
        return Overlap(aread=aread, bread=bread, flags=flags, abpos=abpos,
                       aepos=aepos, bbpos=0, bepos=aepos - abpos,
                       diffs=2 * nb, trace=trace)

    ovls = [
        # pair (0,1): BEST chain of two records (span 900) vs a longer
        # unflagged chain (span 1000) -> BEST wins, both members kept
        mk(0, 1, 0, 500, CHAIN_START | CHAIN_BEST),
        mk(0, 1, 500, 900, CHAIN_NEXT),
        mk(0, 1, 0, 1000, CHAIN_START),
        # pair (0, 2): no BEST -> largest total span chain (two records,
        # 300+300) beats the single 500
        mk(0, 2, 0, 300, CHAIN_START),
        mk(0, 2, 300, 600, CHAIN_NEXT),
        mk(0, 2, 0, 500, CHAIN_START),
    ]
    src = str(tmp_path / "c_in.las")
    write_las(src, 100, ovls)
    out = str(tmp_path / "c_out.las")
    assert main([out, src]) == 0
    fl = LasFile.open(out)
    got = [(o.aread, o.bread, o.abpos, o.aepos) for o in fl]
    assert got == [(0, 1, 0, 500), (0, 1, 500, 900),
                   (0, 2, 0, 300), (0, 2, 300, 600)]


def test_lascheck_passes_and_catches(dataset, tmp_path):
    """lascheck: clean .las passes; framing/sort/span violations caught."""
    from daccord_tpu.formats.las import write_las
    from daccord_tpu.tools.lascheck import check_las, main as lascheck_main

    ds, db, las, d = dataset
    dbf = DazzlerDB.open(db)
    assert check_las(las, dbf) == []
    assert lascheck_main([las, db, "-v"]) == 0

    recs = list(LasFile.open(las))
    lf = LasFile.open(las)

    # unsorted: swap two records
    bad1 = str(tmp_path / "unsorted.las")
    write_las(bad1, lf.tspace, [recs[1], recs[0]] + recs[2:])
    errs = check_las(bad1, dbf)
    assert any("not sorted" in e for e in errs)

    # span violation: bepos beyond blen
    import dataclasses
    r = recs[0]
    blen = int(dbf.rlen[r.bread])
    bad2 = str(tmp_path / "span.las")
    write_las(bad2, lf.tspace,
              [dataclasses.replace(r, bepos=blen + 7)] + recs[1:])
    errs = check_las(bad2, dbf)
    assert any("B span" in e or "B-advances" in e for e in errs)

    # truncated file: header novl too large
    bad3 = str(tmp_path / "trunc.las")
    import struct as _st
    raw = open(las, "rb").read()
    open(bad3, "wb").write(_st.pack("<qi", lf.novl + 5, lf.tspace)
                           + raw[12:])
    errs = check_las(bad3, dbf)
    assert errs
    assert lascheck_main([bad1, db]) == 1


def test_lassort_lasmerge_roundtrip(dataset, tmp_path):
    """lassort restores pile order from a shuffled .las; lasmerge rebuilds
    the original file byte-for-byte from sorted per-part splits (the
    LAsort/LAmerge analog pair the pile loader's sorted-input contract
    points users at)."""
    from daccord_tpu.formats.las import write_las
    from daccord_tpu.tools.lascheck import check_las
    from daccord_tpu.tools.lasmerge import main as merge_main
    from daccord_tpu.tools.lassort import main as sort_main

    ds, db, las, d = dataset
    dbf = DazzlerDB.open(db)
    lf = LasFile.open(las)
    recs = list(lf)

    # shuffle, sort back, re-check
    rng = np.random.default_rng(5)
    perm = rng.permutation(len(recs))
    shuffled = str(tmp_path / "shuffled.las")
    write_las(shuffled, lf.tspace, [recs[i] for i in perm])
    # the indexer refuses split aread groups on the shuffled file
    with pytest.raises(ValueError):
        LasFile.open(shuffled).build_index()
    sorted_las = str(tmp_path / "sorted.las")
    assert sort_main([sorted_las, shuffled]) == 0
    assert check_las(sorted_las, dbf) == []
    # piles must be reachable again and non-empty for a covered read
    areads = LasFile.open(sorted_las).areads()
    assert len(LasFile.open(sorted_las).pile(int(areads[0]))) > 0

    # split by aread parity (each part sorted), merge -> original bytes
    even = [o for o in recs if o.aread % 2 == 0]
    odd = [o for o in recs if o.aread % 2 == 1]
    assert even and odd
    p1, p2 = str(tmp_path / "p1.las"), str(tmp_path / "p2.las")
    write_las(p1, lf.tspace, even)
    write_las(p2, lf.tspace, odd)
    merged = str(tmp_path / "merged.las")
    assert merge_main([merged, p1, p2]) == 0
    assert open(merged, "rb").read() == open(las, "rb").read()

    # unsorted input is refused with a pointer at lassort
    with pytest.raises(ValueError, match="lassort"):
        merge_main([str(tmp_path / "x.las"), shuffled, p1])

    # mixed tspace is refused
    other = str(tmp_path / "ts.las")
    write_las(other, lf.tspace + 1000, even)
    assert merge_main([str(tmp_path / "y.las"), p1, other]) == 1


def test_lasfilteralignments_eprof_shared_distribution(tmp_path):
    """-E mode: the cut derives from the SAME eprof artifact daccord -E
    saves (one fitted distribution across the toolchain).  The spurious
    repeat-flank record is dropped, true overlaps at the profile's rate are
    kept — including a SHORT alignment whose small span needs the
    binomial (span-aware) tolerance."""
    import json
    import numpy as np
    from daccord_tpu.formats.las import LasFile, Overlap, write_las
    from daccord_tpu.tools.lasfilteralignments import main, profile_mu

    tspace = 100
    rng = np.random.default_rng(3)

    def mk(aread, bread, blocks):
        nb = len(blocks)
        trace = np.stack([np.asarray(blocks, np.int64),
                          np.full(nb, tspace, np.int64)], axis=1)
        return Overlap(aread=aread, bread=bread, flags=0, abpos=0,
                       aepos=nb * tspace, bbpos=0, bepos=nb * tspace,
                       diffs=int(sum(blocks)), trace=trace)

    # profile says ~10% pairwise diffs (halved per-read rates sum to 0.05)
    eprof = str(tmp_path / "eprof.json")
    json.dump({"e_sub": 0.01, "e_ins": 0.03, "e_del": 0.01, "n_bases": 10000},
              open(eprof, "w"))
    assert abs(profile_mu(eprof) - 0.10) < 1e-12

    ovls = []
    for i in range(20):                      # true overlaps at ~10%
        blocks = 10 + rng.integers(-2, 3, size=30)
        ovls.append(mk(0, 1 + i, np.maximum(blocks, 1)))
    # short true overlap: 2 blocks at 13% (3-sigma over span 200 is ~16%)
    ovls.append(mk(0, 50, [13, 13]))
    # spurious: repeat core at profile rate, flanks at 60%
    ovls.append(mk(0, 99, [60, 60, 60] + [10] * 27))
    src = str(tmp_path / "in.las")
    write_las(src, tspace, ovls)

    out = str(tmp_path / "out.las")
    assert main([out, src, "-E", eprof]) == 0
    kept = {o.bread for o in LasFile.open(out)}
    assert 99 not in kept, "profile-driven cut must drop the spurious"
    assert 50 in kept, "short alignment within binomial tolerance kept"
    assert len(kept) == 21, "every true overlap kept"

    # v2 positional artifacts are accepted via their scalar summary
    json.dump({"version": 2, "e_sub": [0.01] * 10, "e_ins": [0.03] * 10,
               "e_del": [0.01] * 10, "n_bases": [1000] * 10},
              open(eprof, "w"))
    assert abs(profile_mu(eprof) - 0.10) < 1e-12


def test_lassort_external_chunks_identical(dataset, tmp_path):
    """--chunk-records external sort == in-memory sort, byte for byte."""
    import random

    from daccord_tpu.formats.las import LasFile, write_las
    from daccord_tpu.tools import lassort
    ds, db_path, las_path, _ = dataset
    recs = list(LasFile.open(las_path))
    rng = random.Random(3)
    rng.shuffle(recs)
    shuf = str(tmp_path / "shuf.las")
    write_las(shuf, ds.cfg.tspace, recs)
    out_mem = str(tmp_path / "mem.las")
    out_ext = str(tmp_path / "ext.las")
    assert lassort.main([out_mem, shuf]) == 0
    assert lassort.main([out_ext, shuf, "--chunk-records", "37"]) == 0
    assert open(out_mem, "rb").read() == open(out_ext, "rb").read()


def test_filterchains_streaming_equals_memory(dataset, tmp_path):
    """Streaming (sorted input) and in-memory fallback produce identical
    bytes; unsorted input falls back without error."""
    import random

    from daccord_tpu.formats.las import LasFile, write_las
    from daccord_tpu.tools import filterchains
    ds, db_path, las_path, _ = dataset
    out_stream = str(tmp_path / "s.las")
    assert filterchains.main([out_stream, las_path]) == 0
    # force the fallback on the same (sorted) input
    las = LasFile.open(las_path)
    kept, _ = filterchains.resolve_chains(filterchains.build_chains(las))
    out_mem = str(tmp_path / "m.las")
    write_las(out_mem, las.tspace, kept)
    assert open(out_stream, "rb").read() == open(out_mem, "rb").read()
    # unsorted input: fallback path runs and matches sorting-first
    recs = list(las)
    random.Random(5).shuffle(recs)
    shuf = str(tmp_path / "shuf.las")
    write_las(shuf, las.tspace, recs)
    out_uns = str(tmp_path / "u.las")
    assert filterchains.main([out_uns, shuf]) == 0
    n1 = LasFile.open(out_uns).novl
    assert n1 > 0


def test_lasfilteralignments_chunk_invariant(dataset, tmp_path):
    """Streaming chunked filter (round 4): the output .las is byte-identical
    for ANY chunk size — the pass-1 fit is integer-exact (Q20 quantized
    sums + histogram median), so no chunking can perturb the cut.  Covers
    the fit path, the -E path, and -e/--repeats composition."""
    _, db_path, las_path, d = dataset
    from daccord_tpu.tools.lasfilteralignments import main

    outs = []
    for chunk in (1, 7, 100000):
        out = str(tmp_path / f"c{chunk}.las")
        assert main([out, las_path, "--sigma", "2.0",
                     "--chunk", str(chunk)]) == 0
        outs.append(open(out, "rb").read())
    assert outs[0] == outs[1] == outs[2]
    assert LasFile.open(str(tmp_path / "c1.las")).novl > 0

    # -E + -e composition, same invariance
    import json
    eprof = str(tmp_path / "e.json")
    json.dump({"e_sub": 0.05, "e_ins": 0.05, "e_del": 0.04,
               "n_bases": 10000}, open(eprof, "w"))
    outs = []
    for chunk in (3, 100000):
        out = str(tmp_path / f"e{chunk}.las")
        assert main([out, las_path, "-E", eprof, "-e", "0.5",
                     "--chunk", str(chunk)]) == 0
        outs.append(open(out, "rb").read())
    assert outs[0] == outs[1]
