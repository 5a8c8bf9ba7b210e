"""Oracle tests: the algorithm actually corrects reads (SURVEY §4 item 2)."""

import numpy as np
import pytest

from daccord_tpu.align.editdp import traceback_bpos
from daccord_tpu.formats.dazzler_db import DazzlerDB
from daccord_tpu.formats.las import LasFile
from daccord_tpu.oracle.consensus import (
    build_plq, correct_read, run_oracle, select_read_ids, stitch,
)
from daccord_tpu.oracle.dbg import kmer_codes, window_consensus
from daccord_tpu.oracle.eprof import ErrorProfile, estimate_error_profile
from daccord_tpu.oracle.offset_likely import offset_likely_q16
from daccord_tpu.pipeline.windows import ReadCache
from daccord_tpu.sim import SimConfig, simulate
from daccord_tpu.utils.config import DaccordConfig


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("ds")
    ds = simulate(SimConfig(seed=11, genome_len=6000, coverage=12.0,
                            read_len=(900, 1500)))
    ds.write(str(d / "reads.db"), str(d / "reads.las"))
    return ds, str(d / "reads.db"), str(d / "reads.las")


def test_kmer_codes():
    s = np.array([0, 1, 2, 3, 0], dtype=np.uint8)
    assert kmer_codes(s, 2).tolist() == [1, 6, 11, 12]  # AC,CG,GT,TA
    assert kmer_codes(s, 6).tolist() == []


def test_offset_likely_shapes_and_peaks():
    plq = offset_likely_q16(48, 40, 0.08, 0.04)
    assert plq.shape == (48, 41)
    assert plq.dtype == np.int32
    # column o=0 peaks at p=0; larger o peaks near o*(1+e_i-e_d)
    assert plq[:, 0].argmax() == 0
    assert abs(plq[:, 30].argmax() - 31) <= 2
    assert (plq >= 0).all()


def test_window_consensus_recovers_truth():
    """Clean synthetic window: errorful copies of a truth string -> truth."""
    rng = np.random.default_rng(5)
    cfg = DaccordConfig()
    truth = rng.integers(0, 4, size=40).astype(np.uint8)
    strings = [truth.copy()]
    for _ in range(12):
        s = []
        for b in truth:
            r = rng.random()
            if r < 0.04:
                continue  # deletion
            s.append(b if rng.random() > 0.03 else (b + 1) % 4)
            if rng.random() < 0.08:
                s.append(rng.integers(0, 4))
        strings.append(np.array(s, dtype=np.uint8))
    plq = build_plq(ErrorProfile(0.03, 0.08, 0.04), cfg)
    res = window_consensus(strings, cfg, plq, 8)
    assert res is not None
    d, _ = traceback_bpos(res, truth)
    assert d <= 2, f"consensus differs from truth by {d}"


def test_window_consensus_determinism():
    rng = np.random.default_rng(6)
    cfg = DaccordConfig()
    truth = rng.integers(0, 4, size=40).astype(np.uint8)
    strings = [truth, truth[::-1].copy(), truth.copy()]
    plq = build_plq(ErrorProfile(0.03, 0.08, 0.04), cfg)
    r1 = window_consensus([s.copy() for s in strings], cfg, plq, 8)
    r2 = window_consensus([s.copy() for s in strings], cfg, plq, 8)
    assert (r1 is None) == (r2 is None)
    if r1 is not None:
        assert np.array_equal(r1, r2)


def test_low_coverage_window_fails():
    cfg = DaccordConfig()
    plq = build_plq(ErrorProfile(0.03, 0.08, 0.04), cfg)
    s = np.arange(40, dtype=np.uint8) % 4
    # only A + 1 B string but consensus itself runs: it's extract_windows that
    # enforces coverage; window_consensus still works on tiny piles
    res = window_consensus([s, s.copy()], cfg, plq, 8)
    assert res is not None


def test_stitch_exact_overlap():
    cfg = DaccordConfig()
    rng = np.random.default_rng(7)
    full = rng.integers(0, 4, size=70).astype(np.uint8)
    # windows 0 and 1 (w=40, a=10): [0,40), [10,50) share 30 bases
    w0, w1 = full[0:40], full[10:50]
    frags = stitch([w0, w1], cfg)
    assert len(frags) == 1
    astart, aend, seq = frags[0]
    assert (astart, aend) == (0, 50)
    assert np.array_equal(seq, full[0:50])


def test_stitch_gap_breaks_fragment():
    cfg = DaccordConfig()
    rng = np.random.default_rng(8)
    wA = rng.integers(0, 4, size=40).astype(np.uint8)
    wB = rng.integers(0, 4, size=40).astype(np.uint8)
    frags = stitch([wA, None, wB], cfg)
    assert len(frags) == 2
    assert frags[0][:2] == (0, 40)
    assert frags[1][:2] == (20, 60)


def test_select_read_ids():
    cfg = DaccordConfig(J=(1, 3), I=(10, 40))
    ids = select_read_ids(100, cfg)
    assert ids == range(20, 30)
    assert select_read_ids(7, DaccordConfig()) == range(0, 7)


def test_error_profile_estimate(dataset):
    ds, db_path, las_path = dataset
    db = DazzlerDB.open(db_path)
    las = LasFile.open(las_path)
    cfg = DaccordConfig(eprof_sample=6)
    prof = estimate_error_profile(db, las, cfg)
    assert prof.n_bases > 10000
    # simulated rates: sub .03, ins .08, del .04 (pair-halved estimates)
    assert 0.005 < prof.e_sub < 0.08
    assert 0.03 < prof.e_ins < 0.16
    assert 0.015 < prof.e_del < 0.10


def test_end_to_end_correction_improves_reads(dataset):
    """The north-star property: corrected fragments are closer to the genome
    than the raw read (SURVEY §6 output correctness direction)."""
    ds, db_path, las_path = dataset
    cfg = DaccordConfig(I=(0, 4))
    records, stats = run_oracle(db_path, las_path, cfg)
    assert stats.reads == 4
    assert stats.windows > 50
    assert records, "no corrected output produced"

    db = DazzlerDB.open(db_path)
    improved = 0
    checked = 0
    for header, seq in records:
        aread, rng_part = header.split("/")
        astart, aend = map(int, rng_part.split("_"))
        aread = int(aread)
        if aend - astart < 200:
            continue
        A = db.read_codes(aread)
        from daccord_tpu.formats.dazzler_db import str_to_codes
        from daccord_tpu.sim.simulator import truth_segment
        corrected = str_to_codes(seq)
        # truth segment: genome bases under A[astart:aend]
        truth = truth_segment(ds, aread, astart, aend)
        if len(truth) < 100:
            continue
        d_raw, _ = traceback_bpos(A[astart:aend], truth)
        d_cor, _ = traceback_bpos(corrected, truth)
        rate_raw = d_raw / len(truth)
        rate_cor = d_cor / len(truth)
        checked += 1
        if rate_cor < rate_raw * 0.5:
            improved += 1
    assert checked >= 3
    assert improved >= checked * 0.7, f"only {improved}/{checked} improved"


def test_oracle_deterministic(dataset):
    ds, db_path, las_path = dataset
    cfg = DaccordConfig(I=(2, 4))
    r1, s1 = run_oracle(db_path, las_path, cfg)
    r2, s2 = run_oracle(db_path, las_path, cfg)
    assert r1 == r2
    assert s1 == s2


def test_full_mode_emits_whole_read(dataset):
    ds, db_path, las_path = dataset
    cfg = DaccordConfig(I=(0, 2), f=True)
    records, _ = run_oracle(db_path, las_path, cfg)
    assert len(records) == 2
    for i, (header, seq) in enumerate(records):
        aread = int(header.split("/")[0])
        assert header.endswith(f"0_{ds.reads[aread].rlen}")
        assert len(seq) > 0.8 * ds.reads[aread].rlen
