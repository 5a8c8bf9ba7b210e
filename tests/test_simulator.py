"""Simulator fixture tests: format validity + LAcheck invariants (SURVEY §4)."""

import numpy as np
import pytest

from daccord_tpu.formats.dazzler_db import DazzlerDB
from daccord_tpu.formats.las import LasFile
from daccord_tpu.sim import SimConfig, simulate
from daccord_tpu.align.editdp import traceback_bpos


@pytest.fixture(scope="module")
def ds():
    return simulate(SimConfig(seed=7, genome_len=6000, coverage=8.0,
                              read_len=(900, 1400)))


def test_sim_deterministic(ds):
    ds2 = simulate(SimConfig(seed=7, genome_len=6000, coverage=8.0,
                             read_len=(900, 1400)))
    assert np.array_equal(ds.genome, ds2.genome)
    assert len(ds.overlaps) == len(ds2.overlaps)
    for a, b in zip(ds.overlaps, ds2.overlaps):
        assert (a.aread, a.bread, a.abpos, a.bbpos) == (b.aread, b.bread, b.abpos, b.bbpos)


def test_sim_lacheck_invariants(ds):
    assert len(ds.overlaps) > 10
    keys = [(o.aread, o.bread, o.flags, o.abpos) for o in ds.overlaps]
    assert keys == sorted(keys)
    ncomp = 0
    for o in ds.overlaps:
        o.check(alen=ds.reads[o.aread].rlen, blen=ds.reads[o.bread].rlen)
        assert (o.trace[:, 1] <= 255).all() and (o.trace[:, 0] <= 255).all()
        ncomp += o.is_comp
    assert 0 < ncomp < len(ds.overlaps)  # both strand combinations occur


def test_sim_write_read_roundtrip(ds, tmp_path):
    db_path = str(tmp_path / "reads.db")
    las_path = str(tmp_path / "reads.las")
    ds.write(db_path, las_path)
    db = DazzlerDB.open(db_path)
    las = LasFile.open(las_path)
    assert db.nreads == len(ds.reads)
    assert las.novl == len(ds.overlaps)
    for i in range(db.nreads):
        assert np.array_equal(db.read_codes(i), ds.reads[i].codes)
    got = list(las)
    for o, g in zip(ds.overlaps, got):
        assert (o.aread, o.bread, o.flags, o.abpos, o.aepos, o.bbpos, o.bepos) \
            == (g.aread, g.bread, g.flags, g.abpos, g.aepos, g.bbpos, g.bepos)
        assert np.array_equal(o.trace, g.trace)


def test_sim_overlaps_actually_align(ds):
    """The A and B' substrings of an overlap align with plausible error rate."""
    checked = 0
    for o in ds.overlaps[:8]:
        A = ds.reads[o.aread].codes
        B = ds.reads[o.bread]
        bs = (3 - B.codes[::-1]).astype(np.uint8) if o.is_comp else B.codes
        aseg = A[o.abpos:o.aepos]
        bseg = bs[o.bbpos:o.bepos]
        d, _ = traceback_bpos(aseg, bseg)
        # two independent ~15% error copies => pair error < ~0.35
        assert d / max(len(aseg), 1) < 0.40, (d, len(aseg))
        checked += 1
    assert checked


def test_sim_trace_blocks_consistent(ds):
    """Per-block b-advances reach B substrings that align to the A blocks."""
    from daccord_tpu.formats.las import trace_block_bounds
    o = ds.overlaps[0]
    A = ds.reads[o.aread].codes
    B = ds.reads[o.bread]
    bs = (3 - B.codes[::-1]).astype(np.uint8) if o.is_comp else B.codes
    bounds = trace_block_bounds(o.abpos, o.aepos, 100)
    assert len(bounds) == len(o.trace) + 1
    bcur = o.bbpos
    for t in range(len(o.trace)):
        aseg = A[bounds[t]:bounds[t + 1]]
        bseg = bs[bcur:bcur + o.trace[t, 1]]
        if len(aseg) >= 20 and len(bseg) >= 1:
            d, _ = traceback_bpos(aseg, bseg)
            assert d / len(aseg) < 0.55
        bcur += o.trace[t, 1]
    assert bcur == o.bepos
