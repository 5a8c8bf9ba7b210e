"""Repeat-interval masking loop: detect -> --repeats filter -> better piles.

Closes VERDICT r2 missing #3: lasdetectsimplerepeats' intervals now have a
consumer (lasfilteralignments --repeats), and this test proves the loop on a
planted diverged segmental duplication — the repeat-induced cross-copy
alignments measurably corrupt the consensus, and masking them recovers it
(regime: adequate coverage ~20x and diverged copies — at low coverage the
repeat-interior pile thinning can outweigh the poison removal; measured in
RESULTS.md).
Reference: gt1/daccord src/lasdetectsimplerepeats.cpp ("intervals used to
mask piles", SURVEY §2.1).
"""

import numpy as np
import pytest

from daccord_tpu.formats.dazzler_db import DazzlerDB, str_to_codes
from daccord_tpu.formats.las import LasFile
from daccord_tpu.sim import SimConfig, simulate
from daccord_tpu.sim.simulator import truth_segment
from daccord_tpu.tools import lasdetectsimplerepeats, lasfilteralignments
from daccord_tpu.utils.config import DaccordConfig

SEGDUP = (2000, 1200, 14000)    # src, length, dst


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("repmask")
    ds = simulate(SimConfig(seed=9, genome_len=20000, coverage=20.0,
                            read_len=(900, 1400), segdup=SEGDUP,
                            segdup_divergence=0.08))
    ds.write(str(d / "r.db"), str(d / "r.las"))
    return ds, str(d / "r.db"), str(d / "r.las"), d


def _is_cross_copy(ds, o):
    """True if the record aligns reads whose genome intervals are disjoint
    (only possible via the planted duplication)."""
    A, B = ds.reads[o.aread], ds.reads[o.bread]
    return min(A.gend, B.gend) - max(A.gstart, B.gstart) < 500


def test_sim_emits_cross_copy_records(dataset):
    ds, _, _, _ = dataset
    cross = [o for o in ds.overlaps if _is_cross_copy(ds, o)]
    true = [o for o in ds.overlaps if not _is_cross_copy(ds, o)]
    assert len(cross) >= 10, "segdup should yield repeat-induced records"
    assert len(true) > len(cross)
    # LAcheck invariants still hold on the composed cross-copy traces
    from daccord_tpu.tools.lascheck import check_las
    db = DazzlerDB.open(dataset[1])
    assert check_las(dataset[2], db) == []


def test_detect_then_mask_drops_cross_copy(dataset):
    ds, db_path, las_path, d = dataset
    db = DazzlerDB.open(db_path)
    las = LasFile.open(las_path)
    # two-copy duplication doubles positional depth over the copies
    rows, med = lasdetectsimplerepeats.detect(db, las, factor=1.4, minlen=100)
    assert rows, "depth-anomaly detection should flag the planted segdup"
    rep_path = str(d / "rep.txt")
    with open(rep_path, "w") as f:
        for (a, s, e, dm) in rows:
            f.write(f"{a}\t{s}\t{e}\t{dm}\n")
    repeats = lasfilteralignments.load_repeats(rep_path)
    keep = lasfilteralignments.repeat_masked(las, repeats, frac=0.8)
    cross = np.array([_is_cross_copy(ds, o) for o in las])
    dropped_cross = (~keep & cross).sum()
    dropped_true = (~keep & ~cross).sum()
    assert dropped_cross >= 0.8 * cross.sum(), \
        f"masking should drop most cross-copy records " \
        f"({dropped_cross}/{cross.sum()})"
    assert dropped_true <= 0.12 * (~cross).sum(), \
        f"masking should keep most true records (dropped {dropped_true})"


def test_masking_improves_correction(dataset):
    """End-to-end: corrected error rate over reads touching the diverged
    copy improves when the pile is masked (the reference's motivation for
    the tool).  Uses the C++ CPU runner (bit-identical to the oracle)."""
    ds, db_path, las_path, d = dataset
    from daccord_tpu.align.editdp import edit_distance
    from daccord_tpu.pipeline.cpu_runner import run_cpu

    db = DazzlerDB.open(db_path)
    las = LasFile.open(las_path)
    rows, _ = lasdetectsimplerepeats.detect(db, las, factor=1.4, minlen=100)
    rep_path = str(d / "rep2.txt")
    with open(rep_path, "w") as f:
        for (a, s, e, dm) in rows:
            f.write(f"{a}\t{s}\t{e}\t{dm}\n")
    filt_path = str(d / "filtered.las")
    rc = lasfilteralignments.main([filt_path, las_path,
                                   "--repeats", rep_path, "--repeat-frac", "0.8",
                                   "--sigma", "1e9"])  # repeat mask only
    assert rc == 0

    src, L, dst = SEGDUP
    touch = [i for i, r in enumerate(ds.reads)
             if min(r.gend, dst + L) - max(r.gstart, dst) >= 200]
    assert touch, "some reads must cover the diverged copy"

    def corrected_err(las_file):
        tot_err = tot_len = 0
        cfg = DaccordConfig()
        recs, _ = run_cpu(db_path, las_file, cfg, nthreads=2)
        for header, seq in recs:
            aread, rng_part = header.split("/")
            astart, aend = map(int, rng_part.split("_"))
            if int(aread) not in touch:
                continue
            truth = truth_segment(ds, int(aread), astart, aend)
            if len(truth) < 100:
                continue
            tot_err += edit_distance(str_to_codes(seq), truth)
            tot_len += len(truth)
        return tot_err, tot_len

    err_raw, len_raw = corrected_err(las_path)
    err_mask, len_mask = corrected_err(filt_path)
    assert len_raw > 0 and len_mask > 0
    rate_raw = err_raw / len_raw
    rate_mask = err_mask / len_mask
    assert rate_mask < rate_raw, \
        f"masking should improve corrected identity " \
        f"(raw {rate_raw:.4f} vs masked {rate_mask:.4f})"
