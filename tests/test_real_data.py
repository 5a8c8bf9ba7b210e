"""Real-data re-verification hooks (SURVEY Appendix A [UNCERTAIN] markers).

Skipped unless DACCORD_REAL_DB / DACCORD_REAL_LAS point at a REAL dazzler
database and .las file (e.g. produced by DBsplit/daligner on actual reads).
The moment real data or the reference binaries appear, running

    DACCORD_REAL_DB=/path/x.db DACCORD_REAL_LAS=/path/x.las pytest tests/test_real_data.py

re-audits every byte-layout assumption that was pinned from documentation
rather than verified against upstream artifacts:

1. HITS_DB/HITS_READ struct layout (record size, field offsets, the
   [UNCERTAIN] trailing padding of HITS_READ).
2. .las record framing (u8 vs u16 trace regimes, tlen parity, LAcheck
   invariants: sorted areads, trace b-advance sums).
3. The bpos map's [PINNED-HERE] "leftmost column on ANY optimal path" rule
   vs the reference's NP traceback: flagged for manual comparison against
   reference daccord output (see assert message).
"""

import os

import numpy as np
import pytest

REAL_DB = os.environ.get("DACCORD_REAL_DB")
REAL_LAS = os.environ.get("DACCORD_REAL_LAS")

pytestmark = pytest.mark.skipif(
    not (REAL_DB and REAL_LAS),
    reason="set DACCORD_REAL_DB / DACCORD_REAL_LAS to re-audit byte layouts "
           "against real dazzler artifacts")


def test_real_db_layout():
    from daccord_tpu.formats.dazzler_db import DazzlerDB
    db = DazzlerDB.open(REAL_DB)
    assert db.nreads > 0
    # every read decodes to in-range codes of the recorded length
    for i in range(min(db.nreads, 50)):
        codes = db.read_codes(i)
        assert len(codes) == int(db.rlen[i])
        assert codes.max(initial=0) <= 3
    # boff monotonicity implies the pinned HITS_READ record size parsed the
    # index correctly (a wrong record size scrambles boff immediately)
    assert np.all(np.diff(db.boff[: min(db.nreads, 1000)]) >= 0)


def test_real_las_invariants():
    from daccord_tpu.formats.las import LasFile
    from daccord_tpu.pipeline.windows import trace_block_bounds
    las = LasFile.open(REAL_LAS)
    assert las.novl > 0
    prev = (-1, -1)
    for n, o in enumerate(las):
        if n >= 2000:
            break
        o.check()
        assert (o.aread, o.bread) >= prev, "records must be aread-sorted"
        prev = (o.aread, o.bread)
        # LAcheck: trace b-advances sum to the B interval
        assert int(o.trace[:, 1].sum()) == o.bepos - o.bbpos
        # block count consistent with (abpos, aepos, tspace)
        bounds = trace_block_bounds(o.abpos, o.aepos, las.tspace)
        assert len(o.trace) == len(bounds) - 1


def test_real_pile_consensus_smoke(tmp_path):
    """Full pipeline runs on a real pile and the device path equals the
    oracle byte-for-byte.  NOTE: equality to the reference BINARY's output
    additionally requires auditing the [PINNED-HERE] bpos rule
    (ALGORITHM §1) against libmaus2 lcs::NP tracebacks — compare this
    test's FASTA to `daccord <las> <db>` output when the binary exists."""
    from daccord_tpu.oracle.consensus import run_oracle
    from daccord_tpu.pipeline.runner import run_tpu
    from daccord_tpu.utils.config import DaccordConfig
    cfg = DaccordConfig(I=(0, 4))
    ro, _ = run_oracle(REAL_DB, REAL_LAS, cfg)
    rt, _ = run_tpu(REAL_DB, REAL_LAS, cfg, use_mesh=False)
    assert ro == rt
