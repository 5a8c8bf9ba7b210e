"""Row-table front half == list-based pinned extraction (exact equality)."""

import numpy as np
import pytest

from daccord_tpu.formats.dazzler_db import DazzlerDB
from daccord_tpu.formats.las import LasFile
from daccord_tpu.pipeline.batcher import pack_windows
from daccord_tpu.pipeline.rows import RowPool, extract_rows, pack_rows_batch
from daccord_tpu.pipeline.windows import ReadCache, extract_windows, realign_pile
from daccord_tpu.sim import SimConfig, simulate
from daccord_tpu.utils.config import DaccordConfig


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("rows")
    ds = simulate(SimConfig(seed=77, genome_len=4000, coverage=10.0,
                            read_len=(700, 1100)))
    db, las = str(d / "r.db"), str(d / "r.las")
    ds.write(db, las)
    return DazzlerDB.open(db), LasFile.open(las)


def test_rows_equal_lists(dataset):
    db, las = dataset
    cfg = DaccordConfig()
    cache = ReadCache(db)
    for aread in range(min(db.nreads, 6)):
        A = db.read_codes(aread)
        realigned, _ = realign_pile(A, las.pile(aread), cache, las.tspace,
                                    w=cfg.w, a=cfg.a)
        wps = extract_windows(A, realigned, cfg)
        rr = extract_rows(A, realigned, cfg)
        assert rr.nwin == len(wps)
        for wi, wp in enumerate(wps):
            assert bool(rr.failed[wi]) == wp.failed_coverage, (aread, wi)
            got = rr.window_strings(wi)
            assert len(got) == len(wp.strings), (aread, wi)
            for g, w_ in zip(got, wp.strings):
                assert np.array_equal(g, w_), (aread, wi)


def test_pack_rows_equals_pack_windows(dataset):
    db, las = dataset
    cfg = DaccordConfig()
    cache = ReadCache(db)
    reads, refs, piles = [], [], []
    for aread in range(min(db.nreads, 4)):
        A = db.read_codes(aread)
        realigned, _ = realign_pile(A, las.pile(aread), cache, las.tspace,
                                    w=cfg.w, a=cfg.a)
        rr = extract_rows(A, realigned, cfg)
        wps = extract_windows(A, realigned, cfg)
        reads.append(rr)
        for wi in range(rr.nwin):
            if not rr.failed[wi]:
                refs.append((len(reads) - 1, wi))
                piles.append(wps[wi].strings)
    pool = RowPool(reads)
    take = min(64, len(refs))
    S1, l1, n1 = pack_rows_batch(reads, pool, refs[:take], cfg, 64, 17)
    S2, l2, n2 = pack_windows(piles[:take], cfg, 64, 17)
    assert np.array_equal(n1, n2)
    assert np.array_equal(l1, l2)
    assert np.array_equal(S1, S2)


def test_empty_read_rows():
    cfg = DaccordConfig()
    rr = extract_rows(np.zeros(10, dtype=np.uint8), [], cfg)
    assert rr.nwin == 0
