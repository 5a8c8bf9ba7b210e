"""Format round-trip tests (SURVEY §4 item 1)."""

import numpy as np
import pytest

from daccord_tpu.formats.dazzler_db import (
    DazzlerDB, codes_to_str, pack_2bit, str_to_codes, unpack_2bit, write_db,
)
from daccord_tpu.formats.las import LasFile, Overlap, write_las
from daccord_tpu.formats.fasta import read_fasta, write_fasta


def test_2bit_pack_roundtrip():
    rng = np.random.default_rng(0)
    for n in [1, 3, 4, 5, 8, 1023]:
        codes = rng.integers(0, 4, size=n).astype(np.uint8)
        assert np.array_equal(unpack_2bit(
            np.frombuffer(pack_2bit(codes), dtype=np.uint8), n), codes)


def test_2bit_msb_first():
    # A C G T -> byte 0b00_01_10_11 = 0x1B (first base in the two MSBs)
    assert pack_2bit(np.array([0, 1, 2, 3], dtype=np.uint8)) == b"\x1b"


def test_str_codes_roundtrip():
    s = "ACGTTGCA"
    assert codes_to_str(str_to_codes(s)) == s
    with pytest.raises(ValueError):
        str_to_codes("ACGN")


def test_db_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    reads = [rng.integers(0, 4, size=int(n)).astype(np.uint8)
             for n in [5, 100, 1, 4097, 333]]
    db_path = str(tmp_path / "reads.db")
    write_db(db_path, reads)
    db = DazzlerDB.open(db_path)
    assert db.nreads == len(reads)
    for i, r in enumerate(reads):
        assert db.rlen[i] == len(r)
        assert np.array_equal(db.read_codes(i), r)
        assert np.array_equal(db.read_rc_codes(i), (3 - r[::-1]).astype(np.uint8))


def _mk_ovl(aread, bread, abpos, aepos, tspace, flags=0, bbpos=7):
    nblk = (aepos + tspace - 1) // tspace - abpos // tspace
    badv = np.full(nblk, 10, dtype=np.int32)
    trace = np.stack([np.arange(nblk, dtype=np.int32), badv], axis=1)
    return Overlap(aread=aread, bread=bread, flags=flags, abpos=abpos,
                   aepos=aepos, bbpos=bbpos, bepos=bbpos + int(badv.sum()),
                   diffs=int(trace[:, 0].sum()), trace=trace)


@pytest.mark.parametrize("tspace", [100, 126])  # u8 and u16 trace regimes
def test_las_roundtrip(tmp_path, tspace):
    ovls = [_mk_ovl(0, 1, 5, 250, tspace), _mk_ovl(0, 2, 0, 300, tspace, flags=1),
            _mk_ovl(2, 0, 99, 101, tspace), _mk_ovl(5, 1, 100, 200, tspace)]
    path = str(tmp_path / "x.las")
    write_las(path, tspace, ovls)
    las = LasFile.open(path)
    assert las.novl == len(ovls) and las.tspace == tspace
    assert las.small == (tspace <= 125)
    got = list(las)
    for o, g in zip(ovls, got):
        assert (o.aread, o.bread, o.flags, o.abpos, o.aepos, o.bbpos,
                o.bepos, o.diffs) == (g.aread, g.bread, g.flags, g.abpos,
                                      g.aepos, g.bbpos, g.bepos, g.diffs)
        assert np.array_equal(o.trace, g.trace)
        g.check()


def test_las_pile_index(tmp_path):
    tspace = 100
    ovls = [_mk_ovl(0, 1, 5, 250, tspace), _mk_ovl(0, 2, 0, 300, tspace),
            _mk_ovl(2, 0, 99, 101, tspace), _mk_ovl(5, 1, 100, 200, tspace)]
    path = str(tmp_path / "x.las")
    write_las(path, tspace, ovls)
    las = LasFile.open(path)
    assert list(las.areads()) == [0, 2, 5]
    assert len(las.pile(0)) == 2
    assert len(las.pile(2)) == 1
    assert las.pile(3) == []
    assert [o.bread for o in las.pile(0)] == [1, 2]
    # index is persisted and reused
    las2 = LasFile.open(path)
    assert len(las2.pile(5)) == 1


def test_las_record_size_is_c_layout(tmp_path):
    """Record fixed part is 40 bytes = sizeof(Overlap)-sizeof(void*) (A.2)."""
    path = str(tmp_path / "one.las")
    o = _mk_ovl(0, 1, 0, 100, 100)
    write_las(path, 100, [o])
    import os
    assert os.path.getsize(path) == 12 + 40 + len(o.trace.reshape(-1))


def test_fasta_roundtrip(tmp_path):
    recs = [("r1", "ACGT" * 50), ("r2/0_5", "ACGTA")]
    p = str(tmp_path / "x.fasta")
    write_fasta(p, recs)
    assert list(read_fasta(p)) == recs


def test_las_unsorted_areads_rejected(tmp_path):
    """Out-of-contract input (not LAmerge'd) must raise, not mis-pile."""
    tspace = 100
    ovls = [_mk_ovl(5, 1, 0, 100, tspace), _mk_ovl(0, 2, 0, 100, tspace)]
    path = str(tmp_path / "unsorted.las")
    write_las(path, tspace, ovls)
    with pytest.raises(ValueError, match="sorted by aread"):
        LasFile.open(path).build_index()
    # same aread in two separate groups is equally rejected
    ovls2 = [_mk_ovl(0, 1, 0, 100, tspace), _mk_ovl(2, 1, 0, 100, tspace),
             _mk_ovl(0, 3, 0, 100, tspace)]
    path2 = str(tmp_path / "split.las")
    write_las(path2, tspace, ovls2)
    with pytest.raises(ValueError, match="sorted by aread"):
        LasFile.open(path2).build_index()


def test_las_stale_index_detected(tmp_path):
    """Rewriting the .las with preserved mtime must invalidate the .npz."""
    import os
    tspace = 100
    path = str(tmp_path / "y.las")
    write_las(path, tspace, [_mk_ovl(0, 1, 0, 100, tspace)])
    las = LasFile.open(path)
    las.build_index()
    st = os.stat(path)
    # rewrite with different content, restore timestamps (copy-with-mtime)
    write_las(path, tspace, [_mk_ovl(0, 1, 0, 100, tspace),
                             _mk_ovl(3, 2, 0, 200, tspace)])
    os.utime(path, (st.st_atime, st.st_mtime))
    os.utime(las.index_path, (st.st_atime + 10, st.st_mtime + 10))
    las2 = LasFile.open(path)
    assert list(las2.areads()) == [0, 3]  # stale index NOT reused


def test_malformed_trace_block_count_rejected(tmp_path):
    """tlen/2 disagreeing with (abpos, aepos, tspace) raises descriptively."""
    from daccord_tpu.pipeline.windows import check_pile_traces
    o = _mk_ovl(0, 1, 5, 250, 100)
    o.trace = o.trace[:-1]  # drop a block
    with pytest.raises(ValueError, match="trace has"):
        check_pile_traces([o], 100)
