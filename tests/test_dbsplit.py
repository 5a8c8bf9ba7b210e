"""DBsplit analog: block boundaries, trimmed-DB view, block-reference opens.

Reference semantics: DAZZ_DB DBsplit + libmaus2 computeTrimmedDatabase
(SURVEY §2.2 row 1 "trimmed-DB and block logic", §3.1 call stack).
"""

import numpy as np
import pytest

from daccord_tpu.formats.dazzler_db import (
    DazzlerDB, parse_stub, resolve_block, write_db,
)
from daccord_tpu.tools.dbsplit import compute_blocks, dbsplit


def _mk_db(tmp_path, rlens, seed=0):
    rng = np.random.default_rng(seed)
    reads = [rng.integers(0, 4, size=n).astype(np.uint8) for n in rlens]
    db_path = str(tmp_path / "t.db")
    write_db(db_path, reads)
    return db_path, reads


def test_compute_blocks_boundaries():
    rlen = np.array([100, 200, 300, 50, 400, 100], dtype=np.int64)
    flags = np.zeros(6, dtype=np.int64)
    # cutoff 60 drops read 3; bsize 500 -> blocks [100+200], [300+...]
    b = compute_blocks(rlen, flags, bsize=500, cutoff=60, allflag=1)
    assert b[0] == (0, 0) and b[-1] == (6, 5)
    # trimmed reads: 0,1,2,4,5 with lens 100,200,300,400,100
    # greedy <=500: [100,200] | [300] (400 would overflow) | [400,100]
    assert b == [(0, 0), (2, 2), (4, 3), (6, 5)]


def test_dbsplit_roundtrip_and_trimmed_open(tmp_path):
    rlens = [500, 1500, 800, 300, 2000, 1200, 900]
    db_path, reads = _mk_db(tmp_path, rlens)
    stub = dbsplit(db_path, bsize=3000, cutoff=600, allflag=1)
    # stub round-trips through the parser
    stub2 = parse_stub(db_path)
    assert stub2.blocks == stub.blocks
    assert (stub2.bsize, stub2.cutoff, stub2.allflag) == (3000, 600, 1)
    # trimmed view: reads 1,2,4,5,6 kept, ids renumbered in order
    db = DazzlerDB.open(db_path)
    kept = [i for i, n in enumerate(rlens) if n >= 600]
    assert db.nreads == len(kept)
    for t, u in enumerate(kept):
        assert db.rlen[t] == rlens[u]
        np.testing.assert_array_equal(db.read_codes(t), reads[u])


def test_block_reference_open(tmp_path):
    rlens = [1000] * 10
    db_path, reads = _mk_db(tmp_path, rlens)
    dbsplit(db_path, bsize=3000, cutoff=0, allflag=1)
    stub = parse_stub(db_path)
    assert stub.nblocks == 4  # 3+3+3+1 reads
    # block reference without .db suffix and with it
    for ref in (db_path[:-3] + ".2", db_path[:-3] + ".2.db"):
        blk = DazzlerDB.open(ref)
        assert blk.block == 2
        assert blk.block_interval == (3, 6)
        assert blk.nreads == 10  # ids stay global
    with pytest.raises(ValueError):
        DazzlerDB.open(db_path[:-3] + ".5")  # out of range


def test_resolve_block_never_shadows_real_files(tmp_path):
    db_path, _ = _mk_db(tmp_path, [800, 900])
    # a file literally named t.2.db exists -> NOT a block reference
    p2 = str(tmp_path / "u.2.db")
    write_db(p2, [np.zeros(40, np.uint8)])
    assert resolve_block(p2) == (p2, 0)
    assert resolve_block(db_path) == (db_path, 0)


def test_block_run_equals_interval_run(tmp_path):
    """daccord on a block reference == daccord -I on the block's interval."""
    from daccord_tpu.oracle.consensus import run_oracle
    from daccord_tpu.sim.simulator import SimConfig, simulate
    from daccord_tpu.utils.config import DaccordConfig

    ds = simulate(SimConfig(seed=11, genome_len=6000, coverage=8))
    db_path = str(tmp_path / "s.db")
    las_path = str(tmp_path / "s.las")
    ds.write(db_path, las_path)
    dbsplit(db_path, bsize=sum(r.rlen for r in ds.reads) // 3,
            cutoff=0, allflag=1)
    stub = parse_stub(db_path)
    assert stub.nblocks >= 2
    lo, hi = stub.blocks[1][1], stub.blocks[2][1]
    cfg = DaccordConfig()
    recs_blk, st_blk = run_oracle(db_path[:-3] + ".2", las_path, cfg)
    recs_iv, st_iv = run_oracle(db_path, las_path, cfg.replace(I=(lo, hi)))
    assert st_blk.reads == hi - lo
    assert recs_blk == recs_iv
    # -J parts compose inside the block
    parts = []
    for j in range(2):
        r, _ = run_oracle(db_path[:-3] + ".2", las_path,
                          cfg.replace(J=(j, 2)))
        parts.extend(r)
    assert parts == recs_blk
