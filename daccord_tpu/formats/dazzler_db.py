"""Dazzler database (.db / .idx / .bps) reader and synthetic writer.

The on-disk format is the DAZZ_DB format that the reference consumes through
``libmaus2::dazzler::db::DatabaseFile`` (SURVEY §2.2 row 1, Appendix A.1):

- ``NAME.db``     text stub: fasta file list (+ optional block lines)
- ``.NAME.idx``   binary: HITS_DB header struct + ureads x HITS_READ records
- ``.NAME.bps``   binary: 2-bit packed bases, 4 per byte, first base in the two
                  most-significant bits; codes A=0 C=1 G=2 T=3

Struct layouts follow the public DAZZ_DB ``DB.h`` C structs compiled on x86-64
(little-endian, natural alignment).  Since no reference binaries exist in this
environment (SURVEY availability notice), the writer below is the fixture
source and the reader is validated by round-trip tests (tests/test_formats.py),
mirroring the survey's test strategy (SURVEY §4 item 1).

HITS_DB layout (112 bytes):
  off 0   int32 ureads
  off 4   int32 treads
  off 8   int32 cutoff
  off 12  int32 allflag         (DB.h 'allarr'/'all')
  off 16  float32 freq[4]
  off 32  int32 maxlen
  off 36  4-byte pad            (alignment for int64)
  off 40  int64 totlen
  off 48  int32 nreads
  off 52  int32 trimmed
  off 56  int32 part
  off 60  int32 ufirst
  off 64  int32 tfirst
  off 68  4-byte pad
  off 72  8-byte 'path' pointer (garbage in file; ignored)
  off 80  int32 loaded
  off 84  4-byte pad
  off 88  8-byte 'bases' ptr    (ignored)
  off 96  8-byte 'reads' ptr    (ignored)
  off 104 8-byte 'tracks' ptr   (ignored)

HITS_READ layout (40 bytes):
  off 0   int32 origin
  off 4   int32 rlen
  off 8   int32 fpulse
  off 12  4-byte pad
  off 16  int64 boff            (byte offset of the read in .bps)
  off 24  int64 coff
  off 32  int32 flags
  off 36  4-byte pad
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass
from typing import List, Optional, Sequence

import numpy as np

HITS_DB_SIZE = 112
HITS_READ_SIZE = 40
HITS_READ_DTYPE = np.dtype(
    [
        ("origin", "<i4"),
        ("rlen", "<i4"),
        ("fpulse", "<i4"),
        ("_pad0", "<i4"),
        ("boff", "<i8"),
        ("coff", "<i8"),
        ("flags", "<i4"),
        ("_pad1", "<i4"),
    ]
)
assert HITS_READ_DTYPE.itemsize == HITS_READ_SIZE

# base codes (ALGORITHM.md section 0)
BASE_TO_CODE = {"A": 0, "C": 1, "G": 2, "T": 3}
CODE_TO_BASE = np.frombuffer(b"ACGT", dtype=np.uint8)

# lookup: byte -> 4 base codes (first base in the two MSBs)
_BYTE_TO_CODES = np.zeros((256, 4), dtype=np.uint8)
for _b in range(256):
    for _i in range(4):
        _BYTE_TO_CODES[_b, _i] = (_b >> (2 * (3 - _i))) & 3


def pack_2bit(codes: np.ndarray) -> bytes:
    """Pack base codes (uint8 values 0..3) into 2-bit bases, 4/byte, MSB first."""
    codes = np.asarray(codes, dtype=np.uint8)
    n = len(codes)
    npad = (-n) % 4
    if npad:
        codes = np.concatenate([codes, np.zeros(npad, dtype=np.uint8)])
    c = codes.reshape(-1, 4)
    packed = (c[:, 0] << 6) | (c[:, 1] << 4) | (c[:, 2] << 2) | c[:, 3]
    return packed.astype(np.uint8).tobytes()


def unpack_2bit(buf: np.ndarray, rlen: int) -> np.ndarray:
    """Unpack bytes into rlen base codes (uint8 0..3)."""
    b = np.asarray(buf, dtype=np.uint8)
    return _BYTE_TO_CODES[b].reshape(-1)[:rlen]


def codes_to_str(codes: np.ndarray) -> str:
    return CODE_TO_BASE[np.asarray(codes, dtype=np.uint8)].tobytes().decode()


def str_to_codes(s: str) -> np.ndarray:
    arr = np.frombuffer(s.encode(), dtype=np.uint8)
    out = np.zeros(len(arr), dtype=np.uint8)
    out[arr == ord("C")] = 1
    out[arr == ord("G")] = 2
    out[arr == ord("T")] = 3
    bad = ~np.isin(arr, np.frombuffer(b"ACGT", dtype=np.uint8))
    if bad.any():
        raise ValueError("non-ACGT symbol; run fillfasta first (SURVEY §2.1)")
    return out


def _hidden_paths(db_path: str):
    d, base = os.path.split(db_path)
    root = base[:-3] if base.endswith(".db") else base
    return (
        os.path.join(d, f".{root}.idx"),
        os.path.join(d, f".{root}.bps"),
    )


def write_db(db_path: str, reads: Sequence[np.ndarray], fasta_name: str = "reads",
             prolog: str = "sim") -> None:
    """Write a dazzler DB (.db stub + hidden .idx/.bps) for the given reads.

    ``reads`` is a sequence of uint8 base-code arrays. Each read starts on a
    fresh byte in .bps (DAZZ_DB convention: per-read byte alignment via boff).
    """
    idx_path, bps_path = _hidden_paths(db_path)
    n = len(reads)
    rlens = np.array([len(r) for r in reads], dtype=np.int64)
    maxlen = int(rlens.max()) if n else 0
    totlen = int(rlens.sum())

    # .bps
    boffs = np.zeros(n, dtype=np.int64)
    off = 0
    with open(bps_path, "wb") as f:
        for i, r in enumerate(reads):
            boffs[i] = off
            data = pack_2bit(r)
            f.write(data)
            off += len(data)

    # base frequencies
    freq = np.zeros(4, dtype=np.float32)
    if totlen:
        cat = np.concatenate([np.asarray(r, dtype=np.uint8) for r in reads])
        freq = (np.bincount(cat, minlength=4) / float(totlen)).astype(np.float32)

    # .idx: HITS_DB header + HITS_READ records
    with open(idx_path, "wb") as f:
        hdr = bytearray(HITS_DB_SIZE)
        struct.pack_into("<iiii", hdr, 0, n, n, 0, 1)          # ureads,treads,cutoff,all
        struct.pack_into("<4f", hdr, 16, *freq)
        struct.pack_into("<i", hdr, 32, maxlen)
        struct.pack_into("<q", hdr, 40, totlen)
        struct.pack_into("<iiiii", hdr, 48, n, 0, 0, 0, 0)     # nreads,trimmed,part,ufirst,tfirst
        f.write(bytes(hdr))
        recs = np.zeros(n, dtype=HITS_READ_DTYPE)
        recs["origin"] = np.arange(n, dtype=np.int32)
        recs["rlen"] = rlens.astype(np.int32)
        recs["fpulse"] = 0
        recs["boff"] = boffs
        recs["coff"] = -1
        recs["flags"] = 0
        f.write(recs.tobytes())

    # .db text stub
    with open(db_path, "w") as f:
        f.write(f"files = {1:9d}\n")
        f.write(f"  {n:9d} {fasta_name} {prolog}\n")


DB_BEST = 0x2  # HITS_READ flag: best read of its well (DAZZ_DB DB.h
#                [UNCERTAIN bit value per SURVEY A.1 — pinned here; only
#                consulted when the stub's `all` field is 0])


@dataclass
class DbStub:
    """Parsed ``NAME.db`` text stub (SURVEY A.1).

    ``blocks`` is None for an unsplit DB; after a DBsplit-analog run it
    holds the (M+1) block boundary pairs ``(ufirst, tfirst)`` — untrimmed /
    trimmed first-read index per block, mirroring DAZZ_DB's stub grammar:

        files =         <F>
              <nreads_cum> <fasta> <prolog>     x F
        blocks =        <M>
        size =  <bsize> cutoff =  <cutoff> all = <0|1>
             <ufirst> <tfirst>                  x (M+1)
    """

    files: List[tuple]            # (nreads_cum, fasta_name, prolog)
    bsize: int = 0                # block size in bases (0 = unsplit)
    cutoff: int = 0               # trim reads shorter than this
    allflag: int = 1              # 0 = keep only DB_BEST reads
    blocks: Optional[List[tuple]] = None   # [(ufirst, tfirst)] x (M+1)

    @property
    def nblocks(self) -> int:
        return len(self.blocks) - 1 if self.blocks else 0


def parse_stub(db_path: str) -> DbStub:
    with open(db_path) as f:
        lines = [ln.rstrip("\n") for ln in f]
    it = iter(lines)
    first = next(it)
    nfiles = int(first.split("=")[1])
    files = []
    for _ in range(nfiles):
        parts = next(it).split()
        files.append((int(parts[0]), parts[1],
                      parts[2] if len(parts) > 2 else ""))
    stub = DbStub(files=files)
    for ln in it:
        if ln.startswith("blocks"):
            nb = int(ln.split("=")[1])
            sz = next(it).replace("=", " ").split()
            # "size <bsize> cutoff <cutoff> all <0|1>"
            stub.bsize = int(sz[1])
            stub.cutoff = int(sz[3])
            stub.allflag = int(sz[5])
            stub.blocks = []
            for _ in range(nb + 1):
                u, t = next(it).split()
                stub.blocks.append((int(u), int(t)))
            break
    return stub


def write_stub(db_path: str, stub: DbStub) -> None:
    with open(db_path, "w") as f:
        f.write(f"files = {len(stub.files):9d}\n")
        for ncum, name, prolog in stub.files:
            f.write(f"  {ncum:9d} {name} {prolog}\n")
        if stub.blocks is not None:
            f.write(f"blocks = {stub.nblocks:9d}\n")
            f.write(f"size = {stub.bsize:9d} cutoff = {stub.cutoff:9d} "
                    f"all = {stub.allflag}\n")
            for u, t in stub.blocks:
                f.write(f" {u:9d} {t:9d}\n")


def resolve_block(db_path: str):
    """Split a dazzler block reference ``name.N[.db]`` -> (stub_path, N).

    DAZZ_DB convention: block files do not exist on disk; tools parse the
    trailing integer and open the parent stub (``daligner``/``daccord`` are
    invoked per block this way).  A path whose file exists is never treated
    as a block reference."""
    if os.path.exists(db_path) or os.path.exists(db_path + ".db"):
        return db_path, 0
    base = db_path[:-3] if db_path.endswith(".db") else db_path
    root, dot, suffix = base.rpartition(".")
    if dot and suffix.isdigit():
        for cand in (root + ".db", root):
            if os.path.exists(cand):
                return cand, int(suffix)
    return db_path, 0


@dataclass
class DazzlerDB:
    """Memory-mapped dazzler DB reader (the ``DatabaseFile`` analog).

    Reference: libmaus2 ``src/libmaus2/dazzler/db/DatabaseFile.hpp`` (SURVEY
    §2.2); this reader is a host-side numpy mmap implementation per SURVEY §7.1.
    """

    path: str
    nreads: int
    rlen: np.ndarray   # int32 [nreads]   (trimmed-id space)
    boff: np.ndarray   # int64 [nreads]
    bps: np.ndarray    # uint8 mmap of .bps
    # block view (`name.N` reference): restrict processing to trimmed reads
    # [block_lo, block_hi) — read IDS stay global trimmed ids, matching the
    # ecosystem's .las id space (daligner emits global trimmed ids)
    block: int = 0
    block_lo: int = 0
    block_hi: int = 0

    @classmethod
    def open(cls, db_path: str) -> "DazzlerDB":
        """Open a DB or a block reference ``name.N``.

        When the stub carries a blocks section (DBsplit analog,
        tools/dbsplit.py), the TRIMMED database is exposed: reads shorter
        than ``cutoff`` (and, when ``all`` = 0, reads without DB_BEST) are
        dropped and ids renumbered — the id space daligner-produced .las
        files reference (libmaus2 ``DatabaseFile::computeTrimmedDatabase``,
        SURVEY §3.1)."""
        stub_path, block = resolve_block(db_path)
        idx_path, bps_path = _hidden_paths(stub_path)
        with open(idx_path, "rb") as f:
            hdr = f.read(HITS_DB_SIZE)
            ureads = struct.unpack_from("<i", hdr, 0)[0]
            recs = np.frombuffer(f.read(ureads * HITS_READ_SIZE),
                                 dtype=HITS_READ_DTYPE, count=ureads)
        bps = np.memmap(bps_path, dtype=np.uint8, mode="r")
        rlen = recs["rlen"].astype(np.int64)
        boff = recs["boff"].copy()
        stub = None
        real_stub = (stub_path if stub_path.endswith(".db")
                     else stub_path + ".db")
        if not os.path.exists(real_stub):
            real_stub = stub_path
        if os.path.exists(real_stub):
            stub = parse_stub(real_stub)
        if stub is not None and stub.blocks is not None:
            keep = rlen >= stub.cutoff
            if not stub.allflag:
                keep &= (recs["flags"] & DB_BEST) != 0
            rlen, boff = rlen[keep], boff[keep]
        n = len(rlen)
        lo, hi = 0, n
        if block:
            if stub is None or stub.blocks is None:
                raise ValueError(
                    f"{db_path}: block reference but {real_stub} has no "
                    f"blocks section (run dbsplit first)")
            if not (1 <= block <= stub.nblocks):
                raise ValueError(f"{db_path}: block {block} out of range "
                                 f"1..{stub.nblocks}")
            lo = stub.blocks[block - 1][1]
            hi = stub.blocks[block][1]
        return cls(path=stub_path, nreads=n, rlen=rlen, boff=boff, bps=bps,
                   block=block, block_lo=lo, block_hi=hi)

    @property
    def block_interval(self):
        """Trimmed-id interval of the opened block (whole DB when unsplit)."""
        return (self.block_lo, self.block_hi)

    def read_codes(self, i: int) -> np.ndarray:
        """Decode read i to uint8 base codes (the DecodedReadContainer analog,
        SURVEY §2.1 'read decoder/cache')."""
        rlen = int(self.rlen[i])
        b0 = int(self.boff[i])
        nbytes = (rlen + 3) // 4
        return unpack_2bit(self.bps[b0:b0 + nbytes], rlen)

    def read_rc_codes(self, i: int) -> np.ndarray:
        """Reverse complement of read i (COMP-flag handling, SURVEY A.2)."""
        return (3 - self.read_codes(i)[::-1]).astype(np.uint8)
