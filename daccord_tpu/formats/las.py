"""daligner .las overlap file reader / writer / indexer.

Byte layout per SURVEY Appendix A.2 (public DALIGNER ``align.h`` structs,
x86-64):

  header:  int64 novl; int32 tspace
  record:  the Overlap struct minus its leading trace pointer, i.e.
           int32 tlen, diffs, abpos, bbpos, aepos, bepos; uint32 flags;
           int32 aread, bread; 4 bytes tail padding  (40 bytes total,
           = sizeof(Overlap) - sizeof(void*) with natural alignment)
           then the trace: tlen x uint8 when tspace <= 125 ("small"), else
           tlen x uint16.

Trace semantics: tlen/2 pairs (d_j, b_j), one per A interval between successive
multiples of tspace clipped to [abpos, aepos): d_j = #diffs, b_j = #B bases.
Invariant (LAcheck analog, SURVEY §4): sum(b_j) == bepos - bbpos.

Flags: bit 0 = COMP (B read reverse-complemented; bbpos/bepos count on the RC
strand).  Unknown bits are preserved.

The sidecar index (aread -> first-record file offset + count) is our
``OverlapIndexer`` analog (SURVEY §2.2), stored as ``<las>.npz`` on first use.
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass, field
from typing import Iterator, List, Optional, Sequence

import numpy as np

FLAG_COMP = 0x1
RECORD_FIXED = 40  # bytes before the trace data
_REC = struct.Struct("<iiiiiiIii4x")
assert _REC.size == RECORD_FIXED


@dataclass
class Overlap:
    """One .las record (the libmaus2 ``Overlap`` analog)."""

    aread: int
    bread: int
    flags: int
    abpos: int
    aepos: int
    bbpos: int
    bepos: int
    diffs: int
    trace: np.ndarray  # int32 [nblocks, 2] columns (d_j, b_j)

    @property
    def is_comp(self) -> bool:
        return bool(self.flags & FLAG_COMP)

    def check(self, alen: Optional[int] = None, blen: Optional[int] = None) -> None:
        """LAcheck-style invariants (SURVEY §4 item 1)."""
        assert 0 <= self.abpos < self.aepos, (self.abpos, self.aepos)
        assert 0 <= self.bbpos < self.bepos, (self.bbpos, self.bepos)
        if alen is not None:
            assert self.aepos <= alen
        if blen is not None:
            assert self.bepos <= blen
        assert int(self.trace[:, 1].sum()) == self.bepos - self.bbpos


def n_trace_blocks(abpos: int, aepos: int, tspace: int) -> int:
    """Number of trace blocks for A range [abpos, aepos) with spacing tspace."""
    return (aepos + tspace - 1) // tspace - abpos // tspace


def trace_block_bounds(abpos: int, aepos: int, tspace: int) -> np.ndarray:
    """A-coordinate boundaries of the trace blocks: int array [nblocks+1]."""
    first = (abpos // tspace + 1) * tspace
    inner = np.arange(first, aepos, tspace, dtype=np.int64)
    return np.concatenate([[abpos], inner, [aepos]])


def _write_record(f, o: Overlap, small: bool) -> None:
    tr = np.asarray(o.trace, dtype=np.int64).reshape(-1, 2)
    flat = tr.reshape(-1)
    tlen = flat.size
    f.write(_REC.pack(tlen, o.diffs, o.abpos, o.bbpos,
                      o.aepos, o.bepos, o.flags, o.aread, o.bread))
    if small:
        if flat.size and flat.max() > 255:
            raise ValueError("trace value exceeds u8 in small-trace regime")
        f.write(flat.astype(np.uint8).tobytes())
    else:
        f.write(flat.astype("<u2").tobytes())


def write_las(path: str, tspace: int, overlaps: Sequence[Overlap]) -> None:
    """Write a .las file. Records must already be sorted by (aread, bread, ...)."""
    small = tspace <= 125
    with open(path, "wb") as f:
        f.write(struct.pack("<qi", len(overlaps), tspace))
        for o in overlaps:
            _write_record(f, o, small)


def write_las_stream(path: str, tspace: int, novl: int, overlaps) -> None:
    """Write a .las from an iterator without materializing the records
    (the LAmerge-analog path: novl is known upfront as the sum of the
    inputs' headers).  Raises if the iterator yields != novl records —
    the header would otherwise lie about the record count."""
    small = tspace <= 125
    n = 0
    with open(path, "wb") as f:
        f.write(struct.pack("<qi", novl, tspace))
        for o in overlaps:
            _write_record(f, o, small)
            n += 1
    if n != novl:
        raise ValueError(f"writer promised novl={novl} but got {n} records")


@dataclass
class LasFile:
    """Streaming .las reader with an aread-keyed random access index."""

    path: str
    novl: int
    tspace: int
    small: bool
    _index: Optional[dict] = field(default=None, repr=False)

    @classmethod
    def open(cls, path: str) -> "LasFile":
        with open(path, "rb") as f:
            novl, tspace = struct.unpack("<qi", f.read(12))
        return cls(path=path, novl=novl, tspace=tspace, small=tspace <= 125)

    # -- streaming ---------------------------------------------------------
    def __iter__(self) -> Iterator[Overlap]:
        with open(self.path, "rb") as f:
            f.seek(12)
            for _ in range(self.novl):
                yield self._read_record(f)

    def _read_record(self, f) -> Overlap:
        buf = f.read(RECORD_FIXED)
        tlen, diffs, abpos, bbpos, aepos, bepos, flags, aread, bread = _REC.unpack(buf)
        if self.small:
            tr = np.frombuffer(f.read(tlen), dtype=np.uint8)
        else:
            tr = np.frombuffer(f.read(2 * tlen), dtype="<u2")
        return Overlap(aread=aread, bread=bread, flags=flags, abpos=abpos,
                       aepos=aepos, bbpos=bbpos, bepos=bepos, diffs=diffs,
                       trace=tr.astype(np.int32).reshape(-1, 2))

    # -- indexing (OverlapIndexer analog) ----------------------------------
    @property
    def index_path(self) -> str:
        return self.path + ".npz"

    def build_index(self) -> dict:
        """aread -> (file offset of first record, record count). Cached on disk."""
        if self._index is not None:
            return self._index
        las_size = os.path.getsize(self.path)
        if os.path.exists(self.index_path) and (
                os.path.getmtime(self.index_path) >= os.path.getmtime(self.path)):
            z = np.load(self.index_path)
            # mtime alone is not enough (a .las rewritten within mtime
            # granularity, or copied with preserved timestamps, would reuse a
            # stale index): require the recorded novl + file size to match too
            stamp_ok = ("novl" in z and "las_size" in z
                        and int(z["novl"]) == self.novl
                        and int(z["las_size"]) == las_size)
            if stamp_ok:
                self._index = {"areads": z["areads"], "offsets": z["offsets"],
                               "counts": z["counts"]}
                return self._index
        areads, offsets, counts = [], [], []
        unit = 1 if self.small else 2
        with open(self.path, "rb") as f:
            f.seek(12)
            pos = 12
            prev = None
            for _ in range(self.novl):
                hdr = f.read(RECORD_FIXED)
                tlen = struct.unpack_from("<i", hdr, 0)[0]
                aread = struct.unpack_from("<i", hdr, 28)[0]
                if aread != prev:
                    areads.append(aread)
                    offsets.append(pos)
                    counts.append(0)
                    prev = aread
                counts[-1] += 1
                f.seek(tlen * unit, 1)
                pos += RECORD_FIXED + tlen * unit
        areads_arr = np.array(areads, dtype=np.int64)
        if len(areads_arr) > 1 and not np.all(np.diff(areads_arr) > 0):
            # pile() binary-searches this array; unsorted or split aread
            # groups (e.g. concatenated block outputs never LAmerge'd) would
            # silently yield wrong/partial piles — refuse instead
            raise ValueError(
                f"{self.path}: records are not sorted by aread (or an aread "
                "appears in more than one group); sort/merge the .las first")
        self._index = {"areads": areads_arr,
                       "offsets": np.array(offsets, dtype=np.int64),
                       "counts": np.array(counts, dtype=np.int64)}
        try:
            np.savez(self.index_path, novl=np.int64(self.novl),
                     las_size=np.int64(las_size), **self._index)
        except OSError:
            pass  # read-only dir: keep in-memory index
        return self._index

    def pile(self, aread: int) -> List[Overlap]:
        """All records for the given aread, in file order (SURVEY §3.1
        'pile loader')."""
        idx = self.build_index()
        where = np.searchsorted(idx["areads"], aread)
        if where >= len(idx["areads"]) or idx["areads"][where] != aread:
            return []
        out = []
        with open(self.path, "rb") as f:
            f.seek(int(idx["offsets"][where]))
            for _ in range(int(idx["counts"][where])):
                out.append(self._read_record(f))
        return out

    def areads(self) -> np.ndarray:
        return self.build_index()["areads"]

    def pile_counts(self):
        """(areads, record counts) arrays."""
        idx = self.build_index()
        return idx["areads"], idx["counts"]


class MultiLas:
    """Union of several .las files as one pile source (SURVEY config 3:
    'multi-.las piles').

    Pile order [PINNED]: the MERGED order — records sorted by lasmerge's key
    (bread, COMP, abpos, bbpos) with ties in input-file order — so a pile is
    byte-identical whether block .las files are merged on disk (lasmerge)
    or opened together (one blessed route; DALIGNER LAmerge semantics,
    SURVEY §2.3).  All files must share tspace.
    """

    def __init__(self, paths: Sequence[str]):
        assert paths
        self.files = [LasFile.open(p) for p in paths]
        ts = {f.tspace for f in self.files}
        if len(ts) != 1:
            raise ValueError(f"mixed tspace across .las inputs: {ts}")
        self.tspace = self.files[0].tspace
        self.small = self.files[0].small
        self.novl = sum(f.novl for f in self.files)

    def build_index(self) -> None:
        for f in self.files:
            f.build_index()

    def pile(self, aread: int) -> List[Overlap]:
        out: List[Overlap] = []
        for f in self.files:
            out.extend(f.pile(aread))
        # stable sort on the concatenation == k-way merge by the lasmerge
        # key with equal keys kept in input-file order (each sorted input's
        # own records are already key-ordered within its pile)
        out.sort(key=lambda o: (o.bread, o.flags & FLAG_COMP,
                                o.abpos, o.bbpos))
        return out

    def areads(self) -> np.ndarray:
        return np.unique(np.concatenate([f.areads() for f in self.files]))

    def pile_counts(self):
        """(areads, summed record counts) across files."""
        a_all = np.concatenate([f.pile_counts()[0] for f in self.files])
        c_all = np.concatenate([f.pile_counts()[1] for f in self.files])
        areads, inv = np.unique(a_all, return_inverse=True)
        counts = np.zeros(len(areads), dtype=np.int64)
        np.add.at(counts, inv, c_all)
        return areads, counts


def open_piles(paths) -> "LasFile | MultiLas":
    """One path -> LasFile; several -> MultiLas."""
    if isinstance(paths, (list, tuple)):
        if len(paths) == 1:
            return LasFile.open(paths[0])
        return MultiLas(paths)
    return LasFile.open(paths)
