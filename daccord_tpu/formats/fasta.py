"""FASTA I/O (the ``libmaus2::fastx::FastAReader`` analog, SURVEY §2.2)."""

from __future__ import annotations

from typing import Iterable, Iterator, List, TextIO, Tuple, Union

LINE_WIDTH = 80  # pinned output wrap width


def read_fasta(path_or_f: Union[str, TextIO]) -> Iterator[Tuple[str, str]]:
    f = open(path_or_f) if isinstance(path_or_f, str) else path_or_f
    try:
        name, parts = None, []
        for line in f:
            line = line.rstrip("\n")
            if line.startswith(">"):
                if name is not None:
                    yield name, "".join(parts)
                name, parts = line[1:], []
            elif line:
                parts.append(line.strip())
        if name is not None:
            yield name, "".join(parts)
    finally:
        if isinstance(path_or_f, str):
            f.close()


def write_fasta(path_or_f: Union[str, TextIO],
                records: Iterable[Tuple[str, str]]) -> None:
    f = open(path_or_f, "w") if isinstance(path_or_f, str) else path_or_f
    try:
        for name, seq in records:
            f.write(f">{name}\n")
            for i in range(0, len(seq), LINE_WIDTH):
                f.write(seq[i:i + LINE_WIDTH] + "\n")
    finally:
        if isinstance(path_or_f, str):
            f.close()
