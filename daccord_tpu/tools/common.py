"""Shared CLI plumbing: reference-style flag parsing (SURVEY Appendix B)."""

from __future__ import annotations

import argparse
from typing import List, Optional, Tuple

from daccord_tpu.utils.config import DaccordConfig


def _pair(s: str) -> Tuple[int, int]:
    a, b = s.split(",")
    return int(a), int(b)


def add_daccord_flags(p: argparse.ArgumentParser) -> None:
    """The reference daccord option surface (SURVEY Appendix B)."""
    d = DaccordConfig()
    p.add_argument("-w", type=int, default=d.w, help="window size")
    p.add_argument("-a", type=int, default=d.a, help="window advance")
    p.add_argument("-k", type=int, default=d.k, help="k-mer size")
    p.add_argument("-t", type=int, default=d.t, help="worker threads")
    p.add_argument("-d", "--maxalign", type=int, default=d.d,
                   dest="d", help="max pile depth per window")
    p.add_argument("-m", type=int, default=d.m, help="min window coverage")
    p.add_argument("-e", type=float, default=d.e, help="max window error")
    p.add_argument("-l", type=int, default=d.l, help="min fragment length")
    p.add_argument("-I", type=_pair, default=None, metavar="FROM,TO",
                   help="read-id interval")
    p.add_argument("-J", type=_pair, default=(0, 1), metavar="I,N",
                   help="process part i of n")
    p.add_argument("-E", type=str, default=None, help="error profile file")
    p.add_argument("-f", action="store_true", help="full-sequence output")
    p.add_argument("-V", action="count", default=0, help="verbosity")


def config_from_args(args: argparse.Namespace) -> DaccordConfig:
    return DaccordConfig(w=args.w, a=args.a, k=args.k, t=args.t, d=args.d,
                         m=args.m, e=args.e, l=args.l, I=args.I, J=tuple(args.J),
                         E=args.E, f=args.f, V=args.V)
