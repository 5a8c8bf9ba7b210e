"""Executable warm-up: compile AND execute every consensus-step variant
the streaming runner can dispatch, so timed runs are steady-state.

On the tunneled axon chip each executable's FIRST execution pays a
multi-second device-side load (round-3 note in scripts/run_configs.py);
a run that meets a not-yet-loaded variant mid-stream stalls the whole
pipeline.  The runner's variant space is:

- one dense executable per (depth bucket D1 in DEPTH_MENU capped by -d,
  operand form): shared plq/pbw tables (full buckets) and per-window
  [B, W'] / [B, NB, NB] operands (mixed remainder chunks and
  positional-eprof table-group mixes, ALGORITHM §7 v2);
- one sparse k2 executable per depth bucket (retry queues are
  depth-bucketed since round 3) at the retry batch size.

A 300-read warm prefix does NOT cover this space: shallow depth buckets
come from genome-edge reads (~0.4% of a 1 Mb config) and the per-window
forms only fire on end-of-run remainders — config-5 measured 328 s of
mid-run compile/load inside a "warmed" pass before this helper existed
(round-4 diagnostic, RESULTS.md five-config notes).
"""

from __future__ import annotations

import numpy as np

from daccord_tpu.utils.config import DaccordConfig


def warm_step_variants(cfg: DaccordConfig, profile=None, k2_bs: int = 64,
                       per_window: bool = True, k2: bool = True,
                       log=None) -> int:
    """Compile + execute every runner-dispatchable step variant; returns
    the number of variants warmed.  Uses a synthetic profile when none is
    given (compiled executables are shape/dtype-keyed, not value-keyed,
    so any profile warms the real run's executables)."""
    import jax

    from daccord_tpu.oracle.consensus import build_pbw, build_plq
    from daccord_tpu.oracle.eprof import ErrorProfile
    from daccord_tpu.ops.consensus_step import consensus_step
    from daccord_tpu.ops.sparse_k2 import consensus_step_sparse
    from daccord_tpu.pipeline.batcher import DEPTH_MENU, e_q6_of, pack_windows

    if profile is None:
        profile = ErrorProfile(0.03, 0.08, 0.04)
    plq = build_plq(profile, cfg)
    pbw = build_pbw(profile, cfg)
    rng = np.random.default_rng(0)
    B = cfg.batch_windows
    ps1 = np.ascontiguousarray(plq[:cfg.wprime, 0], np.int32)
    pk1 = np.ascontiguousarray(plq[:cfg.wprime, cfg.w - cfg.k], np.int32)
    pk2 = np.ascontiguousarray(plq[:cfg.wprime, cfg.w - cfg.k2], np.int32)
    psB = np.tile(ps1, (B, 1))
    pkB = np.tile(pk1, (B, 1))
    pwB = None if pbw is None else np.tile(pbw, (B, 1, 1))
    ps2B = np.tile(ps1, (k2_bs, 1))
    pk2B = np.tile(pk2, (k2_bs, 1))
    pw2B = None if pbw is None else np.tile(pbw, (k2_bs, 1, 1))
    kw = dict(w=cfg.w, path_delta=cfg.path_delta, e_q6=e_q6_of(cfg),
              pos_bin=cfg.pos_bin)
    # Dispatch EVERY variant first, block ONCE at the end: each dispatch
    # compiles synchronously on host (persistent-cache hits are cheap) but
    # the expensive part on the tunneled chip is the per-executable FIRST
    # EXECUTION device load (~10 s each); queuing all executions before any
    # block lets the runtime overlap those loads instead of serializing
    # ~10 s x ~#variants (round-4 driver capture: 743 s of strictly-serial
    # warmup; VERDICT r4 cold-start item).
    outs = []
    n = 0
    for d1 in DEPTH_MENU:
        if d1 > cfg.d + 1:
            continue
        piles = [[rng.integers(0, 4, size=cfg.w).astype(np.uint8)
                  for _ in range(d1)] for _ in range(2)]
        S, sl, ns = pack_windows(piles, cfg, B, d1)
        outs.append(consensus_step(S, sl, ns, ps1, pk1, pbw, k=cfg.k, **kw))
        n += 1
        if per_window:
            outs.append(consensus_step(S, sl, ns, psB, pkB, pwB,
                                       k=cfg.k, **kw))
            n += 1
        if k2 and cfg.w >= cfg.k2:
            S2, sl2, ns2 = pack_windows(piles, cfg, k2_bs, d1)
            outs.append(consensus_step_sparse(
                S2, sl2, ns2, ps1, pk2, pbw, k=cfg.k2, **kw))
            n += 1
            if per_window:   # ntab > 1 runs k2 with per-window operands
                outs.append(consensus_step_sparse(
                    S2, sl2, ns2, ps2B, pk2B, pw2B, k=cfg.k2, **kw))
                n += 1
        if log:
            log(f"warm: D1={d1} dispatched ({n} variants)")
    jax.block_until_ready(outs)
    if log:
        log(f"warm: all {n} variants executed")
    return n
