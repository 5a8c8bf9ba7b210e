"""Device mesh + sharded consensus step (SURVEY §2.4 build equivalents).

Parallelism mapping for this workload (SURVEY §2.4):
- DP: the window-batch axis B is sharded across chips (`data` axis) — the
  TPU-native form of the reference's thread-pool-over-reads + file-interval
  scale-out.
- SP/CP: the window axis IS the sequence axis; sharding B over chips is
  simultaneously the sequence-parallel decomposition (windows are independent
  until host-side stitching, which needs only (w-a)-overlap halos).
- TP: the k-mer universe axis (4^k) can be sharded on a `model` axis for
  large-k DBG tensors; XLA/GSPMD inserts the collectives.
- PP: host-side pipelining (IO/realign/stack vs device compute), not device PP.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from daccord_tpu.ops.consensus_step import consensus_step
from daccord_tpu.utils.config import DaccordConfig


def make_mesh(n_devices: Optional[int] = None, model: int = 1) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = np.array(devs[:n]).reshape(n // model, model)
    return Mesh(devs, ("data", "model"))


def sharded_sparse_consensus(mesh: Mesh, cfg: DaccordConfig,
                             merge_collective: bool = False):
    """Sharded adaptive-k2 retry step (SURVEY §7.3 item 6; VERDICT r2 item 6).

    consensus_step_sparse is batch-pure (every tensor keeps the window axis
    leading), so the retry pass shards over the ``data`` axis exactly like
    the k=8 step — pods no longer serialize retries on one device.  Meshes
    with a ``model`` axis replicate the k2 step across it (the sparse tables
    have no 4^k axis to split).  merge_collective mirrors sharded_consensus:
    results are all-gathered on device so every host reads one replicated
    tensor.
    """
    from jax.experimental.shard_map import shard_map

    from daccord_tpu.ops.sparse_k2 import consensus_step_sparse
    from daccord_tpu.pipeline.batcher import e_q6_of

    def fn(S, slen, nstr, plq_src, plq_snk, pbw=None):
        out = consensus_step_sparse(
            S, slen, nstr, plq_src, plq_snk, pbw, k=cfg.k2, w=cfg.w,
            path_delta=cfg.path_delta, e_q6=e_q6_of(cfg),
            pos_bin=cfg.pos_bin)
        outs = tuple(out)
        if merge_collective:
            outs = tuple(jax.lax.all_gather(o, "data", axis=0, tiled=True)
                         for o in outs)
        return outs

    jits: dict = {}

    def call(S, slen, nstr, plq_src, plq_snk, pbw=None):
        key = (plq_src.ndim, None if pbw is None else pbw.ndim)
        if key not in jits:
            p_spec = P("data", None) if plq_src.ndim == 2 else P()
            in_specs = [P("data", None, None), P("data", None), P("data"),
                        p_spec, p_spec]
            if pbw is not None:
                in_specs.append(P("data", None, None) if pbw.ndim == 3
                                else P())
            out_specs = ((P(),) * 4 if merge_collective
                         else (P("data"), P("data"), P("data", None),
                               P("data")))
            body = fn if pbw is not None else functools.partial(fn, pbw=None)
            jits[key] = jax.jit(shard_map(
                body, mesh=mesh, in_specs=tuple(in_specs),
                out_specs=out_specs, check_rep=False))
        if pbw is None:
            return jits[key](S, slen, nstr, plq_src, plq_snk)
        return jits[key](S, slen, nstr, plq_src, plq_snk, pbw)

    return call


def sharded_consensus(mesh: Mesh, cfg: DaccordConfig, k: int,
                      merge_collective: bool = False):
    """Jitted consensus step with the batch axis sharded over `data` and the
    (k+1)-mer edge-count / DBG tensors allowed to split over `model`.

    The returned callable takes (S, slen, nstr, plq_src, plq_snk, pbw);
    pass pbw=None when cfg.pos_weight is off.

    merge_collective=True additionally merges the per-shard window results
    ON DEVICE before they reach the host — ``jax.lax.all_gather`` over the
    ``data`` axis in the shard_map path, replicated out-shardings (GSPMD
    all-gathers) in the TP path — so every host emits FASTA from one
    replicated tensor instead of fetching remote shards over DCN (the
    north-star "corrected-read fragments merged with jax.lax collectives
    before FASTA emission"; BASELINE.json, SURVEY §2.4 comm row).
    """
    shard_b3 = NamedSharding(mesh, P("data", None, None))
    shard_b2 = NamedSharding(mesh, P("data", None))
    shard_b1 = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    out_shardings = ((repl,) * 4 if merge_collective
                     else (shard_b1, shard_b1, shard_b2, shard_b1))
    # TP (SURVEY §2.4): with a model axis, the (k+1)-mer edge-table axis is
    # pinned to it; GSPMD partitions the DBG tensors and inserts the
    # collectives (asserted by tests/test_parallel.py)
    tp = (NamedSharding(mesh, P("data", None, "model"))
          if mesh.shape.get("model", 1) > 1 else None)

    from daccord_tpu.pipeline.batcher import e_q6_of

    def fn(S, slen, nstr, plq_src, plq_snk, pbw, pbw_band=None):
        return tuple(consensus_step(S, slen, nstr, plq_src, plq_snk, pbw,
                                    k=k, w=cfg.w, path_delta=cfg.path_delta,
                                    e_q6=e_q6_of(cfg), pos_bin=cfg.pos_bin,
                                    pbw_band=pbw_band, tp_sharding=tp))

    # plq/pbw tables arrive shared (1D/2D, replicated) or per-window
    # (2D/3D, data-sharded; positional-eprof groups mixed in a batch)
    jits: dict = {}
    # Data-parallel-only meshes (model == 1, the production pod shape) run
    # the step under shard_map: each device executes the whole step — cyc
    # Pallas kernel included — on its LOCAL batch shard.  Under plain GSPMD
    # a pallas_call is an opaque op (replicated/gathered), so the kernel
    # path would silently lose the data sharding.  TP meshes (model > 1)
    # keep the GSPMD path: the tp constraint partitions the (k+1)-mer axis
    # through the scan DP, which shard_map's local view cannot express.
    use_shard_map = mesh.shape.get("model", 1) == 1

    def _band_of(pbw):
        if pbw is None:
            return -1
        pb = np.asarray(pbw).reshape(-1, pbw.shape[-2], pbw.shape[-1])
        ii, jj = np.nonzero(pb.any(axis=0))
        return int(np.abs(ii - jj).max()) if len(ii) else 0

    def call(S, slen, nstr, plq_src, plq_snk, pbw=None):
        key = (plq_src.ndim, None if pbw is None else pbw.ndim)
        if key not in jits:
            if use_shard_map:
                from jax.experimental.shard_map import shard_map
                p_spec = P("data", None) if plq_src.ndim == 2 else P()
                in_specs = [P("data", None, None), P("data", None),
                            P("data"), p_spec, p_spec]
                if pbw is not None:
                    in_specs.append(P("data", None, None)
                                    if pbw.ndim == 3 else P())
                out_specs = (P("data"), P("data"), P("data", None),
                             P("data"))
                band = _band_of(pbw)
                body = (functools.partial(fn, pbw=None, pbw_band=band)
                        if pbw is None
                        else functools.partial(fn, pbw_band=band))
                if merge_collective:
                    inner = body

                    def body(*a, _inner=inner):
                        outs = _inner(*a)
                        return tuple(
                            jax.lax.all_gather(o, "data", axis=0, tiled=True)
                            for o in outs)
                    out_specs = (P(),) * 4
                jits[key] = jax.jit(shard_map(
                    body, mesh=mesh, in_specs=tuple(in_specs),
                    out_specs=out_specs, check_rep=False))
            else:
                sh_p = shard_b2 if plq_src.ndim == 2 else repl
                in_sh = [shard_b3, shard_b2, shard_b1, sh_p, sh_p]
                if pbw is None:
                    jits[key] = jax.jit(functools.partial(fn, pbw=None),
                                        in_shardings=tuple(in_sh),
                                        out_shardings=out_shardings)
                else:
                    in_sh.append(NamedSharding(mesh, P("data", None, None))
                                 if pbw.ndim == 3 else repl)
                    jits[key] = jax.jit(fn, in_shardings=tuple(in_sh),
                                        out_shardings=out_shardings)
        if pbw is None:
            return jits[key](S, slen, nstr, plq_src, plq_snk)
        return jits[key](S, slen, nstr, plq_src, plq_snk, pbw)

    return call
