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


def sharded_consensus(mesh: Mesh, cfg: DaccordConfig, k: int):
    """Jitted consensus step with the batch axis sharded over `data` and the
    (k+1)-mer edge-count / DBG tensors allowed to split over `model`."""
    in_shardings = (
        NamedSharding(mesh, P("data", None, None)),   # S
        NamedSharding(mesh, P("data", None)),         # slen
        NamedSharding(mesh, P("data")),               # nstr
        NamedSharding(mesh, P()),                     # plq_src
        NamedSharding(mesh, P()),                     # plq_snk
    )
    out_shardings = (
        NamedSharding(mesh, P("data")),
        NamedSharding(mesh, P("data")),
        NamedSharding(mesh, P("data", None)),
        NamedSharding(mesh, P("data")),
    )

    from daccord_tpu.pipeline.batcher import e_q6_of

    def fn(S, slen, nstr, plq_src, plq_snk):
        return tuple(consensus_step(S, slen, nstr, plq_src, plq_snk,
                                    k=k, w=cfg.w, path_delta=cfg.path_delta,
                                    e_q6=e_q6_of(cfg)))

    return jax.jit(fn, in_shardings=in_shardings, out_shardings=out_shardings)
