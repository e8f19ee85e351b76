"""Device mesh + sharding rules (replaces the reference's three NCCL/DDP
shims — ``dist.py``, ``tokenizer/tokenizer_image/dist.py``,
``utils/distributed.py`` — with one jax.sharding layer).

The workload is data-parallel with optional FSDP for the larger VAR models
(SURVEY §2e: the reference implements exactly DDP). Under pjit:
* the batch is sharded on the 'data' axis; params replicated (or
  FSDP-sharded on 'fsdp');
* gradient psums, codebook-hit reductions (reference's async NCCL allreduce,
  quant.py:104), grad-carrying feature gathers (cliploss.py:48) and metric
  reductions all fall out of global-batch semantics — XLA inserts the ICI
  collectives from the shardings.

Multi-host init is ``jax.distributed.initialize()`` (reference: torchrun env
bootstrap, dist.py:20-49).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "replicate", "fsdp_shard_params",
           "process_index", "is_primary"]


def make_mesh(axes: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None,
              devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    if shape is None:
        shape = [len(devices)] + [1] * (len(axes) - 1)
    return Mesh(devices.reshape(shape), axes)


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a host batch sharded along its leading dim on the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def fsdp_shard_params(params, mesh: Mesh, axis: str = "fsdp",
                      min_size: int = 2 ** 18):
    """ZeRO-3-style parameter sharding: each large param is split along its
    largest mesh-divisible dimension over the fsdp axis; small params stay
    replicated. Returns a tree of NamedShardings for pjit in_shardings."""
    n = mesh.shape[axis]

    def rule(x):
        if x.ndim == 0 or x.size < min_size:
            return NamedSharding(mesh, P())
        dims = sorted(range(x.ndim), key=lambda d: -x.shape[d])
        for d in dims:
            if x.shape[d] % n == 0:
                spec = [None] * x.ndim
                spec[d] = axis
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, params)


def process_index() -> int:
    return jax.process_index()


def is_primary() -> bool:
    return jax.process_index() == 0
