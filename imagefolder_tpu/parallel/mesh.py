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

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "replicate", "fsdp_shard_params",
           "process_index", "is_primary", "init_distributed",
           "sync_global_devices", "process_allgather"]


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     local_device_ids=None) -> bool:
    """Multi-host bootstrap — the reference's torchrun/SLURM env init
    (``utils/distributed.py:20-57``, ``dist.py:20-49``) collapses to one
    ``jax.distributed.initialize`` call.

    Explicit args win; otherwise env vars (``JAX_COORDINATOR_ADDRESS`` /
    ``COORDINATOR_ADDRESS`` + ``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID``, or a
    TPU-pod metadata environment where ``initialize()`` autodetects). Returns
    True when a multi-process runtime was initialized, False for the
    single-process no-op (mirrors the reference's RANK-unset degradation,
    ``dist.py:25-29``).
    """
    env = os.environ
    coordinator = (coordinator or env.get("JAX_COORDINATOR_ADDRESS")
                   or env.get("COORDINATOR_ADDRESS"))
    if num_processes is None and env.get("JAX_NUM_PROCESSES"):
        num_processes = int(env["JAX_NUM_PROCESSES"])
    if process_id is None and env.get("JAX_PROCESS_ID"):
        process_id = int(env["JAX_PROCESS_ID"])
    if coordinator is None:
        # Multi-host is explicit-opt-in only. No bare autodetect: tunneled
        # single-chip environments (axon) export TPU pod variables like
        # TPU_WORKER_HOSTNAMES, and jax.distributed.initialize() without a
        # coordinator raises there instead of detecting a pod.
        return False
    kwargs = {"coordinator_address": coordinator}
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)
    return jax.process_count() > 1


def add_distributed_args(ap):
    """Attach the multi-host flags shared by every CLI (the reference's
    torchrun env contract: RANK/WORLD_SIZE/MASTER_ADDR)."""
    ap.add_argument("--coordinator", default=None,
                    help="host:port of process 0 for jax.distributed "
                         "multi-host init (or set JAX_COORDINATOR_ADDRESS)")
    ap.add_argument("--num_processes", type=int, default=None)
    ap.add_argument("--process_id", type=int, default=None)
    return ap


def init_from_args(args) -> bool:
    return init_distributed(getattr(args, "coordinator", None),
                            getattr(args, "num_processes", None),
                            getattr(args, "process_id", None))


def sync_global_devices(name: str = "barrier"):
    """Cross-host barrier (reference ``dist.barrier()`` ckpt sync sites)."""
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def process_allgather(tree, tiled: bool = False):
    """Gather per-host arrays to every host (reference's eval-sample
    ``dist.allgather``, ``inference.py:111``/``xqgan_train.py:529``)."""
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(tree, tiled=tiled)


def make_mesh(axes: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None,
              devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    if shape is None:
        shape = [len(devices)] + [1] * (len(axes) - 1)
    return Mesh(devices.reshape(shape), axes)


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a host batch sharded along its leading dim on the mesh.

    Single-process: a sharded device_put. Multi-process: each host holds its
    own loader shard (``make_dataloader(shard_index=process_index)``), and the
    per-host arrays assemble into one global array over the mesh — the
    global batch = process_count * local batch (reference DistributedSampler
    semantics, ``xqgan_train.py:232-247``)."""
    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), batch)
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


# Megatron-style tensor-parallel rules for the transformer Dense stacks
# (ViT / VAR / RAR all use these layer names): fused-qkv and fc1 kernels are
# column-sharded (output dim), proj/fc2 row-sharded (input dim), so the
# pairwise matmuls keep activations head/ffn-sharded and XLA inserts one
# psum per row-sharded layer. Anything else stays replicated.
_TP_COLUMN = {"mat_qkv", "qkv", "fc1", "q", "k", "v"}
_TP_ROW = {"proj", "fc2", "proj_out"}


def tp_shard_params(params, mesh: Mesh, axis: str = "model"):
    """Tensor-parallel NamedSharding tree for pjit in_shardings. Composes
    with a ('data', 'model') mesh: batch on 'data', these rules on 'model'.
    The reference has no TP (SURVEY §2e: DP only); this is TPU-first
    headroom for wider models."""
    n = mesh.shape[axis]

    def rule(path, x):
        names = [str(getattr(k, "key", k)) for k in path]
        leaf = names[-1] if names else ""
        parent = names[-2] if len(names) > 1 else ""
        if leaf == "kernel" and x.ndim == 2:
            if parent in _TP_COLUMN and x.shape[1] % n == 0:
                return NamedSharding(mesh, P(None, axis))
            if parent in _TP_ROW and x.shape[0] % n == 0:
                return NamedSharding(mesh, P(axis, None))
        if leaf == "bias" and parent in _TP_COLUMN and x.ndim == 1 \
                and x.shape[0] % n == 0:
            return NamedSharding(mesh, P(axis))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def process_index() -> int:
    return jax.process_index()


def is_primary() -> bool:
    return jax.process_index() == 0
