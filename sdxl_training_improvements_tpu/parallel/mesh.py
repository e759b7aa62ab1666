"""Device mesh + sharding rules (TPU-native replacement for the reference's
NCCL DDP stack, ``src/core/distributed.py``).

The reference's parallelism is DistributedDataParallel over NCCL with env://
rendezvous and randomized ports (``distributed.py:88-131``).  On TPU none of
that machinery exists: multi-host bring-up is ``jax.distributed.initialize``
(the TPU runtime owns rendezvous), and data parallelism is a sharding
annotation — the batch is sharded over the ``data`` mesh axis, params are
replicated (or sharded over ``fsdp`` for ZeRO-style memory scaling), and the
compiler inserts the gradient all-reduce over ICI inside the jitted step.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"
TENSOR_AXIS = "tensor"
AXIS_NAMES = (DATA_AXIS, FSDP_AXIS, TENSOR_AXIS)


def initialize_multihost() -> None:
    """Multi-host (DCN) process bring-up. No-op on single host.

    Replaces the reference's ``setup_distributed`` port-retry dance
    (``distributed.py:88-131``) — the TPU runtime handles rendezvous.

    Must run BEFORE any backend-initializing jax call (``process_count``
    included), so cluster membership is detected from the environment, not
    probed through jax.  Failure on a detected cluster is fatal — silently
    degrading to per-host single-process training would diverge models.
    """
    import os
    cluster_env = ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
                   "MEGASCALE_COORDINATOR_ADDRESS")
    if not any(os.environ.get(v) for v in cluster_env):
        return  # no cluster coordinator configured -> single-process run
    jax.distributed.initialize()


def create_mesh(mesh_shape: Optional[Sequence[int]] = None,
                axis_names: Sequence[str] = AXIS_NAMES,
                devices=None) -> Mesh:
    """Build the (data, fsdp, tensor) mesh.

    Default: all devices on the ``data`` axis — the direct TPU analogue of the
    reference's DDP world (`every chip a data-parallel worker`).
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if mesh_shape is None:
        mesh_shape = [n] + [1] * (len(axis_names) - 1)
    if int(np.prod(mesh_shape)) != n:
        raise ValueError(f"mesh_shape {mesh_shape} does not cover {n} devices")
    dev_array = np.asarray(devices).reshape(mesh_shape)
    return Mesh(dev_array, tuple(axis_names))


def mesh_from_config(config, devices=None) -> Mesh:
    return create_mesh(config.tpu.mesh_shape, tuple(config.tpu.axis_names), devices)


# --------------------------------------------------------------------------
# Sharding rules
# --------------------------------------------------------------------------

def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim sharded over data(+fsdp) axes; rest replicated."""
    return NamedSharding(mesh, P((DATA_AXIS, FSDP_AXIS)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Params smaller than this stay replicated: sharding biases/norm scales
# saves ~nothing but forces the SPMD partitioner into "involuntary full
# rematerialization" when their grads (reduced from batch-sharded
# activations) must be rescattered — pure ICI/HBM waste (round-1 verdict,
# MULTICHIP_r01 tail).  2^16 elements ~= the largest SDXL bias (10240) x6.
FSDP_MIN_SIZE = 1 << 16


def _fsdp_spec_for(path_leaf_shape, fsdp_size: int,
                   min_size: int = FSDP_MIN_SIZE) -> P:
    """Shard the largest divisible dim of a *large, >=2-D* param over the
    fsdp axis; everything else replicates (standard ZeRO practice: shard
    the matmul/conv weights, replicate the 1-D vectors)."""
    shape = path_leaf_shape
    if len(shape) < 2 or int(np.prod(shape)) < min_size:
        return P()
    # choose the largest axis divisible by the fsdp size
    candidates = [(d, i) for i, d in enumerate(shape) if d % fsdp_size == 0 and d >= fsdp_size]
    if not candidates:
        return P()
    _, idx = max(candidates)
    spec = [None] * len(shape)
    spec[idx] = FSDP_AXIS
    return P(*spec)


def param_shardings(mesh: Mesh, params, shard_params: bool = False):
    """Pytree of NamedShardings for params.

    ``shard_params=False`` replicates (reference-DDP equivalent).
    ``shard_params=True`` ZeRO-shards each tensor's largest divisible dim over
    the ``fsdp`` axis; XLA inserts all-gathers at use sites over ICI.
    """
    fsdp_size = mesh.shape[FSDP_AXIS]
    if not shard_params or fsdp_size == 1:
        return jax.tree.map(lambda _: replicated(mesh), params)
    return jax.tree.map(
        lambda p: NamedSharding(mesh, _fsdp_spec_for(p.shape, fsdp_size)), params)


def is_main_process() -> bool:
    """Rank-0 gate (reference ``is_main_process``, ``distributed.py:165-168``)."""
    return jax.process_index() == 0


def get_world_size() -> int:
    return jax.device_count()
