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

import re
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
    if jax.distributed.is_initialized():
        return  # idempotent: second trainer in the same process
    # manual bring-up (CPU clusters / tests): when the explicit triple is
    # set, pass it through — jax's no-arg initialize only auto-detects
    # managed clusters (TPU pods, SLURM, OMPI)
    addr = (os.environ.get("COORDINATOR_ADDRESS")
            or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    nproc = os.environ.get("SDXL_NUM_PROCESSES")
    pid = os.environ.get("SDXL_PROCESS_ID")
    if addr and nproc is not None and pid is not None:
        jax.distributed.initialize(coordinator_address=addr,
                                   num_processes=int(nproc),
                                   process_id=int(pid))
    else:
        jax.distributed.initialize()


def barrier(name: str, timeout_ms: int = 1_800_000) -> None:
    """Coordination-service barrier across processes (no-op single-process).

    Absorbs cross-host skew before the first compiled collective: per-host
    work (precompute, cold compiles) can skew hosts by minutes, while the
    collective backends' connect timeouts are ~30 s — a host arriving late
    at the first all-gather turns into an opaque DEADLINE_EXCEEDED on the
    early hosts.  The KV-store barrier has a long, explicit timeout and
    names the laggard instead."""
    if jax.process_count() <= 1:
        return
    from jax._src import distributed as _dist
    client = getattr(_dist.global_state, "client", None)
    if client is not None:
        # suffix a sequence number: barrier ids are single-use in the
        # coordination service, and callers (e.g. train()) may run twice in
        # one process.  Deterministic call order keeps the counters in step
        # across processes.
        global _BARRIER_SEQ
        _BARRIER_SEQ += 1
        client.wait_at_barrier(f"{name}-{_BARRIER_SEQ}",
                               timeout_in_ms=timeout_ms)


_BARRIER_SEQ = 0


def create_mesh(mesh_shape: Optional[Sequence[int]] = None,
                axis_names: Sequence[str] = AXIS_NAMES,
                devices=None) -> Mesh:
    """Build the (data, fsdp, tensor) mesh.

    Default: all devices on the ``data`` axis — the direct TPU analogue of the
    reference's DDP world (`every chip a data-parallel worker`).
    """
    if tuple(axis_names) != AXIS_NAMES:
        # every sharding rule (batch_sharding, TP_RULES, spec_for_param)
        # names these axes literally; a renamed mesh would fail later with
        # an opaque KeyError deep inside trainer construction
        raise ValueError(
            f"mesh axis names must be {list(AXIS_NAMES)} (fixed semantic "
            f"roles: data-parallel, ZeRO, megatron), got {list(axis_names)}")
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


def _fsdp_dim_for(shape, fsdp_size: int, exclude: Optional[int] = None,
                  min_size: int = FSDP_MIN_SIZE) -> Optional[int]:
    """Largest divisible dim of a *large, >=2-D* param to ZeRO-shard over
    the fsdp axis, or None to replicate (standard ZeRO practice: shard the
    matmul/conv weights, replicate the 1-D vectors).  ``exclude`` skips a
    dim already taken by tensor parallelism."""
    if len(shape) < 2 or int(np.prod(shape)) < min_size:
        return None
    candidates = [(d, i) for i, d in enumerate(shape)
                  if i != exclude and d % fsdp_size == 0 and d >= fsdp_size]
    if not candidates:
        return None
    _, idx = max(candidates)
    return idx


def _fsdp_spec_for(path_leaf_shape, fsdp_size: int,
                   min_size: int = FSDP_MIN_SIZE) -> P:
    """Pure-ZeRO spec for one param (no TP dim in play)."""
    idx = _fsdp_dim_for(path_leaf_shape, fsdp_size, min_size=min_size)
    if idx is None:
        return P()
    spec = [None] * len(path_leaf_shape)
    spec[idx] = FSDP_AXIS
    return P(*spec)


# --------------------------------------------------------------------------
# Tensor parallelism (megatron-style column/row over the ``tensor`` axis)
#
# The transformer blocks carry ~70% of SDXL's params and FLOPs; classic TP
# splits each attention/FF pair as column-parallel (output-dim sharded:
# qkv, GEGLU proj) followed by row-parallel (input-dim sharded: to_out,
# ff net_2), so activations stay sharded across the pair and XLA inserts
# one reduce at the row layer (the megatron f/g collectives, compiler-
# derived instead of hand-written — scaling-book recipe).
# --------------------------------------------------------------------------

# Known cost: the GEGLU proj's fused [value|gate] output is sharded
# contiguously, so the jnp.split midpoint forces GSPMD to realign both
# halves before the elementwise gate (one collective-permute per FF).
# True megatron handling shards value and gate independently, which needs
# either interleaved kernel columns or a two-kernel GEGLU — both break the
# diffusers checkpoint layout; revisit if TP profiling shows the permute
# dominating.
TP_RULES = (
    (re.compile(r"attn\d/to_[qkv]/kernel$"), 1),      # column: out dim
    (re.compile(r"attn\d/to_out_0/kernel$"), 0),      # row: in dim
    (re.compile(r"ff/net_0/proj/kernel$"), 1),        # column (GEGLU)
    (re.compile(r"ff/net_0/proj/bias$"), 0),          # bias of column layer
    (re.compile(r"ff/net_2/kernel$"), 0),             # row: in dim
)


def _tp_dim_for(path: str, shape, tensor_size: int) -> Optional[int]:
    if tensor_size <= 1:
        return None
    for pat, dim in TP_RULES:
        if pat.search(path) and len(shape) > dim \
                and shape[dim] % tensor_size == 0:
            return dim
    return None


def spec_for_param(path: str, shape, mesh: Mesh,
                   shard_params: bool = False) -> P:
    """Combined TP + ZeRO spec for one param: the tensor axis takes its
    megatron dim (if the path matches a transformer rule), then fsdp takes
    the largest remaining divisible dim of large >=2-D tensors."""
    spec = [None] * len(shape)
    tp_dim = _tp_dim_for(path, shape, mesh.shape[TENSOR_AXIS])
    if tp_dim is not None:
        spec[tp_dim] = TENSOR_AXIS
    fsdp_size = mesh.shape[FSDP_AXIS]
    if shard_params and fsdp_size > 1:
        idx = _fsdp_dim_for(shape, fsdp_size, exclude=tp_dim)
        if idx is not None:
            spec[idx] = FSDP_AXIS
    return P(*spec)


def param_shardings(mesh: Mesh, params, shard_params: bool = False):
    """Pytree of NamedShardings for params.

    ``shard_params=False`` replicates params over data/fsdp (reference-DDP
    equivalent) but still applies the TP rules when the mesh has a
    non-trivial ``tensor`` axis.  ``shard_params=True`` adds ZeRO sharding
    of each large tensor's largest free dim over ``fsdp``; XLA inserts
    all-gathers at use sites over ICI.
    """
    tensor_size = mesh.shape[TENSOR_AXIS]
    fsdp_size = mesh.shape[FSDP_AXIS]
    if (not shard_params or fsdp_size == 1) and tensor_size == 1:
        return jax.tree.map(lambda _: replicated(mesh), params)
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    shardings = []
    for path, leaf in flat:
        p = "/".join(str(getattr(k, "key", k)) for k in path)
        shardings.append(NamedSharding(
            mesh, spec_for_param(p, leaf.shape, mesh,
                                 shard_params=shard_params)))
    return jax.tree_util.tree_unflatten(treedef, shardings)


def is_main_process() -> bool:
    """Rank-0 gate (reference ``is_main_process``, ``distributed.py:165-168``)."""
    return jax.process_index() == 0


def get_world_size() -> int:
    return jax.device_count()
