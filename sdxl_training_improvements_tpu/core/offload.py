"""Host-memory offload utilities.

TPU analogue of the reference ``LayerOffloader`` (``src/core/memory/
layer_offload.py`` — GPU<->CPU parameter shuttling on a transfer stream;
never actually wired into the reference's training path).  On TPU the same
memory-pressure escape hatch is expressed as data placement: move pytrees
(typically optimizer state between steps, or frozen encoder params between
precompute and training) to host RAM and back.

Uses pinned-host memory kinds when the backend supports them (async DMA
back to HBM), falling back to the CPU backend's devices.
"""
from __future__ import annotations

from typing import Any

import jax


def _host_sharding(x) -> Any:
    """Pinned-host variant of x's current sharding, if supported."""
    try:
        return x.sharding.with_memory_kind("pinned_host")
    except Exception:
        return None


def offload_to_host(tree):
    """Move every array leaf to host memory (pinned when supported)."""
    def move(x):
        if not hasattr(x, "sharding"):
            return x
        hs = _host_sharding(x)
        if hs is not None:
            try:
                return jax.device_put(x, hs)
            except Exception:
                pass
        return jax.device_get(x)  # plain numpy on host

    return jax.tree.map(move, tree)


def fetch_to_device(tree, sharding=None):
    """Bring a (possibly host-offloaded) pytree back to device HBM."""
    def move(x):
        if sharding is not None:
            return jax.device_put(x, sharding)
        if hasattr(x, "sharding"):
            try:
                return jax.device_put(
                    x, x.sharding.with_memory_kind("device"))
            except Exception:
                pass
        return jax.device_put(x)

    return jax.tree.map(move, tree)


def tree_bytes(tree) -> int:
    """Total bytes across array leaves (sizing decision helper)."""
    total = 0
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "nbytes"):
            total += leaf.nbytes
        elif hasattr(leaf, "size") and hasattr(leaf, "dtype"):
            total += leaf.size * leaf.dtype.itemsize
    return total
