"""Host->device input pipeline: per-bucket batching with double-buffered
device transfer.

TPU replacement for the reference's torch DataLoader + pinned-memory
streams (``src/main.py:66-70``, ``src/data/utils/tensor_utils.py``): batches
are assembled on host (numpy), then ``jax.device_put`` with the mesh batch
sharding one step ahead of consumption so the transfer overlaps the previous
train step (the reference's dual-stream prefetch, TPU-style).
"""
from __future__ import annotations

import collections
import threading
import queue as queue_mod
from typing import Dict, Iterator, Optional

import jax
import numpy as np

from sdxl_training_improvements_tpu.parallel import mesh as M


def batches_for_epoch(dataset, batch_size: int, epoch: int = 0, seed: int = 0,
                      num_shards: int = 1, shard: int = 0,
                      proportion_empty_prompts: float = 0.0
                      ) -> Iterator[Dict[str, np.ndarray]]:
    """Host-side batch iterator (bucket-homogeneous, reference contract)."""
    sampler = dataset.make_sampler(batch_size, seed=seed,
                                   num_shards=num_shards, shard=shard)
    sampler.set_epoch(epoch)
    rng = np.random.default_rng(seed * 100003 + epoch)
    dropped = 0
    for indices in sampler:
        batch = dataset.get_batch(
            indices, proportion_empty_prompts=proportion_empty_prompts,
            rng=rng)
        if batch is None or batch["vae_latents"].shape[0] < batch_size:
            # drop ragged/invalid batches (uniform shapes for XLA).
            # NOTE (multi-host): drops depend on cache contents; with
            # num_shards > 1 the cache must be complete (run precompute
            # first) or shared, else shards can diverge in step count and
            # hang in collectives.
            dropped += 1
            continue
        yield batch
    if dropped:
        import logging
        logging.getLogger(__name__).warning(
            "batches_for_epoch: dropped %d incomplete batches (epoch %d)%s",
            dropped, epoch,
            " — DANGER: unequal drops across hosts desynchronize collectives"
            if num_shards > 1 else "")


def prefetch_to_device(batch_iter, mesh=None, prefetch: int = 2,
                       background: bool = True):
    """Double-buffered transfer: yields device-resident batches.

    With ``background=True`` host batch assembly runs in a worker thread
    (IO + np.stack overlap compute), and up to ``prefetch`` device_puts are
    in flight ahead of the consumer.
    """
    put = (lambda b: jax.device_put(b, M.batch_sharding(mesh))) if mesh is not None \
        else jax.device_put

    if not background:
        buf = collections.deque()
        for batch in batch_iter:
            buf.append(put(batch))
            if len(buf) > prefetch:
                yield buf.popleft()
        while buf:
            yield buf.popleft()
        return

    q: queue_mod.Queue = queue_mod.Queue(maxsize=max(prefetch, 1))
    _END = object()

    def worker():
        try:
            for batch in batch_iter:
                q.put(put(batch))
            q.put(_END)
        except BaseException as e:  # propagate into the consumer
            q.put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        if isinstance(item, BaseException):
            raise item
        yield item
