"""Bounded-memory attention in pure XLA: ``lax.map``/``lax.scan`` over
query chunks, with a custom VJP that recomputes probabilities per chunk.

Role in the framework: the memory-efficient attention path for environments
where the Pallas flash kernel (``ops/flash_attention.py``) cannot run at
native Mosaic speed (``ops/probe.py``) but the monolithic XLA path's
``[B*H, S, T]`` float32 score tensor is the memory bottleneck.  The measured
motivating case (docs/performance.md): SDXL batch-4 @1024^2 backward OOMs a
16 GB chip by a single 2.5 GB ``[4,10,4096,4096]`` probs tensor — with this
path the peak attention transient is ``[B*H, chunk, T]`` and the saved
residuals are O(B*S*D) (q/k/v/out + a per-row logsumexp), same asymptotics
as flash attention, at plain-XLA execution speed.

Reference analogue: xformers memory-efficient attention
(``src/training/trainers/methods/flow_matching_trainer.py:69-76``), which is
itself the Rabe-Staats/flash chunking idea on CUDA.

Numerics match ``dot_product_attention_reference`` (fp32 softmax, bf16
matmul inputs, fp32 MXU accumulation) to bf16 tolerance; gradients use the
standard flash-attention backward identity ``dS = P * (dP - delta)`` with
``delta = rowsum(dO * O)``.
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp


DEFAULT_CHUNK = 512


def _default_chunk() -> int:
    """Query-chunk size (rows per scan step).  ``DEFAULT_CHUNK`` is the
    measured default (v5e sweep, tools/measure_r3.py, 2026-08-17);
    ``SDXL_TPU_ATTN_QCHUNK`` overrides for A/B measurement."""
    try:
        return int(os.environ.get("SDXL_TPU_ATTN_QCHUNK", DEFAULT_CHUNK))
    except ValueError:
        return DEFAULT_CHUNK


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _stack_chunks(x, n, chunk):
    """[BH, S, ...] -> [n, BH, chunk, ...]."""
    bh = x.shape[0]
    rest = x.shape[2:]
    return jnp.moveaxis(x.reshape(bh, n, chunk, *rest), 1, 0)


def _fwd(q3, k3, v3, scale, chunk):
    """q3: [BH, S, D] (S divisible by chunk); k3/v3: [BH, T, D].

    Returns (out [BH, S, D], lse [BH, S] fp32).
    """
    bh, s, d = q3.shape
    n = s // chunk
    qs = _stack_chunks(q3, n, chunk)

    def one(q_c):
        logits = jnp.einsum("bqd,bkd->bqk", q_c, k3,
                            preferred_element_type=jnp.float32) * scale
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        probs = (p / l).astype(v3.dtype)
        o = jnp.einsum("bqk,bkd->bqd", probs, v3,
                       preferred_element_type=jnp.float32)
        lse = m[..., 0] + jnp.log(l[..., 0])
        return o.astype(q3.dtype), lse

    out, lse = jax.lax.map(one, qs)
    return (jnp.moveaxis(out, 0, 1).reshape(bh, s, d),
            jnp.moveaxis(lse, 0, 1).reshape(bh, s))


def _bwd(q3, k3, v3, lse, do, scale, chunk, delta):
    """Backward over q chunks; dk/dv accumulate in fp32 scan carries."""
    bh, s, d = q3.shape
    n = s // chunk
    xs = (_stack_chunks(q3, n, chunk), _stack_chunks(do, n, chunk),
          _stack_chunks(lse, n, chunk), _stack_chunks(delta, n, chunk))

    def step(carry, x):
        dk, dv = carry
        q_c, do_c, lse_c, delta_c = x
        logits = jnp.einsum("bqd,bkd->bqk", q_c, k3,
                            preferred_element_type=jnp.float32) * scale
        p = jnp.exp(logits - lse_c[..., None])  # [BH, chunk, T] fp32
        pc = p.astype(v3.dtype)
        dv = dv + jnp.einsum("bqk,bqd->bkd", pc, do_c,
                             preferred_element_type=jnp.float32)
        dp = jnp.einsum("bqd,bkd->bqk", do_c, v3,
                        preferred_element_type=jnp.float32)
        ds = (p * (dp - delta_c[..., None]) * scale).astype(q_c.dtype)
        dq_c = jnp.einsum("bqk,bkd->bqd", ds, k3,
                          preferred_element_type=jnp.float32)
        dk = dk + jnp.einsum("bqk,bqd->bkd", ds, q_c,
                             preferred_element_type=jnp.float32)
        return (dk, dv), dq_c.astype(q3.dtype)

    zeros = jnp.zeros(k3.shape, jnp.float32)
    (dk, dv), dqs = jax.lax.scan(step, (zeros, zeros), xs)
    dq = jnp.moveaxis(dqs, 0, 1).reshape(bh, s, d)
    return dq, dk.astype(k3.dtype), dv.astype(v3.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _chunked_core(q3, k3, v3, scale, chunk):
    out, _ = _fwd(q3, k3, v3, scale, chunk)
    return out


def _chunked_core_fwd(q3, k3, v3, scale, chunk):
    out, lse = _fwd(q3, k3, v3, scale, chunk)
    return out, (q3, k3, v3, out, lse)


def _chunked_core_bwd(scale, chunk, res, do):
    q3, k3, v3, out, lse = res
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    return _bwd(q3, k3, v3, lse, do, scale, chunk, delta)


_chunked_core.defvjp(_chunked_core_fwd, _chunked_core_bwd)


def chunked_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                      scale: Optional[float] = None,
                      chunk: Optional[int] = None) -> jnp.ndarray:
    """q: [B, S, H, D]; k, v: [B, T, H, D] -> [B, S, H, D].

    Pads S to a chunk multiple (padded query rows carry zero cotangents in
    the backward, so they contribute nothing to dk/dv and are sliced off
    before dq is returned), flattens (B, H), and runs the chunked core.
    """
    b, s, h, d = q.shape
    t = k.shape[1]
    scale = (d ** -0.5) if scale is None else scale
    chunk = min(chunk if chunk else _default_chunk(), _ceil_to(s, 128))
    sp = _ceil_to(s, chunk)

    def to3(x, length):
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, length, d)

    q3 = to3(q, s)
    if sp != s:
        q3 = jnp.pad(q3, [(0, 0), (0, sp - s), (0, 0)])
    out = _chunked_core(q3, to3(k, t), to3(v, t), scale, chunk)
    out = out[:, :s].reshape(b, h, s, d)
    return jnp.transpose(out, (0, 2, 1, 3))
