"""Attention dispatch for the UNet (TPU-native replacement for xformers).

The reference gets memory-efficient attention from xformers
(``flow_matching_trainer.py:69-76``); here the same role is played by three
implementations behind one dispatcher:

* ``flash``   — Pallas flash-attention kernel (``ops/flash_attention.py``),
  the native-hardware fast path (never materialises the S*T scores);
* ``chunked`` — pure-XLA bounded-memory attention
  (``ops/chunked_attention.py``), same O(S*D) residual asymptotics at XLA
  speed, for environments where Mosaic is emulated/slow;
* ``xla``     — the monolithic reference path below, fastest when the score
  tensor comfortably fits (it is the numerics oracle for the other two).

``impl="auto"`` (the default everywhere) picks per call site from static
shape information: chunked when this call's fp32 score tensor would exceed
a chunk threshold, monolithic XLA otherwise.  ``auto`` deliberately does
NOT promote to flash even when the Mosaic auto-probe reports native
execution: measured on a real v5e (tools/measure_r3.py, 2026-08-18,
batch 1 @1024^2 fwd+bwd, no remat), flash TIES the chunked XLA path
without fused GroupNorm (269.4 vs 269.3 ms) and LOSES with it
(309.9 vs 259.6 ms) — the flash backward recomputes the row softmax while
XLA's chunked VJP schedule overlaps better with the surrounding convs.
Flash remains available explicitly (``attn_impl="flash"`` or
``SDXL_TPU_FLASH=1``) for fwd-only serving shapes where it can win.

The threshold is remat-aware, from the v5e measurements
(tools/measure_r3.py, 2026-08-17, docs/performance.md):

* **no remat** -> 64 MB: chunk every latent self-attention site, keep the
  77-token cross-attention monolithic.  All-chunked measured 10.6% faster
  than all-monolithic at batch 1 @1024^2 fwd+bwd (273.5 vs 305.8 ms), on
  top of removing the 2.5 GB probs transient that OOM'd batch 4.
* **under remat** -> 512 MB: the chunked VJP recomputes attention on top
  of the remat recompute, so monolithic wins wherever the probs transient
  is affordable; chunk only the huge 64^2-stage scores.  At batch 4
  @1024^2 with ``dots_small`` remat: 1483 ms vs 1538 ms all-chunked.

``SDXL_TPU_ATTN_CHUNK_MB`` overrides both; call sites may also pass an
explicit ``chunk_mb`` (threaded from ``UNetConfig.attn_chunk_mb``).

Layout: [B, S, H, D] (batch, sequence, heads, head_dim) — the natural TPU
layout keeping the contraction dims (D, S) in the lanes for the MXU.
Softmax is always computed in float32 regardless of input dtype.
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp

IMPLS = ("auto", "xla", "chunked", "flash")
_DEFAULT_CHUNK_MB = 64


def dot_product_attention_reference(q: jnp.ndarray, k: jnp.ndarray,
                                    v: jnp.ndarray,
                                    scale: Optional[float] = None) -> jnp.ndarray:
    """Plain XLA attention, fp32 softmax. q,k,v: [B, S, H, D] / kv: [B, T, H, D]."""
    *_, d = q.shape
    scale = (d ** -0.5) if scale is None else scale
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


@functools.lru_cache(maxsize=1)
def _flash_available() -> bool:
    """Pallas flash kernel availability.

    ``SDXL_TPU_FLASH=1`` forces it on, ``=0`` forces it off; unset defers to
    the Mosaic auto-probe (``ops/probe.py``) so the first run on native
    hardware uses the kernel without human intervention, while this
    project's tunneled dev TPU (Mosaic ~100x slow through the relay,
    docs/performance.md) keeps the XLA paths.  Numerics are verified
    identical either way (tests/test_flash_attention.py).
    """
    from sdxl_training_improvements_tpu.ops.probe import kernel_enabled
    if not kernel_enabled("SDXL_TPU_FLASH"):
        return False
    if jax.default_backend() != "tpu":
        return False
    try:
        from sdxl_training_improvements_tpu.ops import flash_attention  # noqa: F401
        return True
    except Exception:
        return False


def _chunk_threshold_bytes(chunk_mb: Optional[int] = None) -> int:
    env = os.environ.get("SDXL_TPU_ATTN_CHUNK_MB")
    if env is not None:
        try:
            return int(float(env) * (1 << 20))
        except ValueError:
            pass
    mb = chunk_mb if chunk_mb else _DEFAULT_CHUNK_MB
    return int(mb) << 20


def resolve_impl(impl: str, b: int, s: int, t: int, h: int,
                 chunk_mb: Optional[int] = None) -> str:
    """Resolve "auto" to a concrete implementation for a static call shape."""
    if impl not in IMPLS:
        raise ValueError(f"Unknown attention impl {impl!r}; one of {IMPLS}")
    if impl != "auto":
        return impl
    # Only an explicit SDXL_TPU_FLASH=1 promotes "auto" to flash: on native
    # v5e the flash training step measured no faster than chunked XLA (tie
    # at 269 ms GN-off, 50 ms SLOWER with fused GN on; module docstring).
    if os.environ.get("SDXL_TPU_FLASH") == "1" and _flash_available():
        return "flash"
    score_bytes = 4 * b * h * s * t  # the fp32 logits/probs tensor
    if score_bytes >= _chunk_threshold_bytes(chunk_mb):
        return "chunked"
    return "xla"


def dot_product_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          impl: str = "auto",
                          chunk_mb: Optional[int] = None) -> jnp.ndarray:
    """Dispatch per the module docstring.

    Self-attention sequences here are latent grids (4096 tokens at 1024²,
    up to 36864 at the 1536² bucket); cross-attention keys are 77 text
    tokens (SURVEY.md §5.7), which never trip the chunked threshold.
    """
    b, s, h, _ = q.shape
    t = k.shape[1]
    resolved = resolve_impl(impl, b, s, t, h, chunk_mb)
    if resolved == "flash":
        from sdxl_training_improvements_tpu.ops import flash_attention
        return flash_attention.flash_attention(q, k, v)
    if resolved == "chunked":
        from sdxl_training_improvements_tpu.ops.chunked_attention import (
            chunked_attention)
        return chunked_attention(q, k, v)
    return dot_product_attention_reference(q, k, v)
