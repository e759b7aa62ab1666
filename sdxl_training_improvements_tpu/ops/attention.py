"""Attention ops for the UNet (TPU-native replacement for xformers).

The reference gets memory-efficient attention from xformers
(``flow_matching_trainer.py:69-76``); here the same role is played by a Pallas
flash-attention kernel (``ops/flash_attention.py``) with this jnp
reference path as the numerics oracle and CPU fallback.

Layout: [B, S, H, D] (batch, sequence, heads, head_dim) — the natural TPU
layout keeping the contraction dims (D, S) in the lanes for the MXU.
Softmax is always computed in float32 regardless of input dtype.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


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
    """Pallas flash kernel opt-in.

    Default OFF even on TPU: measured on this project's tunneled-TPU dev
    environment, Mosaic custom calls execute through an emulated relay path
    ~100x slower than native (jax's own pallas flash kernel shows the same
    pathology: 42 ms vs XLA's 5 ms at S=4096, 5.5 s at S=1024), while XLA's
    fused attention runs at native speed.  On hardware where Mosaic runs
    natively, set ``SDXL_TPU_FLASH=1`` (or UNetConfig.use_pallas) to enable;
    numerics are verified identical either way (tests/test_flash_attention).
    """
    import os
    flag = os.environ.get("SDXL_TPU_FLASH", "0")
    if flag != "1":
        return False
    try:
        from sdxl_training_improvements_tpu.ops import flash_attention  # noqa: F401
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def dot_product_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          use_pallas: bool = True) -> jnp.ndarray:
    """Dispatch: Pallas flash attention (when enabled), XLA reference else.

    Self-attention sequences here are latent grids (4096 tokens at 1024²,
    up to 36864 at the 1536² bucket); cross-attention keys are 77 text
    tokens (SURVEY.md §5.7).
    """
    if use_pallas and _flash_available():
        from sdxl_training_improvements_tpu.ops import flash_attention
        return flash_attention.flash_attention(q, k, v)
    return dot_product_attention_reference(q, k, v)
