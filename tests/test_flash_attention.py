"""Flash-attention numerics vs the XLA reference path (interpret mode on CPU)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from sdxl_training_improvements_tpu.ops.attention import (
    dot_product_attention_reference)
from sdxl_training_improvements_tpu.ops.flash_attention import flash_attention


def rand_qkv(key, b, s, t, h, d, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (b, s, h, d), dtype)
    k = jax.random.normal(ks[1], (b, t, h, d), dtype)
    v = jax.random.normal(ks[2], (b, t, h, d), dtype)
    return q, k, v


@pytest.mark.parametrize("s,t", [(128, 128), (256, 77), (300, 300), (77, 513)])
def test_forward_matches_reference(s, t):
    q, k, v = rand_qkv(jax.random.key(0), 2, s, t, 2, 64)
    ref = dot_product_attention_reference(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_forward_bf16():
    q, k, v = rand_qkv(jax.random.key(1), 1, 128, 128, 2, 64, jnp.bfloat16)
    ref = dot_product_attention_reference(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, block_q=128, block_k=128)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=2e-2)


@pytest.mark.parametrize("s,t", [(128, 128), (256, 77)])
def test_gradients_match_reference(s, t):
    q, k, v = rand_qkv(jax.random.key(2), 1, s, t, 2, 64)
    cot = jax.random.normal(jax.random.key(3), (1, s, 2, 64))

    def loss_ref(q, k, v):
        return jnp.sum(dot_product_attention_reference(q, k, v) * cot)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, block_q=128, block_k=128) * cot)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-4,
                                   err_msg=f"d{name} mismatch")


def test_large_logit_stability():
    """Online softmax must survive large logits (ZTSNR-scale activations)."""
    q, k, v = rand_qkv(jax.random.key(4), 1, 128, 128, 1, 64)
    q = q * 50.0
    ref = dot_product_attention_reference(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, block_q=128, block_k=128)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
