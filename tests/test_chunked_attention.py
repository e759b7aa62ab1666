"""Chunked (bounded-memory, pure-XLA) attention: numerics + dispatch.

The chunked path must be interchangeable with the monolithic XLA reference
(``ops/attention.py``) in both values and gradients — it is what "auto"
dispatch selects when the fp32 score tensor is huge and Mosaic is not
native (the measured batch-4 @1024^2 OOM case, docs/performance.md).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdxl_training_improvements_tpu.ops import attention
from sdxl_training_improvements_tpu.ops.chunked_attention import (
    chunked_attention)


def _qkv(key, b, s, t, h, d, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(jax.random.key(key), 3)
    q = jax.random.normal(kq, (b, s, h, d), dtype)
    k = jax.random.normal(kk, (b, t, h, d), dtype)
    v = jax.random.normal(kv, (b, t, h, d), dtype)
    return q, k, v


class TestChunkedNumerics:
    @pytest.mark.parametrize("s,t,chunk", [
        (256, 256, 64),     # self-attn, S divisible by chunk
        (200, 200, 64),     # S not a chunk multiple (padding path)
        (128, 77, 64),      # cross-attn (77 text tokens)
        (64, 256, 128),     # chunk > S (clamped)
    ])
    def test_forward_matches_reference(self, s, t, chunk):
        q, k, v = _qkv(0, 2, s, t, 3, 32)
        ref = attention.dot_product_attention_reference(q, k, v)
        out = chunked_attention(q, k, v, chunk=chunk)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_forward_bf16(self):
        q, k, v = _qkv(1, 1, 256, 256, 2, 64, jnp.bfloat16)
        ref = attention.dot_product_attention_reference(q, k, v)
        out = chunked_attention(q, k, v, chunk=64)
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref, np.float32), atol=2e-2)

    def test_gradients_match_reference(self):
        q, k, v = _qkv(2, 2, 192, 192, 2, 32)

        def loss_ref(q, k, v):
            o = attention.dot_product_attention_reference(q, k, v)
            return jnp.sum(jnp.sin(o))

        def loss_chunked(q, k, v):
            o = chunked_attention(q, k, v, chunk=64)
            return jnp.sum(jnp.sin(o))

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        g_chk = jax.grad(loss_chunked, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_chk, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5, rtol=5e-4)

    def test_gradients_with_padding(self):
        """Padded query rows must not pollute dk/dv."""
        q, k, v = _qkv(3, 1, 100, 100, 2, 32)  # pads 100 -> 128

        def loss(fn):
            return jax.grad(
                lambda q_, k_, v_: jnp.sum(fn(q_, k_, v_) ** 2),
                argnums=(0, 1, 2))(q, k, v)

        g_ref = loss(attention.dot_product_attention_reference)
        g_chk = loss(lambda a, b, c: chunked_attention(a, b, c, chunk=64))
        for a, b in zip(g_chk, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5, rtol=5e-4)

    def test_jit_and_remat_compose(self):
        """chunked attention under jax.checkpoint under jit (the production
        composition: remat'd transformer blocks)."""
        q, k, v = _qkv(4, 1, 128, 128, 2, 32)

        @jax.jit
        def f(q, k, v):
            fn = jax.checkpoint(
                lambda q_: jnp.sum(chunked_attention(q_, k, v, chunk=64)))
            return jax.grad(fn)(q)

        g = f(q, k, v)
        assert np.isfinite(np.asarray(g)).all()


class TestDispatch:
    def test_resolve_explicit(self):
        assert attention.resolve_impl("xla", 1, 4096, 4096, 10) == "xla"
        assert attention.resolve_impl("chunked", 1, 64, 64, 1) == "chunked"
        with pytest.raises(ValueError, match="Unknown attention impl"):
            attention.resolve_impl("bogus", 1, 1, 1, 1)

    def test_auto_threshold(self, monkeypatch):
        monkeypatch.delenv("SDXL_TPU_ATTN_CHUNK_MB", raising=False)
        # every latent self-attention site resolves chunked (64 MB
        # default threshold; all-chunked measured 10.6% faster than
        # all-monolithic at b1 @1024^2, tools/measure_r3.py, 2026-08-17):
        # b1 @1024^2 640-ch stage: [1,10,4096,4096] fp32 = 640 MB
        assert attention.resolve_impl(
            "auto", 1, 4096, 4096, 10) == "chunked"
        # b1 1280-ch stage: [1,20,1024,1024] fp32 = 80 MB
        assert attention.resolve_impl(
            "auto", 1, 1024, 1024, 20) == "chunked"
        # batch-4: 2.5 GB -> chunked (the measured OOM tensor)
        assert attention.resolve_impl(
            "auto", 4, 4096, 4096, 10) == "chunked"
        # cross-attention (77 text tokens) stays monolithic
        assert attention.resolve_impl("auto", 4, 4096, 77, 10) == "xla"
        # tiny-model shapes stay monolithic
        assert attention.resolve_impl("auto", 1, 256, 256, 8) == "xla"

    def test_remat_threshold(self, monkeypatch):
        """Under remat the UNet passes chunk_mb=512 (chunked's VJP pays a
        second recompute on top of remat's, so monolithic wins where the
        probs transient is affordable — b4 @1024^2 dots_small: 1483 ms at
        512 MB vs 1538 ms all-chunked, tools/measure_r3.py, 2026-08-17)."""
        monkeypatch.delenv("SDXL_TPU_ATTN_CHUNK_MB", raising=False)
        # b4 64^2 stage: 2.5 GB -> still chunked even at 512 MB
        assert attention.resolve_impl(
            "auto", 4, 4096, 4096, 10, chunk_mb=512) == "chunked"
        # b4 32^2 stage: [4,20,1024,1024] fp32 = 336 MB -> monolithic
        assert attention.resolve_impl(
            "auto", 4, 1024, 1024, 20, chunk_mb=512) == "xla"
        # same site under the no-remat 64 MB default -> chunked
        assert attention.resolve_impl(
            "auto", 4, 1024, 1024, 20) == "chunked"

    def test_auto_threshold_env_override(self, monkeypatch):
        monkeypatch.setenv("SDXL_TPU_ATTN_CHUNK_MB", "1")
        assert attention.resolve_impl("auto", 1, 256, 256, 8) == "chunked"
        # env wins over an explicit per-call threshold
        assert attention.resolve_impl(
            "auto", 1, 256, 256, 8, chunk_mb=512) == "chunked"

    def test_dispatch_chunked_runs(self, monkeypatch):
        monkeypatch.setenv("SDXL_TPU_ATTN_CHUNK_MB", "0.001")
        q, k, v = _qkv(5, 1, 128, 128, 2, 32)
        out = attention.dot_product_attention(q, k, v, impl="auto")
        ref = attention.dot_product_attention_reference(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)


class TestProbe:
    def test_cpu_backend_never_native(self):
        from sdxl_training_improvements_tpu.ops import probe
        probe.mosaic_native.cache_clear()
        try:
            assert probe.mosaic_native() is False  # tests force CPU backend
        finally:
            probe.mosaic_native.cache_clear()

    def test_env_overrides(self, monkeypatch):
        from sdxl_training_improvements_tpu.ops import probe
        monkeypatch.setenv("SDXL_TPU_MOSAIC", "native")
        probe.mosaic_native.cache_clear()
        assert probe.mosaic_native() is True
        monkeypatch.setenv("SDXL_TPU_MOSAIC", "slow")
        probe.mosaic_native.cache_clear()
        assert probe.mosaic_native() is False
        probe.mosaic_native.cache_clear()

    def test_kernel_enabled_precedence(self, monkeypatch):
        from sdxl_training_improvements_tpu.ops import probe
        monkeypatch.delenv("SDXL_TPU_MOSAIC", raising=False)
        probe.mosaic_native.cache_clear()
        monkeypatch.setenv("SDXL_TPU_FLASH", "1")
        assert probe.kernel_enabled("SDXL_TPU_FLASH") is True
        monkeypatch.setenv("SDXL_TPU_FLASH", "0")
        assert probe.kernel_enabled("SDXL_TPU_FLASH") is False
        monkeypatch.delenv("SDXL_TPU_FLASH", raising=False)
        # unset -> probe (CPU backend -> False)
        assert probe.kernel_enabled("SDXL_TPU_FLASH") is False
        probe.mosaic_native.cache_clear()

    def test_auto_never_promotes_to_flash(self, monkeypatch):
        """"auto" uses flash only on explicit SDXL_TPU_FLASH=1: on native
        v5e (2026-08-18) flash tied chunked fwd+bwd GN-off (269.4 vs
        269.3 ms) and lost GN-on (309.9 vs 259.6 ms) — probe-native alone
        must not flip training onto it (attention.py module docstring)."""
        monkeypatch.delenv("SDXL_TPU_ATTN_CHUNK_MB", raising=False)
        monkeypatch.setattr(attention, "_flash_available", lambda: True)
        monkeypatch.delenv("SDXL_TPU_FLASH", raising=False)
        assert attention.resolve_impl("auto", 1, 4096, 4096, 10) == "chunked"
        assert attention.resolve_impl("auto", 1, 256, 256, 8) == "xla"
        monkeypatch.setenv("SDXL_TPU_FLASH", "1")
        assert attention.resolve_impl("auto", 1, 4096, 4096, 10) == "flash"

    def test_flash_not_selected_on_cpu(self):
        attention._flash_available.cache_clear()
        try:
            assert attention.resolve_impl("auto", 1, 64, 64, 1) == "xla"
        finally:
            attention._flash_available.cache_clear()
