"""Fused GroupNorm+SiLU kernel numerics (interpret mode) + dispatcher."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from sdxl_training_improvements_tpu.ops.groupnorm import (
    _gn_silu_pallas, groupnorm_silu, groupnorm_silu_reference)


def test_reference_matches_manual():
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 16))
    scale = jnp.linspace(0.5, 1.5, 16)
    bias = jnp.linspace(-0.1, 0.1, 16)
    out = groupnorm_silu_reference(x, scale, bias, num_groups=4)
    # manual
    xf = np.asarray(x, np.float64).reshape(2, 64, 4, 4)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = xf.var(axis=(1, 3), keepdims=True)
    xn = ((xf - mean) / np.sqrt(var + 1e-5)).reshape(2, 8, 8, 16)
    y = xn * np.asarray(scale) + np.asarray(bias)
    expect = y / (1 + np.exp(-y))
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-4)


def test_pallas_kernel_matches_reference():
    x = jax.random.normal(jax.random.key(1), (2, 64, 32), jnp.float32)
    scale = jax.random.normal(jax.random.key(2), (32,)) * 0.1 + 1.0
    bias = jax.random.normal(jax.random.key(3), (32,)) * 0.1
    ref = groupnorm_silu_reference(x, scale, bias, num_groups=8)
    with pltpu.force_tpu_interpret_mode():
        out = _gn_silu_pallas(x, scale, bias, num_groups=8, eps=1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pallas_kernel_bf16():
    x = jax.random.normal(jax.random.key(1), (1, 128, 64), jnp.bfloat16)
    scale = jnp.ones((64,))
    bias = jnp.zeros((64,))
    # the kernel keeps an fp32 interior, so its oracle is the fp32-input
    # reference (the bf16-input reference intentionally normalizes in
    # bf16 — the residual-traffic lever — and differs by bf16 rounding)
    ref = groupnorm_silu_reference(
        x.astype(jnp.float32), scale, bias, num_groups=32)
    with pltpu.force_tpu_interpret_mode():
        out = _gn_silu_pallas(x, scale, bias, num_groups=32, eps=1e-5)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=2e-2)


def test_bf16_arith_gate():
    """norm_arith_bf16 switches the bf16 interior; OFF (ambient default)
    is bit-identical to the fp32 interior, ON agrees to bf16 rounding."""
    from sdxl_training_improvements_tpu.ops.groupnorm import norm_arith_bf16
    x = jax.random.normal(jax.random.key(5), (2, 64, 32), jnp.bfloat16)
    scale = jnp.linspace(0.5, 1.5, 32)
    bias = jnp.linspace(-0.1, 0.1, 32)
    off = groupnorm_silu_reference(x, scale, bias, num_groups=8)
    f32 = groupnorm_silu_reference(x.astype(jnp.float32), scale, bias,
                                   num_groups=8).astype(jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(off, np.float32),
                                  np.asarray(f32, np.float32))
    with norm_arith_bf16(True):
        on = groupnorm_silu_reference(x, scale, bias, num_groups=8)
    assert on.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(on, np.float32),
                               np.asarray(f32, np.float32), atol=5e-2)


def test_unet_config_gates_norm_arith():
    """UNetConfig.norm_bf16_arith=None resolves to the remat flag at trace
    time (the measured-best form per step type)."""
    from unittest import mock
    from sdxl_training_improvements_tpu.models import unet as U
    from sdxl_training_improvements_tpu.ops import groupnorm as G
    seen = {}

    real = G.norm_arith_bf16

    def spy(enabled):
        seen["on"] = enabled
        return real(enabled)

    cfgs = [(U.UNetConfig.tiny(remat=True, remat_policy="full"), True),
            (U.UNetConfig.tiny(remat=False), False)]
    for cfg, expect in cfgs:
        m = U.SDXLUNet(cfg)
        with mock.patch.object(U, "norm_arith_bf16", spy):
            b, hw = 1, 8
            m.init(jax.random.key(0),
                   jnp.zeros((b, cfg.in_channels, hw, hw)),
                   jnp.zeros((b,), jnp.int32),
                   jnp.zeros((b, 77, cfg.cross_attention_dim)),
                   jnp.zeros((b, cfg.pooled_embed_dim)),
                   jnp.zeros((b, cfg.num_time_ids)))
        assert seen.pop("on") is expect, (cfg.remat, expect)


def test_dispatcher_defaults_to_reference():
    # env flag unset -> jnp path; just confirm callable on NHWC
    x = jax.random.normal(jax.random.key(4), (2, 4, 4, 8))
    out = groupnorm_silu(x, jnp.ones(8), jnp.zeros(8), num_groups=2)
    assert out.shape == x.shape


def test_gradients_match_reference_path():
    x = jax.random.normal(jax.random.key(5), (1, 16, 8))
    scale, bias = jnp.ones(8), jnp.zeros(8)

    def loss_ref(x, s, b):
        return jnp.sum(groupnorm_silu_reference(x, s, b, 4) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)

    from sdxl_training_improvements_tpu.ops.groupnorm import _fused_core
    with pltpu.force_tpu_interpret_mode():
        def loss_fused(x, s, b):
            return jnp.sum(_fused_core(x, s, b, 4, 1e-5) ** 2)
        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-5, rtol=1e-4)


def test_chunked_kernel_matches_reference():
    """Two-pass chunked path (for images whose tile exceeds VMEM, e.g. the
    1536^2 stage-1 bucket) must match the reference numerics."""
    from sdxl_training_improvements_tpu.ops.groupnorm import (
        _gn_silu_pallas_chunked)
    x = jax.random.normal(jax.random.key(7), (2, 256, 32), jnp.float32)
    scale = jax.random.normal(jax.random.key(8), (32,)) * 0.1 + 1.0
    bias = jax.random.normal(jax.random.key(9), (32,)) * 0.1
    ref = groupnorm_silu_reference(x, scale, bias, num_groups=8)
    with pltpu.force_tpu_interpret_mode():
        out = _gn_silu_pallas_chunked(x, scale, bias, num_groups=8,
                                      eps=1e-5, n_chunks=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_pick_chunks():
    from sdxl_training_improvements_tpu.ops.groupnorm import (
        _MAX_TILE_BYTES, _pick_chunks)
    # 1536^2 stage-1: S=192*192=36864, C=320, bf16 -> ~23.6MB needs 2 chunks
    n = _pick_chunks(36864, 320, 2)
    assert n == 2
    assert (36864 // n) * 320 * 2 <= _MAX_TILE_BYTES
    # small image: one chunk
    assert _pick_chunks(4096, 320, 2) == 1
    # pathological prime S with no fitting divisor -> 0 (XLA fallback)
    assert _pick_chunks(36866 // 2 * 2 + 1, 131072, 4) == 0
