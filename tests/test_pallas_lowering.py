"""Cross-platform TPU *lowering* checks for every Pallas kernel.

Interpret mode (used by the numerics tests) executes kernels as plain
python and never runs Mosaic's block-mapping validation, so a BlockSpec
that only satisfies the TPU tiling rules at specific shapes can pass the
whole CPU suite and then fail at compile time on real hardware.  That is
exactly what happened with the chunked GroupNorm stats blocks: a [B, G]
stats array with block (1, G) lowers at B == 1 (block == array) but is
rejected at the CFG serving batch B == 2 (1 is neither divisible by 8 nor
equal to 2).

``jax.export`` lowers for an explicit target platform without needing a
device of that kind, and Pallas block-mapping validation runs during that
lowering — so these tests compile every kernel FOR TPU on the CPU host,
across the batch sizes and shapes the framework actually dispatches
(training micro-batches 1-4, CFG serving batch 2, the chunked large-bucket
path).  Mosaic's full binary compilation (VMEM budgeting etc.) still only
happens on hardware; what this gate buys is the shape/tiling legality.
"""
import functools

import jax
import jax.export
import jax.numpy as jnp
import pytest


def lowers_for_tpu(fn, *args):
    """Trace + lower ``fn`` for the TPU platform; raises on illegal specs."""
    specs = [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in args]
    jax.export.export(jax.jit(fn), platforms=["tpu"])(*specs)


# ---------------------------------------------------------------- groupnorm

@pytest.mark.parametrize("b", [1, 2, 3])
def test_gn_single_block_lowers(b):
    from sdxl_training_improvements_tpu.ops.groupnorm import _gn_silu_pallas
    x = jnp.zeros((b, 64, 320), jnp.bfloat16)
    s = jnp.ones((320,), jnp.bfloat16)
    bias = jnp.zeros((320,), jnp.bfloat16)
    lowers_for_tpu(
        lambda x, s, bias: _gn_silu_pallas(x, s, bias, 32, 1e-5), x, s, bias)


@pytest.mark.parametrize("b", [1, 2, 5])
def test_gn_chunked_lowers(b):
    """Regression: the exact CFG serving failure (batch 2, 1920-ch up-stage
    concat tile -> chunked path) must lower for TPU."""
    from sdxl_training_improvements_tpu.ops.groupnorm import (
        _gn_silu_pallas_chunked)
    x = jnp.zeros((b, 256, 1920), jnp.bfloat16)
    s = jnp.ones((1920,), jnp.bfloat16)
    bias = jnp.zeros((1920,), jnp.bfloat16)
    lowers_for_tpu(
        lambda x, s, bias: _gn_silu_pallas_chunked(x, s, bias, 32, 1e-5, 4),
        x, s, bias)


def test_gn_chunked_grad_lowers():
    """The custom-VJP backward (reference-formula jnp) must lower too."""
    from sdxl_training_improvements_tpu.ops.groupnorm import (
        _fused_core_chunked)
    x = jnp.zeros((2, 256, 640), jnp.bfloat16)
    s = jnp.ones((640,), jnp.bfloat16)
    bias = jnp.zeros((640,), jnp.bfloat16)

    def loss(x, s, bias):
        return jnp.sum(
            _fused_core_chunked(x, s, bias, 32, 1e-5, 2).astype(jnp.float32))

    lowers_for_tpu(jax.grad(loss, argnums=(0, 1, 2)), x, s, bias)


# ---------------------------------------------------------- flash attention

@pytest.mark.parametrize("b,s,t", [(1, 256, 256), (2, 256, 256),
                                   (2, 256, 77), (4, 640, 77)])
def test_flash_attention_lowers(b, s, t):
    from sdxl_training_improvements_tpu.ops.flash_attention import (
        flash_attention)
    q = jnp.zeros((b, s, 10, 64), jnp.bfloat16)
    k = jnp.zeros((b, t, 10, 64), jnp.bfloat16)
    v = jnp.zeros((b, t, 10, 64), jnp.bfloat16)
    lowers_for_tpu(flash_attention, q, k, v)


def test_flash_attention_grad_lowers():
    from sdxl_training_improvements_tpu.ops.flash_attention import (
        flash_attention)
    q = jnp.zeros((2, 256, 10, 64), jnp.bfloat16)
    k = jnp.zeros((2, 256, 10, 64), jnp.bfloat16)
    v = jnp.zeros((2, 256, 10, 64), jnp.bfloat16)

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v).astype(jnp.float32))

    lowers_for_tpu(jax.grad(loss, argnums=(0, 1, 2)), q, k, v)


# --------------------------------------------------------------- fused adamw

@pytest.mark.parametrize("n", [1000, 320 * 320 * 3 * 3])
def test_fused_adamw_lowers(n):
    from sdxl_training_improvements_tpu.ops.fused_adamw import (
        fused_adamw_update)
    p = jnp.zeros((n,), jnp.bfloat16)

    def step(p, g, m, v, sh):
        return fused_adamw_update(
            p, g, m, v, sh, lr_eff=jnp.float32(1e-4),
            decay_amt=jnp.float32(0.0), seed=jnp.int32(7))

    lowers_for_tpu(step, p, p, p, p, p)


# -------------------------------------------------------------------- probe

def test_probe_kernel_lowers():
    from jax.experimental import pallas as pl
    from sdxl_training_improvements_tpu.ops import probe

    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0 + 1.0

    rows, cols = probe._PROBE_SHAPE
    block = 512
    x = jnp.ones(probe._PROBE_SHAPE, jnp.float32)
    lowers_for_tpu(
        lambda a: pl.pallas_call(
            kernel,
            grid=(rows // block,),
            in_specs=[pl.BlockSpec((block, cols), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((block, cols), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype))(a), x)
