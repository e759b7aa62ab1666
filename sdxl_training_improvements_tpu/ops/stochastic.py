"""Stochastic rounding fp32 -> bf16 as pure JAX ops.

Semantics match the reference's bit-twiddling kernels
(``adamw_bfloat16/stochastic/__init__.py:46-124``): add a random 16-bit
integer to the fp32 bit pattern, mask off the low 16 mantissa bits, and
reinterpret the high half as bf16.  This makes the rounding unbiased
(E[round(x)] = x), which is what keeps pure-bf16 training from stalling once
updates drop below the bf16 ulp.

The core entry points take pre-generated uint32 noise rather than PRNG keys:
callers that need several roundings per tensor (the optimizer does four)
generate all noise planes in ONE ``jax.random.bits`` call per tensor, which
keeps the number of PRNG kernels linear in parameters instead of 4x and is
what keeps XLA compile times sane at 300+ parameter leaves.

On TPU the same op is available inside Pallas kernels via
``pltpu.stochastic_round``; this module is the XLA-level equivalent used by
the optimizers (it fuses into the surrounding elementwise graph).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def stochastic_round_bits(x: jnp.ndarray, noise_u32: jnp.ndarray) -> jnp.ndarray:
    """Round fp32 ``x`` to bf16 stochastically using given uint32 noise.

    bits = bitcast_u32(x) + (noise & 0xFFFF); result = bf16(bits & 0xFFFF0000).
    """
    x = x.astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    bits = (bits + (noise_u32 & jnp.uint32(0xFFFF))) & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(bits, jnp.float32).astype(jnp.bfloat16)


def add_stochastic_bits(acc_bf16, other, noise_u32, alpha=1.0):
    """bf16 accumulator += alpha*other, fp32 math, stochastic rounding."""
    result = other.astype(jnp.float32) * alpha + acc_bf16.astype(jnp.float32)
    return stochastic_round_bits(result, noise_u32)


def addcdiv_stochastic_bits(acc_bf16, numer, denom, noise_u32, value=1.0):
    """bf16 accumulator += value*numer/denom, fp32 math, stochastic rounding."""
    result = (acc_bf16.astype(jnp.float32)
              + value * numer.astype(jnp.float32) / denom.astype(jnp.float32))
    return stochastic_round_bits(result, noise_u32)


# ------------------------------------------------------- fused counter RNG
def counter_noise(seed_u32: jnp.ndarray, n: int) -> jnp.ndarray:
    """Uniform uint32 noise from a fused integer hash of a counter — the
    zero-HBM-traffic noise source for the optimizer's stochastic rounding.

    ``jax.random.bits`` emits a standalone rng-bit-generator HLO whose
    output is *materialised* (for SDXL's 2.567B params that is ~41 GB of
    extra HBM traffic per optimizer step — measured as the dominant gap to
    the update's bandwidth bound, docs/performance.md).  Here the noise is
    ``lowbias32(iota ^ seed)``: iota and the 5-op hash fuse into the
    consuming elementwise update, so the noise never touches HBM.

    lowbias32 is Wellons' public-domain 32-bit avalanche hash (the
    best-known 2-round multiply-xorshift constants); stochastic rounding
    only requires i.i.d.-ish uniform 16-bit noise, not cryptographic
    strength — the reference's own noise is torch's default generator
    (``stochastic/__init__.py:46-71``), so the stream identity is already
    not part of the contract.  Uniformity is tested in
    tests/test_optimizers.py (chi-square + SR unbiasedness).
    """
    i = jax.lax.iota(jnp.uint32, n)
    x = i ^ seed_u32.astype(jnp.uint32)
    x ^= x >> 16
    x = x * jnp.uint32(0x7FEB352D)
    x ^= x >> 15
    x = x * jnp.uint32(0x846CA68B)
    x ^= x >> 16
    return x


# ----------------------------------------------------------------- key API
def stochastic_round_to_bf16(x: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """Key-based convenience wrapper around ``stochastic_round_bits``."""
    noise = jax.random.bits(key, x.shape, jnp.uint32)
    return stochastic_round_bits(x, noise)


def add_stochastic(acc_bf16, other, key, alpha=1.0):
    noise = jax.random.bits(key, acc_bf16.shape, jnp.uint32)
    return add_stochastic_bits(acc_bf16, other, noise, alpha)


def addcdiv_stochastic(acc_bf16, numer, denom, key, value=1.0):
    noise = jax.random.bits(key, acc_bf16.shape, jnp.uint32)
    return addcdiv_stochastic_bits(acc_bf16, numer, denom, noise, value)
