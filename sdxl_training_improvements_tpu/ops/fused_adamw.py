"""Fused bf16-SR AdamW update as a Pallas TPU kernel.

The optimizer update is pure elementwise HBM streaming: read p/g/m/v/shift
(10 B/param), write p/m/v/shift (8 B/param).  The XLA path
(``training/optimizers/adamw_bf16.py``) additionally materialises PRNG
planes and runs one fusion per leaf; this kernel does the whole
m -> v -> shift -> p chain in ONE pass per block with the random bits
generated in-register (``pltpu.prng_random_bits``), which is the
speed-of-light formulation (~60 ms for SDXL's 2.567B params on v5e's
819 GB/s, vs ~187 ms measured for the XLA path through this dev tunnel).

Semantics are identical to the XLA path (the reference bit-twiddle:
add a uniform 16-bit integer to the fp32 bit pattern, truncate to bf16 —
``stochastic/__init__.py:46-71``), with a different (in-kernel counter)
random stream.  Stochastic rounding only requires the noise to be uniform
16-bit and independent — the stream identity is not part of the contract
(the reference's own stream is torch's).

Gating: **explicit opt-in only** (``SDXL_TPU_FUSED_ADAMW=1``).  Measured on
a real v5e (2026-08-18, dependency-chain timing over a 320M-param leaf,
no host readback): this kernel streams 202 GB/s (28.46 ms) while the XLA
per-leaf chain streams 423 GB/s (13.62 ms) — Mosaic's DMA pipelining over
nine concurrent HBM streams loses to XLA's fused elementwise schedule, so
probe-native must NOT flip it on.  The same measurement shows the XLA
optimizer (127 ms / 2.567B params = 364 GB/s) is already within 15% of
XLA's own elementwise ceiling on this chip: the remaining 2x to the
819 GB/s paper bound is the bandwidth ceiling of multi-buffer elementwise
streams, not per-leaf dispatch.  Numerics remain verified in interpret
mode; the kernel is kept as the substrate for future Mosaic scheduling
improvements.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 1024  # block row width (multiple of the 128-lane VPU tile)
_BLOCK_ROWS = 512  # rows per grid step -> 512*1024 elems/block (~1M)


def _sr_bf16(x_f32, bits_u32):
    """Stochastic round fp32->bf16: add 16 random mantissa bits, truncate
    (reference ``copy_stochastic_`` semantics)."""
    b = jax.lax.bitcast_convert_type(x_f32, jnp.uint32)
    b = (b + (bits_u32 & jnp.uint32(0xFFFF))) & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(b, jnp.float32).astype(jnp.bfloat16)


def _fused_kernel(seed_ref, sc_ref, p_ref, g_ref, m_ref, v_ref, sh_ref,
                  po_ref, mo_ref, vo_ref, sho_ref, *, beta1, beta2, eps):
    """One block of the update chain.

    sc_ref (SMEM): [lr_eff, decay_amt] — lr_eff = lr * sqrt(1-beta2^t);
    decay_amt = accumulated decay to fire this step (0.0 when not firing),
    applied as shift -= decay_amt * p_new (reference batched decay,
    ``adamw_bfloat16/__init__.py:112-128``).
    """
    # two-word seed: (leaf seed, block id) spans a 2^64 space — a summed
    # 32-bit seed would collide streams across (leaf, block) pairs at
    # SDXL's ~1e6 blocks/step, correlating rounding noise between blocks
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    shape = p_ref.shape
    noise0 = pltpu.prng_random_bits(shape).astype(jnp.uint32)
    noise1 = pltpu.prng_random_bits(shape).astype(jnp.uint32)

    lr_eff = sc_ref[0]
    decay_amt = sc_ref[1]

    p = p_ref[...]
    g32 = g_ref[...].astype(jnp.float32)
    m32 = m_ref[...].astype(jnp.float32)
    v32 = v_ref[...].astype(jnp.float32)
    sh32 = sh_ref[...].astype(jnp.float32)

    # reference order: exp_avg.mul_(beta1) happens IN bf16 (nearest) before
    # the stochastic add (``adamw_bfloat16/__init__.py:160-163`` +
    # ops/stochastic.add_stochastic_bits) — mirror it bit-for-bit
    m_half = (m32 * beta1).astype(jnp.bfloat16).astype(jnp.float32)
    m = _sr_bf16(m_half + (1.0 - beta1) * g32, noise0)
    v = (v32 * beta2 + (1.0 - beta2) * g32 * g32).astype(jnp.bfloat16)
    denom = jnp.sqrt(v.astype(jnp.float32)) + eps
    sh = _sr_bf16(sh32 - lr_eff * m.astype(jnp.float32) / denom,
                  noise0 >> 16)
    p_new = _sr_bf16(p.astype(jnp.float32) + sh.astype(jnp.float32), noise1)
    sh = _sr_bf16(sh.astype(jnp.float32)
                  + (p.astype(jnp.float32) - p_new.astype(jnp.float32)),
                  noise1 >> 16)
    sh = (sh.astype(jnp.float32)
          - decay_amt * p_new.astype(jnp.float32)).astype(jnp.bfloat16)

    po_ref[...] = p_new
    mo_ref[...] = m
    vo_ref[...] = v
    sho_ref[...] = sh


def fused_adamw_update(p, g, m, v, shift, *, lr_eff: jnp.ndarray,
                       decay_amt: jnp.ndarray, seed: jnp.ndarray,
                       beta1: float = 0.9, beta2: float = 0.999,
                       eps: float = 1e-8):
    """Run the fused update over one bf16 tensor of any shape.

    Returns (p_new, m_new, v_new, shift_new).  The tensor is flattened and
    padded to a [rows, 1024] grid; padding lanes are dropped on return.
    On CPU, test under ``pltpu.force_tpu_interpret_mode()`` (the kernel
    uses TPU-only PRNG primitives).
    """
    n = p.size
    cols = _LANES
    rows = max(1, -(-n // cols))
    pad = rows * cols - n

    def prep(x, dtype):
        flat = x.reshape(-1).astype(dtype)
        if pad:
            flat = jnp.pad(flat, (0, pad))
        return flat.reshape(rows, cols)

    p2 = prep(p, jnp.bfloat16)
    g2 = prep(g, jnp.bfloat16)
    m2 = prep(m, jnp.bfloat16)
    v2 = prep(v, jnp.bfloat16)
    s2 = prep(shift, jnp.bfloat16)
    scalars = jnp.stack([jnp.asarray(lr_eff, jnp.float32),
                         jnp.asarray(decay_amt, jnp.float32)])
    seed_arr = jnp.asarray([seed], jnp.int32)

    block_rows = min(rows, _BLOCK_ROWS)
    grid = (-(-rows // block_rows),)
    tensor_spec = pl.BlockSpec((block_rows, cols), lambda i: (i, 0))
    out_shape = [jax.ShapeDtypeStruct((rows, cols), jnp.bfloat16)] * 4
    outs = pl.pallas_call(
        functools.partial(_fused_kernel, beta1=beta1, beta2=beta2, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            tensor_spec, tensor_spec, tensor_spec, tensor_spec, tensor_spec,
        ],
        out_specs=[tensor_spec] * 4,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(seed_arr, scalars, p2, g2, m2, v2, s2)

    def unprep(x):
        return x.reshape(-1)[:n].reshape(p.shape)

    return tuple(unprep(o) for o in outs)


@functools.lru_cache(maxsize=1)
def fused_adamw_enabled() -> bool:
    # Explicit opt-in ONLY: measured 2.1x slower than the XLA chain on
    # native v5e (module docstring, 2026-08-18) — unlike flash/fused-GN
    # this kernel never defers to the Mosaic auto-probe.
    import os
    return (os.environ.get("SDXL_TPU_FUSED_ADAMW") == "1"
            and jax.default_backend() == "tpu")
