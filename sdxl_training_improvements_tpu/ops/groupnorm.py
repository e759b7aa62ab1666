"""Fused GroupNorm + SiLU for the UNet resblocks.

The reference gets its resblock normalization from torch's cuDNN GroupNorm
followed by a separate SiLU; the BASELINE.json north star asks for the fused
GroupNorm-SiLU(-conv) epilogue as a native TPU kernel.  This module provides:

* ``groupnorm_silu_reference`` — the jnp path (fp32 stats, fused by XLA);
* ``_gn_silu_kernel`` — a Pallas kernel computing the whole
  stats -> normalize -> affine -> SiLU chain in one VMEM residency per
  image (one grid cell per batch element, channels-last);
* ``groupnorm_silu`` — dispatcher: the Pallas kernel runs when
  ``SDXL_TPU_FUSED_GN=1`` and the per-image tile fits VMEM, else the XLA
  path (same environment caveat as ``ops/attention``: Mosaic executes
  ~100x slow through this dev tunnel, so default off).

Backward: the kernel is wrapped with the straight-through jnp VJP (the
fused op is numerically identical to the reference path, so gradients come
from the reference formula — simple and always correct).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-image VMEM budget for the single-block kernel (bf16 bytes)
_MAX_TILE_BYTES = 12 * 1024 * 1024


def groupnorm_silu_reference(x, scale, bias, num_groups: int = 32,
                             eps: float = 1e-5):
    """silu(groupnorm(x)) on NHWC (or [B, S, C]) in fp32, cast back."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    c = xf.shape[-1]
    spatial = xf.shape[1:-1]
    g = num_groups
    xg = xf.reshape(xf.shape[0], -1, g, c // g)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.var(xg, axis=(1, 3), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    xf = xg.reshape(xf.shape[0], *spatial, c)
    y = xf * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return (y * jax.nn.sigmoid(y)).astype(orig_dtype)


def _gn_silu_kernel(x_ref, scale_ref, bias_ref, o_ref, *, num_groups, eps):
    x = x_ref[0].astype(jnp.float32)  # [S, C]
    s, c = x.shape
    g = num_groups
    cg = c // g
    xg = x.reshape(s, g, cg)
    mean = jnp.mean(xg, axis=(0, 2), keepdims=True)          # [1, G, 1]
    var = jnp.mean(jnp.square(xg - mean), axis=(0, 2), keepdims=True)
    xn = (xg - mean) * jax.lax.rsqrt(var + eps)
    y = xn.reshape(s, c) * scale_ref[:].astype(jnp.float32) \
        + bias_ref[:].astype(jnp.float32)
    o_ref[0] = (y * jax.nn.sigmoid(y)).astype(o_ref.dtype)


def _gn_silu_pallas(x, scale, bias, num_groups: int, eps: float):
    """x: [B, S, C] -> fused kernel, grid over batch."""
    b, s, c = x.shape
    return pl.pallas_call(
        functools.partial(_gn_silu_kernel, num_groups=num_groups, eps=eps),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((1, s, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, scale, bias)


@functools.lru_cache(maxsize=1)
def _fused_enabled() -> bool:
    return os.environ.get("SDXL_TPU_FUSED_GN", "0") == "1" and \
        jax.default_backend() == "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_core(x3, scale, bias, num_groups, eps):
    return _gn_silu_pallas(x3, scale, bias, num_groups, eps)


def _fused_fwd(x3, scale, bias, num_groups, eps):
    return _gn_silu_pallas(x3, scale, bias, num_groups, eps), \
        (x3, scale, bias)


def _fused_bwd(num_groups, eps, res, g):
    x3, scale, bias = res
    _, vjp = jax.vjp(
        lambda x, s, b: groupnorm_silu_reference(x, s, b, num_groups, eps),
        x3, scale, bias)
    return vjp(g)


_fused_core.defvjp(_fused_fwd, _fused_bwd)


def groupnorm_silu(x, scale, bias, num_groups: int = 32, eps: float = 1e-5):
    """Dispatcher over NHWC (or [B, S, C]) inputs."""
    if _fused_enabled():
        shape = x.shape
        s = 1
        for d in shape[1:-1]:
            s *= d
        tile_bytes = s * shape[-1] * x.dtype.itemsize
        if tile_bytes <= _MAX_TILE_BYTES:
            x3 = x.reshape(shape[0], s, shape[-1])
            out = _fused_core(x3, scale, bias, num_groups, eps)
            return out.reshape(shape)
    return groupnorm_silu_reference(x, scale, bias, num_groups, eps)
