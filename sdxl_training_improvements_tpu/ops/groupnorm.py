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

import contextlib
import contextvars
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-image VMEM budget for the single-block kernel (bf16 bytes)
_MAX_TILE_BYTES = 12 * 1024 * 1024

# Trace-time switch for the bf16 norm interior (round-5 lever).  With it ON
# a bf16 input keeps the normalize/affine arithmetic — and therefore the
# autodiff residuals XLA saves for the backward — in bf16 (fp32 statistics
# either way).  Measured on the chip (tools/measure_r3.py, 2026-08-20):
# −3.5% on the remat literal b4@1024² step (1350.0 → 1302.9 ms: smaller
# residuals = less save+recompute HBM traffic) but +1.5% on the no-remat
# b1 step (260.3 → 264.2 ms: residuals are saved once anyway and the extra
# cast chain costs).  UNet.__call__ therefore sets it from its own config
# (default: ON iff remat) for the duration of the trace; fp32 inputs are
# bit-identical either way.  The ambient default is OFF so every non-UNet
# consumer (CLIP text towers, VAE paths, direct kernel calls) keeps the
# round-4 fp32-interior numerics.
_NORM_ARITH_BF16 = contextvars.ContextVar("sdxl_norm_arith_bf16",
                                          default=False)


def norm_arith_bf16_enabled() -> bool:
    return _NORM_ARITH_BF16.get()


@contextlib.contextmanager
def norm_arith_bf16(enabled: bool):
    tok = _NORM_ARITH_BF16.set(bool(enabled))
    try:
        yield
    finally:
        _NORM_ARITH_BF16.reset(tok)


def groupnorm_silu_reference(x, scale, bias, num_groups: int = 32,
                             eps: float = 1e-5):
    """silu(groupnorm(x)) on NHWC (or [B, S, C]).

    Residual-dtype policy matches ``models.layers.group_norm``: fp32
    statistics always; the normalize/affine/SiLU arithmetic runs in the
    input dtype for bf16 inputs when ``norm_arith_bf16`` is on at trace
    time (keeps autodiff residuals bf16 — the HBM-traffic lever,
    docs/performance.md) and in fp32 (bit-identical to the original form)
    otherwise."""
    orig_dtype = x.dtype
    c = x.shape[-1]
    spatial = x.shape[1:-1]
    g = num_groups
    xg = x.reshape(x.shape[0], -1, g, c // g)
    x32 = xg.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 3), keepdims=True)
    if orig_dtype == jnp.bfloat16 and norm_arith_bf16_enabled():
        var = jnp.maximum(
            jnp.mean(jnp.square(x32), axis=(1, 3), keepdims=True)
            - jnp.square(mean), 0.0)
        mul = jax.lax.rsqrt(var + eps)
        xhat = (xg - mean.astype(orig_dtype)) * mul.astype(orig_dtype)
        y = (xhat.reshape(x.shape[0], *spatial, c) * scale.astype(orig_dtype)
             + bias.astype(orig_dtype))
        return y * jax.nn.sigmoid(y)
    var = jnp.var(x32, axis=(1, 3), keepdims=True)
    xg32 = (x32 - mean) * jax.lax.rsqrt(var + eps)
    xf = xg32.reshape(x.shape[0], *spatial, c)
    y = xf * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return (y * jax.nn.sigmoid(y)).astype(orig_dtype)


def _group_matrix(c: int, g: int):
    """[C, G] one-hot channel->group matrix (constant, folded by Mosaic).

    Group reductions inside the kernels go through this matrix as [1,C]x[C,G]
    matmuls instead of a [S, G, C/G] reshape: Mosaic's vector layouts cannot
    shape-cast the lane dimension for arbitrary C/G (e.g. the UNet's
    cg in {10, 20, 40}), while a matmul against a constant is always
    supported (and lands on the MXU)."""
    cg = c // g
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, g), 0)
    gr = jax.lax.broadcasted_iota(jnp.int32, (c, g), 1)
    return (ch // cg == gr).astype(jnp.float32)


def _gn_silu_kernel(x_ref, scale_ref, bias_ref, o_ref, *, num_groups, eps):
    x = x_ref[0].astype(jnp.float32)  # [S, C]
    s, c = x.shape
    g = num_groups
    n = jnp.float32(s * (c // g))
    m = _group_matrix(c, g)
    s1 = jnp.sum(x, axis=0, keepdims=True)              # [1, C]
    s2 = jnp.sum(jnp.square(x), axis=0, keepdims=True)
    gs1 = jnp.dot(s1, m, preferred_element_type=jnp.float32)  # [1, G]
    gs2 = jnp.dot(s2, m, preferred_element_type=jnp.float32)
    mean_g = gs1 / n
    var_g = jnp.maximum(gs2 / n - jnp.square(mean_g), 0.0)
    rstd_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.dot(mean_g, m.T, preferred_element_type=jnp.float32)  # [1,C]
    rstd_c = jnp.dot(rstd_g, m.T, preferred_element_type=jnp.float32)
    y = (x - mean_c) * rstd_c * scale_ref[:].astype(jnp.float32) \
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


def _gn_stats_kernel(x_ref, sums_ref, *, num_groups):
    """Partial per-group sums over one spatial chunk: out [1,1,2,G]."""
    x = x_ref[0].astype(jnp.float32)  # [Sc, C]
    sc, c = x.shape
    m = _group_matrix(c, num_groups)
    s1 = jnp.sum(x, axis=0, keepdims=True)
    s2 = jnp.sum(jnp.square(x), axis=0, keepdims=True)
    sums_ref[0, 0, 0] = jnp.dot(s1, m,
                                preferred_element_type=jnp.float32)[0]
    sums_ref[0, 0, 1] = jnp.dot(s2, m,
                                preferred_element_type=jnp.float32)[0]


def _gn_apply_kernel(x_ref, mean_ref, rstd_ref, scale_ref, bias_ref, o_ref,
                     *, num_groups):
    """Normalize+affine+SiLU one spatial chunk given the image stats."""
    x = x_ref[0].astype(jnp.float32)  # [Sc, C]
    sc, c = x.shape
    m = _group_matrix(c, num_groups)
    mean_c = jnp.dot(mean_ref[0], m.T,
                     preferred_element_type=jnp.float32)  # [1, C]
    rstd_c = jnp.dot(rstd_ref[0], m.T,
                     preferred_element_type=jnp.float32)
    y = (x - mean_c) * rstd_c * scale_ref[:].astype(jnp.float32) \
        + bias_ref[:].astype(jnp.float32)
    o_ref[0] = (y * jax.nn.sigmoid(y)).astype(o_ref.dtype)


def _gn_silu_pallas_chunked(x, scale, bias, num_groups: int, eps: float,
                            n_chunks: int):
    """Two-pass fused GN+SiLU for images whose [S, C] tile exceeds VMEM
    (the 1536^2 bucket's stage-1 is ~23 MB): pass 1 reduces per-group
    partial sums chunk-by-chunk, a tiny jnp combine forms mean/rstd, pass 2
    streams the chunks again to normalize+affine+SiLU.  ~2x HBM reads of x
    — still one fused epilogue instead of XLA's 3-op chain."""
    b, s, c = x.shape
    sc = s // n_chunks
    g = num_groups
    sums = pl.pallas_call(
        functools.partial(_gn_stats_kernel, num_groups=g),
        grid=(b, n_chunks),
        in_specs=[pl.BlockSpec((1, sc, c), lambda i, j: (i, j, 0))],
        out_specs=pl.BlockSpec((1, 1, 2, g), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_chunks, 2, g), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x)
    total = jnp.sum(sums, axis=1)  # [B, 2, G]
    n = jnp.float32(s * (c // g))
    # stats are carried as [B, 1, G] so the per-image block (1, 1, G) always
    # EQUALS the array's trailing dims: Mosaic requires the last two block
    # dims be (divisible by 8, divisible by 128) or equal to the array's —
    # a [B, G] layout with block (1, G) only lowers when B == 1 (the CFG
    # batch-2 serving path hit exactly this on real TPU hardware)
    mean = (total[:, 0] / n)[:, None]
    var = total[:, 1] / n - jnp.square(total[:, 0] / n)
    rstd = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)[:, None]
    return pl.pallas_call(
        functools.partial(_gn_apply_kernel, num_groups=g),
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec((1, sc, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, g), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, g), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((c,), lambda i, j: (0,)),
            pl.BlockSpec((c,), lambda i, j: (0,)),
        ],
        out_specs=pl.BlockSpec((1, sc, c), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, mean, rstd, scale, bias)


def _pick_chunks(s: int, c: int, itemsize: int) -> int:
    """Smallest divisor n of s with the chunk tile under the VMEM budget;
    0 if s has no suitable divisor (-> XLA path)."""
    for n in range(1, min(s, 64) + 1):  # >64 chunks: too fine, XLA instead
        if s % n:
            continue
        if (s // n) * c * itemsize <= _MAX_TILE_BYTES:
            return n
    return 0


@functools.lru_cache(maxsize=1)
def _fused_enabled() -> bool:
    # "1" forces on, "0" forces off, unset -> Mosaic auto-probe (ops/probe)
    from sdxl_training_improvements_tpu.ops.probe import kernel_enabled
    return kernel_enabled("SDXL_TPU_FUSED_GN") and \
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused_core_chunked(x3, scale, bias, num_groups, eps, n_chunks):
    return _gn_silu_pallas_chunked(x3, scale, bias, num_groups, eps,
                                   n_chunks)


def _fused_chunked_fwd(x3, scale, bias, num_groups, eps, n_chunks):
    return (_gn_silu_pallas_chunked(x3, scale, bias, num_groups, eps,
                                    n_chunks), (x3, scale, bias))


def _fused_chunked_bwd(num_groups, eps, n_chunks, res, g):
    return _fused_bwd(num_groups, eps, res, g)


_fused_core_chunked.defvjp(_fused_chunked_fwd, _fused_chunked_bwd)


def groupnorm_silu(x, scale, bias, num_groups: int = 32, eps: float = 1e-5):
    """Dispatcher over NHWC (or [B, S, C]) inputs: single-block kernel when
    one image fits VMEM, the two-pass chunked kernel for the large buckets
    (1536^2 stage-1 ~23 MB), XLA reference otherwise."""
    if _fused_enabled():
        shape = x.shape
        s = 1
        for d in shape[1:-1]:
            s *= d
        tile_bytes = s * shape[-1] * x.dtype.itemsize
        x3 = None
        if tile_bytes <= _MAX_TILE_BYTES:
            x3 = x.reshape(shape[0], s, shape[-1])
            out = _fused_core(x3, scale, bias, num_groups, eps)
        else:
            n = _pick_chunks(s, shape[-1], x.dtype.itemsize)
            if n:
                x3 = x.reshape(shape[0], s, shape[-1])
                out = _fused_core_chunked(x3, scale, bias, num_groups, eps,
                                          n)
        if x3 is not None:
            return out.reshape(shape)
    return groupnorm_silu_reference(x, scale, bias, num_groups, eps)
