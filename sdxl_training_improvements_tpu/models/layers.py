"""Shared flax.linen building blocks for the SDXL UNet / VAE.

All spatial tensors are NHWC (TPU-native conv layout; the NCHW↔NHWC
transpose happens once at the model boundary).  Norms run in float32 and cast
back to the compute dtype; matmuls/convs run in the policy compute dtype on
the MXU.

Module names deliberately mirror the diffusers parameter tree (conv1,
time_emb_proj, attn1, ff, proj_in, …) so HF safetensors checkpoints map onto
the flax param tree by name translation alone (see ``models/weights.py``).
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from sdxl_training_improvements_tpu.ops.attention import dot_product_attention
from sdxl_training_improvements_tpu.ops.groupnorm import (
    groupnorm_silu, norm_arith_bf16_enabled)


def timestep_embedding(timesteps: jnp.ndarray, dim: int,
                       flip_sin_to_cos: bool = True,
                       downscale_freq_shift: float = 0.0,
                       max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal timestep embedding, fp32.

    Matches the standard DDPM embedding used by SDXL (flip_sin_to_cos=True,
    freq_shift=0): exponent = -ln(P) * arange(half)/(half - shift).
    """
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, [(0, 0), (0, 1)])
    return emb


class TimestepEmbedding(nn.Module):
    """linear_1 → SiLU → linear_2 (diffusers ``TimestepEmbedding``)."""

    emb_dim: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.emb_dim, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="linear_1")(x)
        x = nn.silu(x)
        x = nn.Dense(self.emb_dim, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="linear_2")(x)
        return x


def group_norm(x, scale, bias, num_groups: int = 32, eps: float = 1e-5):
    """GroupNorm over NHWC (or [B, S, C]): statistics in fp32, the
    normalization applied in the input dtype.

    Written explicitly (rather than nn.GroupNorm) so the fused Pallas
    GroupNorm-SiLU kernel can swap in with identical semantics.

    bf16 inputs under ``ops.groupnorm.norm_arith_bf16`` (the remat
    production path): the mean/var reductions run in fp32 but as *fused*
    reductions over the bf16 input (E[x²]−E[x]² form, single pass
    each — no fp32 copy of the activation is ever materialised), and the
    normalize/affine arithmetic stays bf16.  The train step is HBM-bound
    (242 GB/step at 1024² batch 1, docs/performance.md "Step profile");
    the old all-fp32 norm interior made every norm's autodiff residual
    (x̂ and friends) a 2× fp32 tensor — measured −3.5% on the remat b4
    literal step, +1.5% without remat, hence the trace-time gate.  fp32
    inputs keep the original two-pass fp32 computation bit-for-bit
    (parity harnesses run fp32).
    """
    orig_dtype = x.dtype
    c = x.shape[-1]
    spatial = x.shape[1:-1]
    g = num_groups
    xg = x.reshape(x.shape[0], -1, g, c // g)
    x32 = xg.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 3), keepdims=True)
    if orig_dtype == jnp.bfloat16 and norm_arith_bf16_enabled():
        # single-pass stats; backward of E[x²] reads only the bf16 input
        var = jnp.maximum(
            jnp.mean(jnp.square(x32), axis=(1, 3), keepdims=True)
            - jnp.square(mean), 0.0)
        mul = jax.lax.rsqrt(var + eps)
        xhat = (xg - mean.astype(orig_dtype)) * mul.astype(orig_dtype)
        y = xhat.reshape(x.shape[0], *spatial, c)
        return y * scale.astype(orig_dtype) + bias.astype(orig_dtype)
    # gate OFF: the original all-fp32 interior, bit-for-bit (normalize,
    # affine, THEN the single cast back) for every input dtype
    var = jnp.var(x32, axis=(1, 3), keepdims=True)
    xg32 = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y32 = xg32.reshape(x.shape[0], *spatial, c)
    y32 = y32 * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y32.astype(orig_dtype)


class GroupNorm(nn.Module):
    num_groups: int = 32
    eps: float = 1e-5
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
        return group_norm(x, scale, bias, self.num_groups, self.eps)


class GroupNormSiLU(nn.Module):
    """GroupNorm fused with SiLU (Pallas kernel when enabled — the
    north-star fused resblock epilogue; ``ops/groupnorm.py``).  Param names
    match plain GroupNorm so checkpoints are interchangeable."""

    num_groups: int = 32
    eps: float = 1e-5
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
        return groupnorm_silu(x, scale, bias, self.num_groups, self.eps)


class ResnetBlock2D(nn.Module):
    """GN→SiLU→conv3x3 → +time-emb → GN→SiLU→conv3x3 → +skip (diffusers layout)."""

    out_channels: int
    emb_dim: Optional[int] = None  # None = no time embedding (VAE blocks)
    num_groups: int = 32
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, emb=None):
        # "res_conv"/"gn_silu" names feed the size-thresholded remat save
        # policies (models/unet.py): conv outputs and fused-GN outputs are
        # custom-VJP/conv primitives the dot policies can't see, yet in the
        # deep (32^2) stage they are ~10 MB bf16 each and their recompute
        # is conv FLOPs + a full normalization reduction.  No-ops outside
        # jax.checkpoint.
        in_ch = x.shape[-1]
        h = GroupNormSiLU(self.num_groups, self.eps, name="norm1")(x)
        h = checkpoint_name(h, "gn_silu")
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv1")(h)
        h = checkpoint_name(h, "res_conv")
        if emb is not None:
            emb_out = nn.Dense(self.out_channels, dtype=self.dtype,
                               param_dtype=self.param_dtype,
                               name="time_emb_proj")(nn.silu(emb))
            h = h + emb_out[:, None, None, :]
        h = GroupNormSiLU(self.num_groups, self.eps, name="norm2")(h)
        h = checkpoint_name(h, "gn_silu")
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv2")(h)
        h = checkpoint_name(h, "res_conv")
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        param_dtype=self.param_dtype, name="conv_shortcut")(x)
        return x + h


class Attention(nn.Module):
    """Multi-head attention (self when context is None, else cross).

    qkv projections have no bias, output projection has bias — diffusers'
    ``Attention`` convention, so SDXL weights load directly.
    """

    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.bfloat16
    attn_impl: str = "auto"  # ops/attention.py dispatch (auto|xla|chunked|flash)
    # "auto" chunk threshold (MB); None -> the 64 MB no-remat default.
    # The UNet passes 512 under remat (ops/attention.py module docstring).
    attn_chunk_mb: Optional[int] = None

    @nn.compact
    def __call__(self, x, context=None):
        ctx = x if context is None else context
        inner = self.num_heads * self.head_dim
        dense = lambda n, feats, bias: nn.Dense(
            feats, use_bias=bias, dtype=self.dtype, param_dtype=self.param_dtype,
            name=n)
        q = dense("to_q", inner, False)(x)
        k = dense("to_k", inner, False)(ctx)
        v = dense("to_v", inner, False)(ctx)
        b, s, _ = q.shape
        t = k.shape[1]
        q = q.reshape(b, s, self.num_heads, self.head_dim)
        k = k.reshape(b, t, self.num_heads, self.head_dim)
        v = v.reshape(b, t, self.num_heads, self.head_dim)
        out = dot_product_attention(q, k, v, impl=self.attn_impl,
                                    chunk_mb=self.attn_chunk_mb)
        # named for the "dots_small_attn" remat policy (models/unet.py):
        # saving the SELF-attention core output (~10-20 MB bf16 per layer
        # at batch 4 @1024^2) lets the remat backward skip re-running the
        # S^2 attention forward — the expensive recompute — while the
        # chunked custom VJP still rebuilds probabilities blockwise inside
        # its own backward.  Cross-attention cores ("attn_core_cross", NOT
        # in the policy's save set) are cheap to recompute — the 77-token
        # scores are [S,77] ~ 25 MB fp32 vs 320 MB+ for self-attention —
        # and saving them too overflowed the 16 GB chip by 175 MB at
        # batch 4 @1024^2 (measured 2026-08-19).  A no-op outside
        # jax.checkpoint.
        out = checkpoint_name(
            out, "attn_core" if context is None else "attn_core_cross")
        out = out.reshape(b, s, inner)
        return dense("to_out_0", inner, True)(out)


class GEGLU(nn.Module):
    inner_dim: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.inner_dim * 2, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        # exact (erf) gelu: diffusers' GEGLU uses F.gelu, not the tanh
        # approximation that is flax's default (fp32 for erf accuracy)
        return h * nn.gelu(gate.astype(jnp.float32),
                           approximate=False).astype(h.dtype)


class FeedForward(nn.Module):
    """GEGLU → Dense (diffusers ``FeedForward`` with geglu activation)."""

    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = GEGLU(self.dim * self.mult, self.dtype, self.param_dtype, name="net_0")(x)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
                        name="net_2")(h)


class LayerNormF32(nn.Module):
    """LayerNorm with fp32 statistics (params fp32), output in input dtype.

    Same residual-dtype policy as ``group_norm``: bf16 inputs keep the
    normalize/affine arithmetic (and therefore the autodiff residuals) in
    bf16 with fused single-pass fp32 stats; fp32 inputs keep the original
    all-fp32 computation bit-for-bit."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        dt = x.dtype
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        if dt == jnp.bfloat16 and norm_arith_bf16_enabled():
            var = jnp.maximum(
                jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
                - jnp.square(mean), 0.0)
            mul = jax.lax.rsqrt(var + self.eps)
            y = ((x - mean.astype(dt)) * mul.astype(dt) * scale.astype(dt)
                 + bias.astype(dt))
        else:
            var = jnp.var(xf, axis=-1, keepdims=True)
            y = ((xf - mean) * jax.lax.rsqrt(var + self.eps) * scale
                 + bias).astype(dt)
        return y


class BasicTransformerBlock(nn.Module):
    """LN→self-attn → LN→cross-attn → LN→FF, each residual (diffusers layout)."""

    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.bfloat16
    attn_impl: str = "auto"
    attn_chunk_mb: Optional[int] = None

    @nn.compact
    def __call__(self, x, context):
        attn = lambda n: Attention(self.num_heads, self.head_dim, self.dtype,
                                   self.param_dtype, self.attn_impl,
                                   self.attn_chunk_mb, name=n)
        x = x + attn("attn1")(LayerNormF32(name="norm1")(x))
        x = x + attn("attn2")(LayerNormF32(name="norm2")(x), context)
        dim = self.num_heads * self.head_dim
        x = x + FeedForward(dim, 4, self.dtype, self.param_dtype,
                            name="ff")(LayerNormF32(name="norm3")(x))
        return x


class Transformer2DModel(nn.Module):
    """Spatial transformer: GN → linear proj_in → N blocks → proj_out → +res.

    use_linear_projection=True variant (what SDXL uses).
    """

    num_heads: int
    head_dim: int
    depth: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.bfloat16
    attn_impl: str = "auto"
    attn_chunk_mb: Optional[int] = None

    @nn.compact
    def __call__(self, x, context):
        b, h, w, c = x.shape
        residual = x
        hx = GroupNorm(32, 1e-6, name="norm")(x)
        hx = hx.reshape(b, h * w, c)
        hx = nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype,
                      name="proj_in")(hx)
        for i in range(self.depth):
            hx = BasicTransformerBlock(
                self.num_heads, self.head_dim, self.dtype, self.param_dtype,
                self.attn_impl, self.attn_chunk_mb,
                name=f"transformer_blocks_{i}")(hx, context)
        hx = nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype,
                      name="proj_out")(hx)
        return hx.reshape(b, h, w, c) + residual


class Downsample2D(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.channels, (3, 3), strides=(2, 2), padding=1,
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       name="conv")(x)


class Upsample2D(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="conv")(x)
