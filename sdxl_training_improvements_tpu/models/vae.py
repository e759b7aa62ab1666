"""AutoencoderKL (SDXL VAE) as flax.linen modules, fp32.

Replaces the reference's diffusers VAE usage (``src/models/encoders/vae.py``):
the VAE is forced to fp32 for numerical stability (``vae.py:23``) and latents
are ``encode(x).latent_dist.sample() * scaling_factor`` (``vae.py:46-48``,
scaling_factor 0.13025 for the SDXL VAE).  NHWC internally; NCHW at the
boundary.  The decoder exists for validation image generation
(``src/training/validation.py`` surface).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from sdxl_training_improvements_tpu.models.layers import GroupNorm, ResnetBlock2D

SDXL_VAE_SCALING_FACTOR = 0.13025


@dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = SDXL_VAE_SCALING_FACTOR

    @classmethod
    def sdxl(cls) -> "VAEConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "VAEConfig":
        return cls(block_out_channels=(16, 32), layers_per_block=1,
                   norm_num_groups=8)

    @property
    def downscale_factor(self) -> int:
        """Pixel->latent spatial factor (8 for SDXL's 4-stage encoder)."""
        return 2 ** (len(self.block_out_channels) - 1)


class VAEAttention(nn.Module):
    """Single-head spatial self-attention (diffusers VAE mid-block attention)."""

    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    num_groups: int = 32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        res = x
        hx = GroupNorm(self.num_groups, 1e-6, name="group_norm")(x)
        hx = hx.reshape(b, h * w, c)
        dense = lambda n: nn.Dense(c, dtype=self.dtype,
                                   param_dtype=self.param_dtype, name=n)
        q, k, v = dense("to_q")(hx), dense("to_k")(hx), dense("to_v")(hx)
        logits = jnp.einsum("bqc,bkc->bqk", q, k,
                            preferred_element_type=jnp.float32) * (c ** -0.5)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bqk,bkc->bqc", probs.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        out = dense("to_out_0")(out.astype(x.dtype))
        return res + out.reshape(b, h, w, c)


class _DownsampleVAE(nn.Module):
    """stride-2 conv with the VAE's asymmetric (0,1)x(0,1) padding."""

    channels: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, [(0, 0), (0, 1), (0, 1), (0, 0)])
        return nn.Conv(self.channels, (3, 3), strides=(2, 2), padding="VALID",
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       name="conv")(x)


class _UpsampleVAE(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")
        return nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="conv")(x)


class VAEEncoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels_nhwc):
        cfg = self.config
        g = cfg.norm_num_groups
        res = lambda ch, n: ResnetBlock2D(out_channels=ch, emb_dim=None,
                                          num_groups=g, eps=1e-6,
                                          dtype=self.dtype,
                                          param_dtype=self.param_dtype, name=n)
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="conv_in")(pixels_nhwc)
        n_stages = len(cfg.block_out_channels)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                x = res(ch, f"down_blocks_{i}_resnets_{j}")(x)
            if i < n_stages - 1:
                x = _DownsampleVAE(ch, self.dtype, self.param_dtype,
                                   name=f"down_blocks_{i}_downsamplers_0")(x)
        mid_ch = cfg.block_out_channels[-1]
        x = res(mid_ch, "mid_block_resnets_0")(x)
        x = VAEAttention(self.dtype, self.param_dtype, g,
                         name="mid_block_attentions_0")(x)
        x = res(mid_ch, "mid_block_resnets_1")(x)
        x = GroupNorm(g, 1e-6, name="conv_norm_out")(x)
        x = nn.silu(x)
        x = nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="conv_out")(x)
        return x  # [B, H/8, W/8, 2*latent]


class VAEDecoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z_nhwc):
        cfg = self.config
        g = cfg.norm_num_groups
        res = lambda ch, n: ResnetBlock2D(out_channels=ch, emb_dim=None,
                                          num_groups=g, eps=1e-6,
                                          dtype=self.dtype,
                                          param_dtype=self.param_dtype, name=n)
        rev = list(reversed(cfg.block_out_channels))
        x = nn.Conv(rev[0], (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv_in")(z_nhwc)
        x = res(rev[0], "mid_block_resnets_0")(x)
        x = VAEAttention(self.dtype, self.param_dtype, g,
                         name="mid_block_attentions_0")(x)
        x = res(rev[0], "mid_block_resnets_1")(x)
        n_stages = len(rev)
        for i, ch in enumerate(rev):
            for j in range(cfg.layers_per_block + 1):
                x = res(ch, f"up_blocks_{i}_resnets_{j}")(x)
            if i < n_stages - 1:
                x = _UpsampleVAE(ch, self.dtype, self.param_dtype,
                                 name=f"up_blocks_{i}_upsamplers_0")(x)
        x = GroupNorm(g, 1e-6, name="conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(cfg.in_channels, (3, 3), padding=1, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="conv_out")(x)


class AutoencoderKL(nn.Module):
    """Encoder + quant convs + decoder with diagonal-gaussian sampling."""

    config: VAEConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = VAEEncoder(self.config, self.dtype, self.param_dtype)
        self.decoder = VAEDecoder(self.config, self.dtype, self.param_dtype)
        self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1),
                                  dtype=self.dtype, param_dtype=self.param_dtype,
                                  name="quant_conv")
        self.post_quant_conv = nn.Conv(self.config.latent_channels, (1, 1),
                                       dtype=self.dtype,
                                       param_dtype=self.param_dtype,
                                       name="post_quant_conv")

    def moments(self, pixels_nchw):
        """[B,3,H,W] in [-1,1] -> (mean, logvar) each [B,latent,H/8,W/8]."""
        x = jnp.transpose(pixels_nchw.astype(self.dtype), (0, 2, 3, 1))
        h = self.quant_conv(self.encoder(x))
        h = jnp.transpose(h, (0, 3, 1, 2))
        mean, logvar = jnp.split(h, 2, axis=1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(self, pixels_nchw, rng, sample: bool = True):
        """Sampled, scaled latents — reference ``encode_images`` semantics
        (``vae.py:46-48``): ``latent_dist.sample() * scaling_factor``."""
        mean, logvar = self.moments(pixels_nchw)
        if sample:
            std = jnp.exp(0.5 * logvar)
            mean = mean + std * jax.random.normal(rng, mean.shape, dtype=mean.dtype)
        return mean * self.config.scaling_factor

    def decode(self, latents_nchw):
        z = latents_nchw / self.config.scaling_factor
        z = jnp.transpose(z.astype(self.dtype), (0, 2, 3, 1))
        out = self.decoder(self.post_quant_conv(z))
        return jnp.transpose(out, (0, 3, 1, 2))

    def __call__(self, pixels_nchw, rng):
        latents = self.encode(pixels_nchw, rng)
        return self.decode(latents)
