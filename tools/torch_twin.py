"""PyTorch twin of the diffusers SDXL modules — a TEST ORACLE, not product code.

The reference framework's entire model layer is diffusers' known-good SDXL
(``/root/reference/src/models/sdxl.py:25-31``); its correctness is inherited
from that library.  This repo reimplements UNet/VAE/CLIP in flax, so the
proof obligation is: *a real diffusers-layout checkpoint loads and computes
the same function*.  diffusers itself is not installable in this
environment, so this module provides an independent PyTorch implementation
of the exact same architectures with the exact same ``state_dict()`` key
naming that diffusers' ``UNet2DConditionModel`` / ``AutoencoderKL`` produce
for SDXL checkpoints.  It is used by:

* ``tests/test_weight_parity.py`` — state_dict -> flax load -> activation
  diffs (fp32, tight tolerance), plus bijective key-coverage checks;
* ``tests/fixtures/`` manifest generation — full SDXL-base key/shape
  manifests enumerated on the torch ``meta`` device (no memory);
* ``tools/parity_check.py --torch`` — the torch side of the loss-curve
  parity requirement (BASELINE.md north star, ≤1% over 1k steps).

Scope notes (deliberate):
* Only the SDXL topology subset is implemented (DownBlock2D /
  CrossAttnDownBlock2D / UNetMidBlock2DCrossAttn / CrossAttnUpBlock2D /
  UpBlock2D with use_linear_projection, plus the KL autoencoder).
* Dropout modules exist only where diffusers has them (they contribute no
  parameters but their *absence* would not change state_dict keys anyway).
* Everything runs fp32 on CPU.
"""
from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F

from sdxl_training_improvements_tpu.models.unet import UNetConfig
from sdxl_training_improvements_tpu.models.vae import VAEConfig


# --------------------------------------------------------------------------
# shared pieces
# --------------------------------------------------------------------------

def timestep_embedding(timesteps: torch.Tensor, dim: int,
                       flip_sin_to_cos: bool = True,
                       downscale_freq_shift: float = 0.0,
                       max_period: float = 10000.0) -> torch.Tensor:
    """diffusers ``get_timestep_embedding`` semantics (SDXL: flip=True, shift=0)."""
    half = dim // 2
    exponent = -math.log(max_period) * torch.arange(half, dtype=torch.float32)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = torch.exp(exponent)
    args = timesteps.float()[:, None] * freqs[None, :]
    sin, cos = torch.sin(args), torch.cos(args)
    emb = torch.cat([cos, sin] if flip_sin_to_cos else [sin, cos], dim=-1)
    if dim % 2 == 1:
        emb = F.pad(emb, (0, 1))
    return emb


class TimestepEmbedding(nn.Module):
    """linear_1 -> SiLU -> linear_2 (diffusers ``TimestepEmbedding``)."""

    def __init__(self, in_dim: int, emb_dim: int):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, emb_dim)
        self.linear_2 = nn.Linear(emb_dim, emb_dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class ResnetBlock2D(nn.Module):
    """GN->SiLU->conv3x3 -> +temb -> GN->SiLU->conv3x3 -> +skip."""

    def __init__(self, in_ch: int, out_ch: int, temb_ch: int = 0,
                 groups: int = 32, eps: float = 1e-5):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, in_ch, eps=eps)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        if temb_ch:
            self.time_emb_proj = nn.Linear(temb_ch, out_ch)
        self.norm2 = nn.GroupNorm(groups, out_ch, eps=eps)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        if in_ch != out_ch:
            self.conv_shortcut = nn.Conv2d(in_ch, out_ch, 1)

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None and hasattr(self, "time_emb_proj"):
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return x + h


class Attention(nn.Module):
    """diffusers ``Attention``: q/k/v bias-free, to_out.0 linear with bias."""

    def __init__(self, dim: int, ctx_dim: int, heads: int, head_dim: int):
        super().__init__()
        inner = heads * head_dim
        self.heads, self.head_dim = heads, head_dim
        self.to_q = nn.Linear(dim, inner, bias=False)
        self.to_k = nn.Linear(ctx_dim, inner, bias=False)
        self.to_v = nn.Linear(ctx_dim, inner, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(inner, dim), nn.Dropout(0.0)])

    def forward(self, x, ctx=None):
        ctx = x if ctx is None else ctx
        b, s, _ = x.shape
        t = ctx.shape[1]
        q = self.to_q(x).view(b, s, self.heads, self.head_dim)
        k = self.to_k(ctx).view(b, t, self.heads, self.head_dim)
        v = self.to_v(ctx).view(b, t, self.heads, self.head_dim)
        logits = torch.einsum("bqhd,bkhd->bhqk", q, k) * self.head_dim ** -0.5
        probs = logits.float().softmax(dim=-1).to(v.dtype)
        out = torch.einsum("bhqk,bkhd->bqhd", probs, v)
        return self.to_out[0](out.reshape(b, s, -1))


class GEGLU(nn.Module):
    def __init__(self, dim: int, inner: int):
        super().__init__()
        self.proj = nn.Linear(dim, inner * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)  # exact erf gelu


class FeedForward(nn.Module):
    def __init__(self, dim: int, mult: int = 4):
        super().__init__()
        self.net = nn.ModuleList([
            GEGLU(dim, dim * mult), nn.Dropout(0.0), nn.Linear(dim * mult, dim)])

    def forward(self, x):
        for m in self.net:
            x = m(x)
        return x


class BasicTransformerBlock(nn.Module):
    def __init__(self, dim: int, ctx_dim: int, heads: int, head_dim: int):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = Attention(dim, dim, heads, head_dim)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = Attention(dim, ctx_dim, heads, head_dim)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = FeedForward(dim)

    def forward(self, x, ctx):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), ctx)
        x = x + self.ff(self.norm3(x))
        return x


class Transformer2DModel(nn.Module):
    """use_linear_projection=True variant (what SDXL uses)."""

    def __init__(self, ch: int, ctx_dim: int, heads: int, head_dim: int,
                 depth: int):
        super().__init__()
        self.norm = nn.GroupNorm(32, ch, eps=1e-6)
        self.proj_in = nn.Linear(ch, ch)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(ch, ctx_dim, heads, head_dim)
             for _ in range(depth)])
        self.proj_out = nn.Linear(ch, ch)

    def forward(self, x, ctx):
        b, c, h, w = x.shape
        res = x
        hx = self.norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        hx = self.proj_in(hx)
        for blk in self.transformer_blocks:
            hx = blk(hx, ctx)
        hx = self.proj_out(hx)
        return hx.reshape(b, h, w, c).permute(0, 3, 1, 2) + res


class Downsample2D(nn.Module):
    def __init__(self, ch: int):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=1)

    def forward(self, x):
        return self.conv(x)


class Upsample2D(nn.Module):
    def __init__(self, ch: int):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


# --------------------------------------------------------------------------
# UNet2DConditionModel twin (SDXL topology)
# --------------------------------------------------------------------------

class _DownBlock(nn.Module):
    """DownBlock2D (depth==0) or CrossAttnDownBlock2D."""

    def __init__(self, in_ch, out_ch, temb_ch, layers, depth, ctx_dim,
                 head_dim, groups, add_downsample):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2D(in_ch if j == 0 else out_ch, out_ch, temb_ch,
                           groups) for j in range(layers)])
        if depth > 0:
            self.attentions = nn.ModuleList(
                [Transformer2DModel(out_ch, ctx_dim, out_ch // head_dim,
                                    head_dim, depth) for _ in range(layers)])
        if add_downsample:
            self.downsamplers = nn.ModuleList([Downsample2D(out_ch)])


class _UpBlock(nn.Module):
    def __init__(self, in_chs, out_ch, temb_ch, depth, ctx_dim, head_dim,
                 groups, add_upsample):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2D(ic, out_ch, temb_ch, groups) for ic in in_chs])
        if depth > 0:
            self.attentions = nn.ModuleList(
                [Transformer2DModel(out_ch, ctx_dim, out_ch // head_dim,
                                    head_dim, depth) for _ in in_chs])
        if add_upsample:
            self.upsamplers = nn.ModuleList([Upsample2D(out_ch)])


class _MidBlock(nn.Module):
    def __init__(self, ch, temb_ch, depth, ctx_dim, head_dim, groups):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2D(ch, ch, temb_ch, groups),
             ResnetBlock2D(ch, ch, temb_ch, groups)])
        if depth > 0:
            self.attentions = nn.ModuleList(
                [Transformer2DModel(ch, ctx_dim, ch // head_dim, head_dim,
                                    depth)])


class TorchTwinUNet(nn.Module):
    """Key-for-key twin of diffusers ``UNet2DConditionModel`` (SDXL subset).

    Construction mirrors the flax ``SDXLUNet`` skip-channel bookkeeping so
    channel counts match by the same arithmetic, and forward() mirrors the
    flax forward op-for-op (in NCHW).
    """

    def __init__(self, cfg: UNetConfig):
        super().__init__()
        self.cfg = cfg
        b0 = cfg.block_out_channels[0]
        ted = cfg.time_embed_dim
        g = cfg.norm_num_groups
        hd = cfg.attention_head_dim
        ctx = cfg.cross_attention_dim

        self.conv_in = nn.Conv2d(cfg.in_channels, b0, 3, padding=1)
        self.time_embedding = TimestepEmbedding(b0, ted)
        self.add_embedding = TimestepEmbedding(
            cfg.projection_class_embeddings_input_dim, ted)

        # ---- down path, tracking the skip-channel stack
        skips = [b0]
        self.down_blocks = nn.ModuleList()
        n_stages = len(cfg.block_out_channels)
        prev = b0
        for i, ch in enumerate(cfg.block_out_channels):
            depth = cfg.transformer_layers_per_block[i]
            add_down = i < n_stages - 1
            self.down_blocks.append(
                _DownBlock(prev, ch, ted, cfg.layers_per_block, depth, ctx,
                           hd, g, add_down))
            skips += [ch] * cfg.layers_per_block
            if add_down:
                skips.append(ch)
            prev = ch

        mid_ch = cfg.block_out_channels[-1]
        self.mid_block = _MidBlock(mid_ch, ted, cfg.mid_depth, ctx, hd, g)

        # ---- up path: in-channels = prev_out + popped skip
        self.up_blocks = nn.ModuleList()
        rev_ch = list(reversed(cfg.block_out_channels))
        rev_depth = list(reversed(cfg.transformer_layers_per_block))
        prev = mid_ch
        for i, ch in enumerate(rev_ch):
            in_chs = []
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                in_chs.append((prev if j == 0 else ch) + skip)
            self.up_blocks.append(
                _UpBlock(in_chs, ch, ted, rev_depth[i], ctx, hd, g,
                         add_upsample=i < n_stages - 1))
            prev = ch

        self.conv_norm_out = nn.GroupNorm(g, b0, eps=1e-5)
        self.conv_out = nn.Conv2d(b0, cfg.out_channels, 3, padding=1)

    def forward(self, sample, timesteps, encoder_hidden_states, text_embeds,
                time_ids):
        cfg = self.cfg
        if timesteps.ndim == 0:
            timesteps = timesteps.expand(sample.shape[0])
        t_emb = timestep_embedding(timesteps, cfg.block_out_channels[0])
        emb = self.time_embedding(t_emb)
        ids_emb = timestep_embedding(time_ids.reshape(-1),
                                     cfg.addition_time_embed_dim)
        ids_emb = ids_emb.reshape(sample.shape[0], -1)
        add_in = torch.cat([text_embeds.float(), ids_emb], dim=-1)
        emb = emb + self.add_embedding(add_in)

        ctx = encoder_hidden_states
        x = self.conv_in(sample)
        skips = [x]
        for blk in self.down_blocks:
            attns = list(getattr(blk, "attentions", [])) or None
            for j, res in enumerate(blk.resnets):
                x = res(x, emb)
                if attns is not None:
                    x = attns[j](x, ctx)
                skips.append(x)
            if hasattr(blk, "downsamplers"):
                x = blk.downsamplers[0](x)
                skips.append(x)

        x = self.mid_block.resnets[0](x, emb)
        if hasattr(self.mid_block, "attentions"):
            x = self.mid_block.attentions[0](x, ctx)
        x = self.mid_block.resnets[1](x, emb)

        for blk in self.up_blocks:
            attns = list(getattr(blk, "attentions", [])) or None
            for j, res in enumerate(blk.resnets):
                x = torch.cat([x, skips.pop()], dim=1)
                x = res(x, emb)
                if attns is not None:
                    x = attns[j](x, ctx)
            if hasattr(blk, "upsamplers"):
                x = blk.upsamplers[0](x)

        x = self.conv_out(F.silu(self.conv_norm_out(x)))
        return x


# --------------------------------------------------------------------------
# AutoencoderKL twin
# --------------------------------------------------------------------------

class _VAEAttention(nn.Module):
    """Single-head VAE mid-block attention (diffusers ``Attention`` with
    ``bias=True`` q/k/v, GroupNorm, residual)."""

    def __init__(self, ch: int, groups: int):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, ch, eps=1e-6)
        self.to_q = nn.Linear(ch, ch)
        self.to_k = nn.Linear(ch, ch)
        self.to_v = nn.Linear(ch, ch)
        self.to_out = nn.ModuleList([nn.Linear(ch, ch), nn.Dropout(0.0)])

    def forward(self, x):
        b, c, h, w = x.shape
        res = x
        hx = self.group_norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        q, k, v = self.to_q(hx), self.to_k(hx), self.to_v(hx)
        logits = torch.einsum("bqc,bkc->bqk", q, k) * c ** -0.5
        probs = logits.float().softmax(dim=-1).to(v.dtype)
        out = self.to_out[0](torch.einsum("bqk,bkc->bqc", probs, v))
        return res + out.reshape(b, h, w, c).permute(0, 3, 1, 2)


class _VAEDownsample(nn.Module):
    """stride-2 conv with asymmetric (0,1)x(0,1) padding."""

    def __init__(self, ch: int):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=0)

    def forward(self, x):
        return self.conv(F.pad(x, (0, 1, 0, 1)))


class _VAEDownBlock(nn.Module):
    def __init__(self, in_ch, out_ch, layers, groups, add_downsample):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2D(in_ch if j == 0 else out_ch, out_ch, 0, groups,
                           eps=1e-6) for j in range(layers)])
        if add_downsample:
            self.downsamplers = nn.ModuleList([_VAEDownsample(out_ch)])


class _VAEUpBlock(nn.Module):
    def __init__(self, in_ch, out_ch, layers, groups, add_upsample):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2D(in_ch if j == 0 else out_ch, out_ch, 0, groups,
                           eps=1e-6) for j in range(layers)])
        if add_upsample:
            self.upsamplers = nn.ModuleList([Upsample2D(out_ch)])


class _VAEMidBlock(nn.Module):
    def __init__(self, ch, groups):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2D(ch, ch, 0, groups, eps=1e-6),
             ResnetBlock2D(ch, ch, 0, groups, eps=1e-6)])
        self.attentions = nn.ModuleList([_VAEAttention(ch, groups)])

    def forward(self, x):
        x = self.resnets[0](x)
        x = self.attentions[0](x)
        return self.resnets[1](x)


class _VAEEncoder(nn.Module):
    def __init__(self, cfg: VAEConfig):
        super().__init__()
        g = cfg.norm_num_groups
        chs = cfg.block_out_channels
        self.conv_in = nn.Conv2d(cfg.in_channels, chs[0], 3, padding=1)
        self.down_blocks = nn.ModuleList()
        prev = chs[0]
        for i, ch in enumerate(chs):
            self.down_blocks.append(
                _VAEDownBlock(prev, ch, cfg.layers_per_block, g,
                              add_downsample=i < len(chs) - 1))
            prev = ch
        self.mid_block = _VAEMidBlock(chs[-1], g)
        self.conv_norm_out = nn.GroupNorm(g, chs[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(chs[-1], 2 * cfg.latent_channels, 3,
                                  padding=1)

    def forward(self, x):
        x = self.conv_in(x)
        for blk in self.down_blocks:
            for res in blk.resnets:
                x = res(x)
            if hasattr(blk, "downsamplers"):
                x = blk.downsamplers[0](x)
        x = self.mid_block(x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class _VAEDecoder(nn.Module):
    def __init__(self, cfg: VAEConfig):
        super().__init__()
        g = cfg.norm_num_groups
        rev = list(reversed(cfg.block_out_channels))
        self.conv_in = nn.Conv2d(cfg.latent_channels, rev[0], 3, padding=1)
        self.mid_block = _VAEMidBlock(rev[0], g)
        self.up_blocks = nn.ModuleList()
        prev = rev[0]
        for i, ch in enumerate(rev):
            self.up_blocks.append(
                _VAEUpBlock(prev, ch, cfg.layers_per_block + 1, g,
                            add_upsample=i < len(rev) - 1))
            prev = ch
        self.conv_norm_out = nn.GroupNorm(g, rev[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(rev[-1], cfg.in_channels, 3, padding=1)

    def forward(self, z):
        x = self.mid_block(self.conv_in(z))
        for blk in self.up_blocks:
            for res in blk.resnets:
                x = res(x)
            if hasattr(blk, "upsamplers"):
                x = blk.upsamplers[0](x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class TorchTwinVAE(nn.Module):
    """Key-for-key twin of diffusers ``AutoencoderKL`` (SDXL VAE)."""

    def __init__(self, cfg: VAEConfig):
        super().__init__()
        self.cfg = cfg
        self.encoder = _VAEEncoder(cfg)
        self.decoder = _VAEDecoder(cfg)
        self.quant_conv = nn.Conv2d(2 * cfg.latent_channels,
                                    2 * cfg.latent_channels, 1)
        self.post_quant_conv = nn.Conv2d(cfg.latent_channels,
                                         cfg.latent_channels, 1)

    def moments(self, pixels):
        h = self.quant_conv(self.encoder(pixels))
        mean, logvar = h.chunk(2, dim=1)
        return mean, logvar.clamp(-30.0, 20.0)

    def decode(self, latents):
        return self.decoder(self.post_quant_conv(
            latents / self.cfg.scaling_factor))


# --------------------------------------------------------------------------
# DDPM loss-path twin (reference ``ddpm_trainer.py:280-401`` numerics in torch)
# --------------------------------------------------------------------------

class TorchLossTwin:
    """The reference DDPM training-step numerics, in torch, for loss-curve
    parity: Karras sigmas indexed by integer timestep (descending ramp, so
    t=0 is sigma_max — reference ``timestep_to_sigma``,
    ``novelai_v3.py:134-137``), ``add_noise = x + sigma*eps`` with the ZTSNR
    +-20000 clamp (``:111-120``), the reference's nonstandard velocity target
    ``(eps - x)/sigma`` (``:122-127``), and MinSNR weighting
    ``mse * min(snr, gamma)`` (``ddpm_trainer.py:335-345``)."""

    ZTSNR_MAX = 20000.0

    def __init__(self, num_timesteps=1000, sigma_min=0.002, sigma_max=20000.0,
                 rho=7.0, sigma_data=1.0, use_ztsnr=True,
                 prediction_type="v_prediction", min_snr_gamma=5.0):
        ramp = torch.linspace(0.0, 1.0, num_timesteps)
        min_inv = sigma_min ** (1.0 / rho)
        max_inv = sigma_max ** (1.0 / rho)
        self.sigmas = (max_inv + ramp * (min_inv - max_inv)) ** rho
        self.sigma_data = sigma_data
        self.use_ztsnr = use_ztsnr
        self.prediction_type = prediction_type
        self.min_snr_gamma = min_snr_gamma

    def _sigma(self, t):
        return self.sigmas[t].view(-1, 1, 1, 1)

    def add_noise(self, x, noise, t):
        noisy = x + self._sigma(t) * noise
        if self.use_ztsnr:
            noisy = noisy.clamp(-self.ZTSNR_MAX, self.ZTSNR_MAX)
        return noisy

    def get_velocity(self, x, noise, t):
        return (noise - x) / self._sigma(t)

    def min_snr_weight(self, t):
        snr = (self.sigma_data / self.sigmas[t]) ** 2
        if self.min_snr_gamma is None:
            return torch.ones_like(snr)
        return snr.clamp(max=self.min_snr_gamma)

    @staticmethod
    def _finite_guard(loss):
        # reference finite guard (ddpm_trainer.py:379-384): non-finite ->
        # 1000.0, else clamp(max=1000) — clamping also zeroes the gradient
        if not torch.isfinite(loss):
            return torch.tensor(1000.0, dtype=loss.dtype)
        return loss.clamp(max=1000.0)

    def loss(self, unet, batch, noise, timesteps):
        x = batch["vae_latents"].float()
        noisy = self.add_noise(x, noise, timesteps)
        pred = unet(noisy, timesteps.float(), batch["prompt_embeds"],
                    batch["pooled_prompt_embeds"], batch["time_ids"]).float()
        if self.prediction_type == "v_prediction":
            target = self.get_velocity(x, noise, timesteps)
        else:
            target = noise
        mse = (pred - target) ** 2
        w = self.min_snr_weight(timesteps).view(-1, 1, 1, 1)
        return self._finite_guard((mse * w).mean())

    def flow_matching_loss(self, unet, batch, x0, t):
        """Reference flow-matching numerics
        (``flow_matching_trainer.py:267-352,373-419``) minus its
        double-forward defect: xt=(1-t)x0+t*x1, v_true=x1-x0, per-sample
        CHW-mean MSE -> batch mean.  ``t`` in [0,1] is passed to the UNet
        directly as the timestep (reference behaviour)."""
        x1 = batch["vae_latents"].float()
        tb = t.view(-1, 1, 1, 1)
        xt = (1.0 - tb) * x0 + tb * x1
        v_pred = unet(xt, t, batch["prompt_embeds"],
                      batch["pooled_prompt_embeds"],
                      batch["time_ids"]).float()
        per_sample = ((v_pred - (x1 - x0)) ** 2).mean(dim=(1, 2, 3))
        return self._finite_guard(per_sample.mean())


# --------------------------------------------------------------------------
# manifest helpers
# --------------------------------------------------------------------------

def state_dict_manifest(module: nn.Module):
    """{key: shape-list} for every tensor in the twin's state dict."""
    return {k: list(v.shape) for k, v in module.state_dict().items()}


def build_unet_manifest(cfg=None):
    """Full SDXL UNet key manifest on the meta device (no memory)."""
    with torch.device("meta"):
        return state_dict_manifest(TorchTwinUNet(cfg or UNetConfig.sdxl()))


def build_vae_manifest(cfg=None):
    with torch.device("meta"):
        return state_dict_manifest(TorchTwinVAE(cfg or VAEConfig.sdxl()))
