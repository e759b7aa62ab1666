"""SDXL UNet as a flax.linen module — TPU-first re-design.

Functional parity target: the diffusers ``UNet2DConditionModel`` that the
reference fine-tunes (loaded at ``src/models/sdxl.py:25-31``; called with
``added_cond_kwargs={text_embeds, time_ids}`` at
``ddpm_trainer.py:314-325``).  Design differences from the torch original:

* NHWC activations everywhere (TPU conv layout); the NCHW boundary transpose
  happens in ``__call__``.
* bf16 params/compute with fp32 norms and fp32 softmax via the dtype policy.
* Attention dispatches per shape: bounded-memory chunked XLA for large
  score tensors, monolithic XLA otherwise; the Pallas flash kernel is
  explicit opt-in after it measured no faster fwd+bwd on native v5e
  (``ops/attention.py``).
* Optional ``remat`` checkpoints every resnet/transformer block —
  the TPU analogue of the reference's ``enable_gradient_checkpointing``
  (``flow_matching_trainer.py:59-66``).
* Static shapes + python-level (unrolled) block loops: everything under one
  ``jit``, one executable per latent resolution (bucket).

Param-tree names mirror diffusers keys (down_blocks_0/resnets_0/conv1, …) so
HF SDXL safetensors load by pure name translation (``models/weights.py``).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from sdxl_training_improvements_tpu.models.layers import (
    Downsample2D, GroupNormSiLU, ResnetBlock2D, TimestepEmbedding,
    Transformer2DModel, Upsample2D, timestep_embedding)
from sdxl_training_improvements_tpu.ops.groupnorm import norm_arith_bf16


def _small_saves_policy(max_out_elements: int = 8 * 1024 * 1024,
                        small_names: Tuple[str, ...] = (),
                        always_names: Tuple[str, ...] = (),
                        names_max_out_elements: Optional[int] = None,
                        dots: bool = True,
                        name_thresholds: Optional[dict] = None):
    """Remat policy: small non-batched dots + size-thresholded NAMED saves.

    ``_small_dots_policy``'s prim matching only sees ``dot_general`` — conv
    outputs and the fused-GN custom-VJP outputs are invisible to it, yet in
    the deep (32^2) stage they are ~10 MB bf16 each while their recompute
    costs conv FLOPs / a full normalization pass.  ``layers.py`` names them
    ("res_conv", "gn_silu", "attn_core"); this policy saves a named value
    when its size is under the same element threshold (``small_names``) or
    unconditionally (``always_names``) — the 64^2/128^2-stage instances of
    the same names stay rematerialised exactly like the big dots.
    """
    dots_policy = _small_dots_policy(max_out_elements) if dots else None
    names_max = names_max_out_elements or max_out_elements

    def policy(prim, *avals, **params) -> bool:
        if prim.name == "name":
            n = params.get("name")
            if n in always_names:
                return True
            cap = (name_thresholds or {}).get(
                n, names_max if n in small_names else None)
            if cap is not None:
                out = 1
                for d in avals[0].shape:
                    out *= d
                return out <= cap
            return False
        if dots_policy is None:
            return False
        return dots_policy(prim, *avals, **params)
    return policy


def _small_dots_policy(max_out_elements: int = 8 * 1024 * 1024):
    """Remat policy: save non-batched dot outputs only when SMALL.

    ``dots_with_no_batch_dims_saveable`` keeps every projection/FF output;
    at batch 4 @1024^2 that is ~9 GB of saves and OOMs the 16 GB chip by
    2.6 GB (measured, tools/measure_r3.py, 2026-08-17).  Full remat fits but pays
    the full ~18% recompute tax.  The FLOP/byte asymmetry across the UNet
    resolves this: the deep 32^2 stage holds ~60% of all FLOPs in
    projections/FF whose outputs are only ~10 MB each, while the 64^2
    stage's dot outputs are 2-4x larger per tensor and a fraction of the
    FLOPs.  Saving only dots below ``max_out_elements`` (default 8M
    elements = 16 MB bf16) keeps the expensive-to-recompute/cheap-to-store
    saves and drops the big ones — at batch 1 it behaves like
    ``dots_nobatch``; at batch 4 it auto-fits in HBM.  Attention score
    einsums carry batch dims and are never saved (the chunked/flash
    backward recomputes them blockwise).
    """
    def policy(prim, *avals, **params) -> bool:
        if prim.name != "dot_general":
            return False
        (lhs_c, rhs_c), (lhs_b, rhs_b) = params["dimension_numbers"]
        if lhs_b or rhs_b:
            return False
        lhs, rhs = avals[0], avals[1]
        out = 1
        for i, d in enumerate(lhs.shape):
            if i not in lhs_c:
                out *= d
        for i, d in enumerate(rhs.shape):
            if i not in rhs_c:
                out *= d
        return out <= max_out_elements
    return policy


@dataclass(frozen=True)
class UNetConfig:
    """Architecture hyperparameters. ``sdxl()`` is the flagship config."""

    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280)
    layers_per_block: int = 2
    # transformer depth per stage; 0 = plain resnet stage (SDXL: first stage
    # has no attention)
    transformer_layers_per_block: Tuple[int, ...] = (0, 2, 10)
    attention_head_dim: int = 64
    cross_attention_dim: int = 2048
    addition_time_embed_dim: int = 256
    # pooled text (1280) + 6 time-ids * 256 = 2816 for SDXL
    projection_class_embeddings_input_dim: int = 2816
    # SDXL micro-conditioning ids: 6 for base/inpainting
    # [orig_w, orig_h, crop_t, crop_l, tgt_w, tgt_h], 5 for the refiner
    # [orig_w, orig_h, crop_t, crop_l, aesthetic_score]
    num_time_ids: int = 6
    # transformer depth of the mid block; None = transformer_layers_per_
    # block[-1] (the SDXL-base coincidence).  Decoupled because a topology
    # can end its down path with a plain (attention-free) stage while the
    # mid block still carries cross-attention — diffusers always builds
    # UNetMidBlock2DCrossAttn from transformer_layers_per_block[-1]
    # regardless of the last down block's type.
    mid_block_transformer_layers: Optional[int] = None
    norm_num_groups: int = 32
    remat: bool = True
    # "full": recompute everything in the block (min memory);
    # "dots": jax.checkpoint_policies.dots_saveable — matmul/conv outputs
    # are kept, only cheap elementwise work is recomputed (the middle
    # ground between remat on/off: ~the memory win at a fraction of the
    # 16% recompute tax, docs/performance.md)
    remat_policy: str = "full"
    # attention implementation (ops/attention.py): auto = flash when the
    # Mosaic probe says native, chunked when the score tensor is huge, xla
    # otherwise
    attn_impl: str = "auto"
    # "auto" chunk threshold override (MB); None -> remat-aware default
    # (512 under remat, 64 otherwise — see ops/attention.py docstring)
    attn_chunk_mb: Optional[int] = None
    # bf16 norm interior (ops/groupnorm.py::norm_arith_bf16): None = auto
    # (ON iff remat — measured −3.5% on the remat literal step, +1.5%
    # without remat, tools/measure_r3.py 2026-08-20); True/False forces
    norm_bf16_arith: Optional[bool] = None

    @classmethod
    def sdxl(cls, **kw) -> "UNetConfig":
        return cls(**kw)

    @classmethod
    def sdxl_inpainting(cls, **kw) -> "UNetConfig":
        """SDXL-base topology with the 9-channel inpainting input:
        [noisy latents (4), mask (1), masked-image latents (4)] — the
        layout of ``diffusers/stable-diffusion-xl-1.0-inpainting-0.1``.
        Only ``conv_in`` differs from base."""
        kw.setdefault("in_channels", 9)
        return cls(**kw)

    @classmethod
    def sdxl_refiner(cls, **kw) -> "UNetConfig":
        """SDXL-refiner-1.0 topology (best-known defaults; when loading a
        checkpoint the authoritative source is its ``unet/config.json`` via
        :meth:`from_diffusers_config`, which overrides all of this):
        4 stages [384, 768, 1536, 1536], cross-attention (depth 4, dim
        1280 = CLIP-G only) in the middle two stages and the mid block,
        plain first/last stages, and 5 conditioning ids (aesthetic score
        replaces target size)."""
        defaults = dict(
            block_out_channels=(384, 768, 1536, 1536),
            transformer_layers_per_block=(0, 4, 4, 0),
            mid_block_transformer_layers=4,
            cross_attention_dim=1280,
            # pooled CLIP-G 1280 + 5 ids * 256
            projection_class_embeddings_input_dim=2560,
            num_time_ids=5,
        )
        defaults.update(kw)
        return cls(**defaults)

    @classmethod
    def from_diffusers_config(cls, cfg: dict, **overrides) -> "UNetConfig":
        """Build from a diffusers ``unet/config.json`` dict — the
        authoritative topology source when fine-tuning a checkpoint
        (base / inpainting / refiner / any conditioned variant).

        Field semantics follow diffusers ``UNet2DConditionModel``:

        * ``down_block_types`` decides which stages carry cross-attention
          ("DownBlock2D" = plain); ``transformer_layers_per_block`` (int or
          per-stage list) gives the depth of the attending stages.
        * The mid block is ``UNetMidBlock2DCrossAttn`` with depth
          ``transformer_layers_per_block[-1]`` even when the last down
          stage is plain.
        * SDXL checkpoints store the per-stage head COUNT in
          ``attention_head_dim`` (a historical diffusers quirk; the real
          head dim is ``channels / heads``, constant 64 across the family).
        * ``num_time_ids`` is derived from
          ``projection_class_embeddings_input_dim`` = pooled_dim +
          num_ids * addition_time_embed_dim (pooled CLIP-G = 1280).

        Unsupported conditioning modes raise instead of silently building
        the wrong network.
        """
        def req(key, want):
            got = cfg.get(key, want)
            if got != want and not (want is None and got is None):
                raise ValueError(
                    f"unsupported diffusers UNet config: {key}={got!r} "
                    f"(supported: {want!r})")

        req("addition_embed_type", "text_time")
        req("class_embed_type", None)
        req("encoder_hid_dim", None)
        req("dual_cross_attention", False)
        req("mid_block_type", "UNetMidBlock2DCrossAttn")
        if isinstance(cfg.get("layers_per_block", 2), (list, tuple)):
            raise ValueError("per-stage layers_per_block unsupported")

        channels = tuple(cfg["block_out_channels"])
        n = len(channels)
        down_types = cfg.get("down_block_types",
                             ("DownBlock2D",) + ("CrossAttnDownBlock2D",)
                             * (n - 1))
        if len(down_types) != n:
            raise ValueError("down_block_types length != block_out_channels")
        for t in down_types:
            if t not in ("DownBlock2D", "CrossAttnDownBlock2D"):
                raise ValueError(f"unsupported down block type {t!r}")
        tfm = cfg.get("transformer_layers_per_block", 1)
        tfm_list = list(tfm) if isinstance(tfm, (list, tuple)) else [tfm] * n
        if len(tfm_list) != n:
            raise ValueError(
                "transformer_layers_per_block length != block_out_channels")
        depths = tuple(
            tfm_list[i] if down_types[i] == "CrossAttnDownBlock2D" else 0
            for i in range(n))

        head_dim = cfg.get("attention_head_dim", 64)
        if isinstance(head_dim, (list, tuple)):
            # per-stage head counts (SDXL convention): recover the constant
            # true head dim
            dims = {channels[i] // head_dim[i]
                    for i in range(n) if depths[i] > 0}
            if len(dims) != 1:
                raise ValueError(
                    f"non-constant head dim {sorted(dims)} from "
                    f"attention_head_dim={head_dim}; unsupported")
            head_dim = dims.pop()

        add_dim = cfg.get("addition_time_embed_dim", 256)
        proj = cfg["projection_class_embeddings_input_dim"]
        # CLIP-G pooled width across the SDXL family; our own exports carry
        # the exact value as an extension key (tiny test topologies differ)
        pooled = cfg.get("_pooled_embed_dim", 1280)
        if (proj - pooled) % add_dim or proj <= pooled:
            raise ValueError(
                f"cannot derive num_time_ids from projection dim {proj} "
                f"(pooled {pooled}, addition_time_embed_dim {add_dim})")

        kw = dict(
            in_channels=cfg.get("in_channels", 4),
            out_channels=cfg.get("out_channels", 4),
            block_out_channels=channels,
            layers_per_block=cfg.get("layers_per_block", 2),
            transformer_layers_per_block=depths,
            mid_block_transformer_layers=tfm_list[-1],
            attention_head_dim=head_dim,
            cross_attention_dim=cfg.get("cross_attention_dim", 1280),
            addition_time_embed_dim=add_dim,
            projection_class_embeddings_input_dim=proj,
            num_time_ids=(proj - pooled) // add_dim,
            norm_num_groups=cfg.get("norm_num_groups", 32),
        )
        kw.update(overrides)
        return cls(**kw)

    def to_diffusers_config(self) -> dict:
        """Inverse of :meth:`from_diffusers_config`: the diffusers
        ``unet/config.json`` dict describing this topology, written by
        ``export_diffusers`` so (a) diffusers can load our exports directly
        and (b) our own loaders can rebuild variant topologies
        (refiner/inpainting) from any checkpoint without out-of-band flags.

        ``attention_head_dim`` is written per-stage as the HEAD COUNT of
        attending stages (the SDXL-family convention diffusers expects);
        ``_pooled_embed_dim`` is an extension key carrying the exact pooled
        width (diffusers ignores underscore keys)."""
        n = len(self.block_out_channels)
        down_types = ["CrossAttnDownBlock2D" if d > 0 else "DownBlock2D"
                      for d in self.transformer_layers_per_block]
        # per-stage head counts; plain stages get a structurally-valid
        # placeholder (their entry is never consulted)
        head_counts = [max(1, c // self.attention_head_dim)
                       for c in self.block_out_channels]
        tfm = [d if d > 0 else self.mid_depth
               for d in self.transformer_layers_per_block]
        # the mid block reads transformer_layers_per_block[-1]; keep that
        # slot authoritative for the mid depth (diffusers semantics)
        last = self.transformer_layers_per_block[-1]
        if last > 0 and last != self.mid_depth:
            raise ValueError(
                "diffusers cannot represent an attending last down stage "
                f"(depth {last}) with a different mid-block depth "
                f"({self.mid_depth}) — both read "
                "transformer_layers_per_block[-1]")
        tfm[-1] = self.mid_depth
        return {
            "_class_name": "UNet2DConditionModel",
            "in_channels": self.in_channels,
            "out_channels": self.out_channels,
            "block_out_channels": list(self.block_out_channels),
            "down_block_types": down_types,
            "up_block_types": ["UpBlock2D" if d == 0 else "CrossAttnUpBlock2D"
                               for d in reversed(
                                   self.transformer_layers_per_block)],
            "layers_per_block": self.layers_per_block,
            "transformer_layers_per_block": tfm,
            "attention_head_dim": head_counts,
            "cross_attention_dim": self.cross_attention_dim,
            "addition_embed_type": "text_time",
            "addition_time_embed_dim": self.addition_time_embed_dim,
            "projection_class_embeddings_input_dim":
                self.projection_class_embeddings_input_dim,
            "norm_num_groups": self.norm_num_groups,
            "mid_block_type": "UNetMidBlock2DCrossAttn",
            "sample_size": 128,
            "_pooled_embed_dim": self.pooled_embed_dim,
        }

    @classmethod
    def tiny(cls, **kw) -> "UNetConfig":
        """CPU-testable miniature with the same topology."""
        defaults = dict(
            block_out_channels=(32, 64, 128),
            layers_per_block=1,
            transformer_layers_per_block=(0, 1, 1),
            attention_head_dim=16,
            cross_attention_dim=64,
            addition_time_embed_dim=8,
            # pooled 32 = tiny CLIP-G projection_dim (clip.CLIPTextConfig.tiny)
            projection_class_embeddings_input_dim=32 + 6 * 8,
            remat=False,
            attn_impl="xla",
        )
        defaults.update(kw)
        return cls(**defaults)

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4

    @property
    def pooled_embed_dim(self) -> int:
        return (self.projection_class_embeddings_input_dim
                - self.num_time_ids * self.addition_time_embed_dim)

    @property
    def mid_depth(self) -> int:
        if self.mid_block_transformer_layers is not None:
            return self.mid_block_transformer_layers
        return self.transformer_layers_per_block[-1]


class SDXLUNet(nn.Module):
    config: UNetConfig = field(default_factory=UNetConfig)
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.bfloat16

    def _blocks(self):
        cfg = self.config
        res_cls, tfm_cls = ResnetBlock2D, Transformer2DModel
        if cfg.remat:
            import jax
            policies = {
                "full": None,
                # "dots" keeps EVERY dot output — including the S^2
                # attention logits (640MB per 4096-token head-batch), which
                # OOMs a 16GB chip at 1024^2; kept for small-resolution use
                "dots": jax.checkpoint_policies.dots_saveable,
                # the right middle ground for attention-heavy models:
                # batched einsums (the S^2 logits) are recomputed, plain
                # projection/conv matmuls are saved
                "dots_nobatch":
                    jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                # size-thresholded dots_nobatch: auto-fits batch 4 @1024^2
                # on a 16GB chip (see _small_dots_policy)
                "dots_small": _small_dots_policy(),
                # dots_small + the named attention-core outputs
                # (layers.py::Attention): with the core saved the remat
                # backward skips re-running every attention forward — the
                # recompute whose monolithic form materialises 320 MB fp32
                # probs per deep layer — so every big site can use the
                # bounded-memory chunked path (2 blockwise passes total)
                # and the recompute tax drops to the cheap projections/
                # elementwise.  ~850 MB of extra bf16 saves at batch 4
                # @1024^2.
                "dots_small_attn": jax.checkpoint_policies.
                save_from_both_policies(
                    _small_dots_policy(),
                    jax.checkpoint_policies.save_only_these_names(
                        "attn_core")),
                # dots_small + size-thresholded named saves (res_conv /
                # gn_silu / attn_core, layers.py): the deep-stage conv,
                # fused-GN, and attention-core outputs are ~10 MB bf16
                # each and outside the dot policy's sight; saving them
                # removes their recompute (conv FLOPs + normalization
                # reductions) for ~400 MB of extra saves at batch 4
                # @1024^2
                "dots_small_conv": _small_saves_policy(
                    small_names=("res_conv", "gn_silu", "attn_core")),
                # the wide variant: named saves up to 12M elements so the
                # 64^2-stage conv/GN/attention-core outputs (~21 MB bf16,
                # 10.5M elements) are kept too, and the mid block saves its
                # names as well (see _blocks) — ~600 MB more saves at
                # batch 4 @1024^2 for the 64^2-stage conv + normalization
                # recompute
                "dots_small_conv_wide": _small_saves_policy(
                    small_names=("res_conv", "gn_silu", "attn_core"),
                    names_max_out_elements=12 * 1024 * 1024),
                # conv + mid-block named saves, 8M threshold (the fallback
                # between _conv and _conv_wide: +150 MB for the mid-block
                # conv/GN/core recomputes)
                "dots_small_conv_mid": _small_saves_policy(
                    small_names=("res_conv", "gn_silu", "attn_core")),
                # conv saves at 8M + attention cores at 12M: the 64^2-stage
                # cores (10.5M elements, ~21 MB bf16 each) are kept too, so
                # NO attention forward is ever recomputed and the
                # dots_small_attn chunk rule applies (chunk every big site;
                # the only attention passes are the chunked fwd + blockwise
                # VJP).  ~210 MB more saves than dots_small_conv at batch 4
                # @1024^2 — the attn-only slice of the _wide variant that
                # OOMed with the conv/GN names included.
                "dots_small_conv_attnwide": _small_saves_policy(
                    small_names=("res_conv", "gn_silu", "attn_core"),
                    name_thresholds={"attn_core": 12 * 1024 * 1024}),
                # dots_small_conv with a 10M dot threshold: the 64^2-stage
                # projection outputs (10.5M elements) join the saves
                "dots_small_conv10": _small_saves_policy(
                    max_out_elements=10 * 1024 * 1024 + 512 * 1024,
                    small_names=("res_conv", "gn_silu", "attn_core")),
                # conv10 + the 128^2-stage (stage-0, attention-free)
                # res_conv/gn_silu outputs (21M elements, 42 MB bf16 each
                # at batch 4): the bf16 norm interior (round 5) freed
                # enough save budget that the largest-spatial conv/GN
                # recomputes can be bought out too (~600 MB more saves)
                "dots_small_conv10_128": _small_saves_policy(
                    max_out_elements=10 * 1024 * 1024 + 512 * 1024,
                    small_names=("res_conv", "gn_silu", "attn_core"),
                    name_thresholds={
                        "res_conv": 22 * 1024 * 1024,
                        "gn_silu": 22 * 1024 * 1024}),
            }
            if cfg.remat_policy not in policies:
                raise ValueError(
                    f"Unknown remat_policy {cfg.remat_policy!r}; "
                    f"one of {sorted(policies)}")
            policy = policies[cfg.remat_policy]
            res_cls = nn.remat(ResnetBlock2D, policy=policy)
            tfm_cls = nn.remat(Transformer2DModel, policy=policy)
            mid_tfm_cls = tfm_cls
            if cfg.remat_policy == "dots_small_attn":
                # the mid block skips the dot saves (the batch-4 @1024^2
                # budget, see the dots_small note below) but keeps the
                # named attention-core saves — 10 x ~10 MB buys skipping
                # all ten mid-block attention recomputes
                mid_tfm_cls = nn.remat(
                    Transformer2DModel,
                    policy=jax.checkpoint_policies.save_only_these_names(
                        "attn_core"))
            if cfg.remat_policy in ("dots_small_conv_wide",
                                    "dots_small_conv_mid"):
                # mid block: the dot saves overflowed the batch-4 budget
                # (round-3 note below) but the ~150 MB of named conv/GN/
                # attention-core saves fit and skip the mid recomputes
                mid_tfm_cls = nn.remat(
                    Transformer2DModel,
                    policy=_small_saves_policy(
                        small_names=("res_conv", "gn_silu", "attn_core"),
                        names_max_out_elements=(
                            12 * 1024 * 1024
                            if cfg.remat_policy == "dots_small_conv_wide"
                            else None),
                        dots=False))
            if cfg.remat_policy in ("dots_small", "dots_small_conv",
                                    "dots_small_conv_attnwide",
                                    "dots_small_conv10",
                                    "dots_small_conv10_128"):
                # spend the save budget on the down/up transformer stages
                # only: with the mid block fully rematerialised the batch-4
                # @1024^2 peak drops ~700 MB below the 16 GB chip (with all
                # 60 deep-stage layers saving dots it overflowed by 30 MB,
                # tools/measure_r3.py, 2026-08-17) for ~1/6 of the dot-save
                # recompute win given back.
                mid_tfm_cls = nn.remat(Transformer2DModel, policy=None)
            return res_cls, tfm_cls, mid_tfm_cls
        return res_cls, tfm_cls, tfm_cls

    def __call__(self, sample, timesteps, encoder_hidden_states,
                 text_embeds, time_ids, deep_cache=None,
                 return_deep: bool = False):
        # trace-time norm-interior dtype policy (see UNetConfig field):
        # bf16 arithmetic pays under remat (smaller saves + recompute
        # traffic) and costs without it — resolve from this UNet's config
        # so e.g. the no-remat headline step and the remat literal step
        # each get their measured-best form.
        cfg = self.config
        on = (cfg.norm_bf16_arith if cfg.norm_bf16_arith is not None
              else cfg.remat)
        with norm_arith_bf16(on):
            return self._forward(sample, timesteps, encoder_hidden_states,
                                 text_embeds, time_ids, deep_cache,
                                 return_deep)

    @nn.compact
    def _forward(self, sample, timesteps, encoder_hidden_states,
                 text_embeds, time_ids, deep_cache=None,
                 return_deep: bool = False):
        """Predict noise / velocity.

        Args:
          sample: [B, C, H, W] latents (NCHW at the boundary for parity with
            the reference batch contract, ``ddpm_trainer.py:293``).
          timesteps: [B] (ints for ddpm; floats in [0,1] for flow matching,
            which calls the UNet with t directly — reference behaviour,
            ``flow_matching_trainer.py:392-405``).
          encoder_hidden_states: [B, 77, cross_attention_dim] text embeds.
          text_embeds: [B, pooled_dim] pooled CLIP-G embeds.
          time_ids: [B, num_time_ids] SDXL micro-conditioning (6 size/crop
            ids for base/inpainting; 5 with aesthetic score for the
            refiner).
          deep_cache / return_deep: the DeepCache split (arXiv 2312.00858,
            inference-only).  The "deep feature" is the tensor entering the
            LAST up stage (NHWC, full latent resolution, channels of the
            second-to-last up stage).  ``return_deep=True`` returns
            ``(pred, deep)`` from a full forward; ``deep_cache=<tensor>``
            computes ONLY conv_in + down stage 0 (the skips the last up
            stage consumes) and the last up stage + head around the
            injected feature — skipping every deep stage and the mid block
            (~90% of SDXL's FLOPs).  Injecting the true deep feature
            reproduces the full forward exactly (tested); reusing a
            recent step's feature is the DeepCache approximation.
        Returns:
          [B, C, H, W] prediction (plus the deep feature when
          ``return_deep``).
        """
        cfg = self.config
        dt, pdt = self.dtype, self.param_dtype
        res_cls, tfm_cls, mid_tfm_cls = self._blocks()

        x = jnp.transpose(sample.astype(dt), (0, 2, 3, 1))  # NCHW -> NHWC
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (x.shape[0],))

        # --- time + added conditioning embeddings (fp32 sinusoids) ---
        t_emb = timestep_embedding(timesteps, cfg.block_out_channels[0])
        emb = TimestepEmbedding(cfg.time_embed_dim, dt, pdt,
                                name="time_embedding")(t_emb.astype(dt))
        ids_emb = timestep_embedding(time_ids.reshape(-1),
                                     cfg.addition_time_embed_dim)
        ids_emb = ids_emb.reshape(x.shape[0], -1)
        add_in = jnp.concatenate(
            [text_embeds.astype(jnp.float32), ids_emb], axis=-1).astype(dt)
        emb = emb + TimestepEmbedding(cfg.time_embed_dim, dt, pdt,
                                      name="add_embedding")(add_in)

        ctx = encoder_hidden_states.astype(dt)

        # remat-aware "auto" chunk threshold: under remat the chunked VJP
        # recomputes attention on top of the remat recompute, so monolithic
        # wins wherever the probs transient is affordable (measured b4
        # @1024^2 dots_small: 1483 ms at 512 MB vs 1538 ms all-chunked,
        # tools/measure_r3.py, 2026-08-17); without remat, chunk everything big
        # (the 64 MB default: 273.5 vs 305.8 ms at b1).
        # Under dots_small_attn the saved attention-core outputs mean the
        # remat recompute never re-runs attention, so the no-remat logic
        # applies again: chunk every big site (64 MB default) — the only
        # attention passes left are the chunked fwd and its blockwise VJP.
        chunk_mb = cfg.attn_chunk_mb or (
            512 if cfg.remat and cfg.remat_policy not in
            ("dots_small_attn", "dots_small_conv_attnwide")
            else None)

        def make_tfm(ch, depth, name, cls=None):
            cls = tfm_cls if cls is None else cls
            return cls(num_heads=ch // cfg.attention_head_dim,
                       head_dim=cfg.attention_head_dim, depth=depth,
                       dtype=dt, param_dtype=pdt, attn_impl=cfg.attn_impl,
                       attn_chunk_mb=chunk_mb, name=name)

        n_stages = len(cfg.block_out_channels)
        shallow_only = deep_cache is not None
        if shallow_only and (n_stages < 2 or return_deep):
            raise ValueError("deep_cache needs >=2 stages and excludes "
                             "return_deep")

        # --- down path ---
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, dtype=dt,
                    param_dtype=pdt, name="conv_in")(x)
        skips = [x]
        down_stages = range(1 if shallow_only else n_stages)
        for i in down_stages:
            ch = cfg.block_out_channels[i]
            depth = cfg.transformer_layers_per_block[i]
            for j in range(cfg.layers_per_block):
                x = res_cls(out_channels=ch, emb_dim=cfg.time_embed_dim,
                            num_groups=cfg.norm_num_groups, dtype=dt,
                            param_dtype=pdt,
                            name=f"down_blocks_{i}_resnets_{j}")(x, emb)
                if depth > 0:
                    x = make_tfm(ch, depth,
                                 f"down_blocks_{i}_attentions_{j}")(x, ctx)
                skips.append(x)
            if i < n_stages - 1 and not shallow_only:
                x = Downsample2D(ch, dt, pdt,
                                 name=f"down_blocks_{i}_downsamplers_0")(x)
                skips.append(x)

        deep = None
        rev_channels = list(reversed(cfg.block_out_channels))
        rev_depths = list(reversed(cfg.transformer_layers_per_block))
        if not shallow_only:
            # --- mid ---
            mid_ch = cfg.block_out_channels[-1]
            mid_depth = cfg.mid_depth
            x = res_cls(out_channels=mid_ch, emb_dim=cfg.time_embed_dim,
                        num_groups=cfg.norm_num_groups, dtype=dt,
                        param_dtype=pdt, name="mid_block_resnets_0")(x, emb)
            if mid_depth > 0:
                x = make_tfm(mid_ch, mid_depth, "mid_block_attentions_0",
                             cls=mid_tfm_cls)(x, ctx)
            x = res_cls(out_channels=mid_ch, emb_dim=cfg.time_embed_dim,
                        num_groups=cfg.norm_num_groups, dtype=dt,
                        param_dtype=pdt, name="mid_block_resnets_1")(x, emb)

            # --- deep up stages (all but the last) ---
            for i in range(n_stages - 1):
                ch, depth = rev_channels[i], rev_depths[i]
                for j in range(cfg.layers_per_block + 1):
                    skip = skips.pop()
                    x = jnp.concatenate([x, skip], axis=-1)
                    x = res_cls(out_channels=ch, emb_dim=cfg.time_embed_dim,
                                num_groups=cfg.norm_num_groups, dtype=dt,
                                param_dtype=pdt,
                                name=f"up_blocks_{i}_resnets_{j}")(x, emb)
                    if depth > 0:
                        x = make_tfm(ch, depth,
                                     f"up_blocks_{i}_attentions_{j}")(x, ctx)
                x = Upsample2D(ch, dt, pdt,
                               name=f"up_blocks_{i}_upsamplers_0")(x)
            if return_deep:
                deep = x
        else:
            x = deep_cache.astype(dt)

        # --- last up stage (always computed) ---
        i = n_stages - 1
        ch, depth = rev_channels[i], rev_depths[i]
        for j in range(cfg.layers_per_block + 1):
            skip = skips.pop()
            x = jnp.concatenate([x, skip], axis=-1)
            x = res_cls(out_channels=ch, emb_dim=cfg.time_embed_dim,
                        num_groups=cfg.norm_num_groups, dtype=dt,
                        param_dtype=pdt,
                        name=f"up_blocks_{i}_resnets_{j}")(x, emb)
            if depth > 0:
                x = make_tfm(ch, depth,
                             f"up_blocks_{i}_attentions_{j}")(x, ctx)

        # --- head ---
        x = GroupNormSiLU(cfg.norm_num_groups, 1e-5, name="conv_norm_out")(x)
        x = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=dt,
                    param_dtype=pdt, name="conv_out")(x)
        out = jnp.transpose(x, (0, 3, 1, 2))  # NHWC -> NCHW
        if return_deep:
            return out, deep
        return out
