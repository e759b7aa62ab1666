"""SDXL model bundle: UNet + VAE + dual CLIP, with the reference's surface.

Counterpart of reference ``StableDiffusionXL`` (``src/models/sdxl.py``):
owns the four submodels, exposes ``encode_prompt`` (dual CLIP ->
prompt_embeds [B,77,2048] + pooled [B,1280]), ``encode_images`` (fp32 VAE,
scaled sampled latents), and the UNet apply used by the trainer.  Weight I/O
(HF safetensors import / diffusers-layout export) lives in
``models/weights.py`` / ``training/checkpoints.py``.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from sdxl_training_improvements_tpu.core.types import (
    DataType, ModelWeightDtypes, Policy)
from sdxl_training_improvements_tpu.models.clip import (
    CLIPTextConfig, CLIPTextModel, encode_dual, encode_g)
from sdxl_training_improvements_tpu.models.unet import SDXLUNet, UNetConfig
from sdxl_training_improvements_tpu.models.vae import AutoencoderKL, VAEConfig


@dataclass
class SDXLModel:
    unet: SDXLUNet
    vae: AutoencoderKL
    # clip_l is None for the refiner (single-encoder conditioning; the
    # refiner checkpoint ships no text_encoder/)
    clip_l: Optional[CLIPTextModel]
    clip_g: CLIPTextModel
    params: Dict[str, Any] = field(default_factory=dict)  # unet/vae/clip_l/clip_g

    # ------------------------------------------------------------- builders
    @classmethod
    def create(cls, *, tiny: bool = False, dtype=jnp.bfloat16,
               policy: Optional[Policy] = None,
               weight_dtypes: Optional[ModelWeightDtypes] = None,
               remat: Optional[bool] = None,
               remat_policy: Optional[str] = None,
               attn_impl: Optional[str] = None,
               attn_chunk_mb: Optional[int] = None,
               unet_config: Optional[UNetConfig] = None,
               refiner: bool = False,
               init_rng: Optional[jax.Array] = None,
               init_components=("unet",), latent_size: int = 16) -> "SDXLModel":
        """Random-init bundle.  ``tiny`` builds the CPU-testable miniature;
        otherwise full SDXL-base architecture.  Only ``init_components`` get
        params (CLIP/VAE are usually loaded from a checkpoint instead).

        ``policy`` (``core.types.Policy``) is the single mixed-precision
        source: ``param_dtype``/``compute_dtype`` flow into the UNet.  The
        ``remat`` / ``attn_impl`` toggles are the ``config.tpu.remat`` /
        ``tpu.attention_impl`` knobs (None keeps each config's default:
        "auto" dispatch for full SDXL, plain "xla" for tiny).

        ``unet_config`` overrides the UNet topology — the path for
        checkpoint-declared variants (inpainting 9-ch input, refiner
        4-stage, via ``UNetConfig.from_diffusers_config``).  ``refiner``
        switches to single-encoder conditioning: no CLIP-L, prompts
        encoded by CLIP-G alone (``clip.encode_g``)."""
        if policy is not None:
            dtype = policy.compute_dtype
        if tiny:
            ucfg, vcfg = UNetConfig.tiny(), VAEConfig.tiny()
            lcfg = CLIPTextConfig.tiny()
            gcfg = CLIPTextConfig.tiny(projection=True)
        else:
            ucfg, vcfg = UNetConfig.sdxl(), VAEConfig.sdxl()
            lcfg, gcfg = CLIPTextConfig.clip_l(), CLIPTextConfig.clip_g()
        if unet_config is not None:
            ucfg = unet_config
        overrides = {}
        if remat is not None:
            overrides["remat"] = remat
        if remat_policy is not None:
            overrides["remat_policy"] = remat_policy
        if attn_impl is not None:
            overrides["attn_impl"] = attn_impl
        if attn_chunk_mb is not None:
            overrides["attn_chunk_mb"] = attn_chunk_mb
        if overrides:
            ucfg = dataclasses.replace(ucfg, **overrides)
        param_dtype = policy.param_dtype if policy is not None else dtype
        # per-component weight dtypes (reference ModelWeightDtypes,
        # ``src/core/types.py:40-118``): UNet follows the policy, text
        # encoders follow ``weight_dtypes.text_encoder``, VAE is pinned fp32
        # (reference ``vae.py:23``) regardless.
        wd = weight_dtypes or ModelWeightDtypes.from_single_dtype(
            DataType.from_str(str(jnp.dtype(dtype))))
        te_dt, te2_dt = wd.text_encoder.to_jnp(), wd.text_encoder_2.to_jnp()
        model = cls(
            unet=SDXLUNet(config=ucfg, dtype=dtype, param_dtype=param_dtype),
            vae=AutoencoderKL(vcfg),  # fp32 (reference vae.py:23)
            clip_l=(None if refiner
                    else CLIPTextModel(lcfg, dtype=te_dt, param_dtype=te_dt)),
            clip_g=CLIPTextModel(gcfg, dtype=te2_dt, param_dtype=te2_dt),
        )
        if init_rng is not None:
            model.init_params(init_rng, components=init_components,
                              latent_size=latent_size)
        return model

    @property
    def unet_config(self) -> UNetConfig:
        return self.unet.config

    def init_params(self, rng: jax.Array, components=("unet",),
                    latent_size: int = 16) -> None:
        # Every .init goes through jax.jit: ONE compiled program per
        # component instead of one remote dispatch per op — eager init of
        # the 2.567B UNet through the tunneled dev chip never finished
        # (observed 2026-08-20, >20 min in init), jitted it is seconds.
        ucfg = self.unet.config
        keys = jax.random.split(rng, 4)
        if "unet" in components:
            b = 1
            self.params["unet"] = jax.jit(self.unet.init)(
                keys[0],
                jnp.zeros((b, ucfg.in_channels, latent_size, latent_size)),
                jnp.zeros((b,)),
                jnp.zeros((b, 77, ucfg.cross_attention_dim)),
                jnp.zeros((b, ucfg.pooled_embed_dim)),
                jnp.zeros((b, ucfg.num_time_ids)))
        if "vae" in components:
            self.params["vae"] = jax.jit(self.vae.init)(
                keys[1], jnp.zeros((1, 3, 8 * latent_size, 8 * latent_size)),
                keys[1])
        if "clip_l" in components and self.clip_l is not None:
            ids = jnp.zeros((1, 77), jnp.int32)
            self.params["clip_l"] = jax.jit(self.clip_l.init)(keys[2], ids)
        if "clip_g" in components:
            ids = jnp.zeros((1, 77), jnp.int32)
            self.params["clip_g"] = jax.jit(self.clip_g.init)(keys[3], ids)

    # ------------------------------------------------------------- compute
    def unet_apply(self, unet_params, sample, timesteps, prompt_embeds,
                   pooled_prompt_embeds, time_ids, rng=None,
                   deep_cache=None, return_deep: bool = False):
        """``rng`` is part of the trainer apply contract (consumed by
        stochastic adapters like LoRA-with-dropout); the plain UNet is
        deterministic and ignores it.  ``deep_cache``/``return_deep`` are
        the inference-only DeepCache split (``SDXLUNet.__call__``)."""
        return self.unet.apply(unet_params, sample, timesteps, prompt_embeds,
                               pooled_prompt_embeds, time_ids,
                               deep_cache=deep_cache, return_deep=return_deep)

    def encode_prompt(self, input_ids_l, input_ids_g, clip_skip: int = 1):
        """Dual-CLIP encoding, reference contract (``clip.py:61-91``).
        With no CLIP-L (refiner bundle) dispatches to single-encoder
        CLIP-G conditioning; ``input_ids_l`` may then be None."""
        self._check_token_ids(input_ids_l, input_ids_g)
        if self.clip_l is None:
            return encode_g(self.clip_g, self.params["clip_g"],
                            input_ids_g, clip_skip=clip_skip)
        return encode_dual(self.clip_l, self.params["clip_l"],
                           self.clip_g, self.params["clip_g"],
                           input_ids_l, input_ids_g, clip_skip=clip_skip)

    def _check_token_ids(self, input_ids_l, input_ids_g) -> None:
        """Out-of-vocab token ids produce NaN embeddings (flax ``nn.Embed``
        gathers via ``jnp.take`` whose out-of-bounds mode FILLS with NaN) —
        which the loss finite-guard then masks into a normal-looking
        constant loss.  A tokenizer/encoder vocab mismatch must fail
        loudly at the host boundary instead.  Skipped under tracing (the
        encode paths are eager everywhere in this framework)."""
        import numpy as np
        pairs = [("input_ids_g / tokenizer_2", input_ids_g, self.clip_g)]
        if self.clip_l is not None:
            pairs.append(("input_ids_l / tokenizer", input_ids_l,
                          self.clip_l))
        for name, ids, enc in pairs:
            if ids is None or isinstance(ids, jax.core.Tracer):
                continue
            mx = int(np.asarray(ids).max())
            if mx >= enc.cfg.vocab_size:
                raise ValueError(
                    f"{name}: token id {mx} >= encoder vocab_size "
                    f"{enc.cfg.vocab_size} — tokenizer/encoder mismatch "
                    "(this would gather NaN embeddings and train/sample "
                    "garbage behind a finite-looking loss). Use a "
                    "tokenizer matching the checkpoint, or "
                    "TokenizerPair.fallback(vocab_size=...) matching the "
                    "model.")

    def encode_images(self, pixel_values_nchw, rng):
        """fp32 VAE encode -> sampled, scaled latents (``vae.py:33-56``)."""
        return self.vae.apply(self.params["vae"], pixel_values_nchw, rng,
                              method=self.vae.encode)

    def decode_latents(self, latents_nchw):
        return self.vae.apply(self.params["vae"], latents_nchw,
                              method=self.vae.decode)

    def trainable_params(self):
        """UNet-only training, matching the reference's effective behaviour
        (``sdxl.py:237-240`` — second ``parameters()`` def wins, UNet only)."""
        return self.params["unet"]
