"""Text-to-image inference pipeline.

Counterpart of the reference's ``create_pipeline`` surface
(``src/models/sdxl.py:188-198``, which hands back a diffusers
``StableDiffusionXLPipeline``): a self-contained SDXL pipeline over the flax
models with the ZTSNR Karras-Euler sampler and classifier-free guidance.

    pipe = SDXLPipeline.from_pretrained("/path/to/diffusers-checkpoint")
    images = pipe(["a photograph of an astronaut riding a horse"],
                  height=1024, width=1024, num_inference_steps=28,
                  guidance_scale=5.0, seed=0)
    images[0]  # HWC uint8 numpy array
"""
from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Sequence

import jax
import numpy as np

from sdxl_training_improvements_tpu.models.sdxl import SDXLModel
from sdxl_training_improvements_tpu.models.tokenizer import (
    TokenizerPair, load_tokenizers)
from sdxl_training_improvements_tpu.training.schedules import NoiseSchedule
from sdxl_training_improvements_tpu.training.validation import (
    ValidationSampler)


def _read_ckpt_json(path: Path):
    """Checkpoint-declaration reader with the loud-failure contract
    (round-3 verdict #10): an ABSENT file is a plain diffusers export
    (-> None, defaults apply); a PRESENT but unreadable/corrupt file is a
    broken checkpoint and raises naming the file — silently falling back
    to defaults would sample/train with the wrong topology or schedule."""
    import json
    if not path.exists():
        return None
    try:
        raw = json.loads(path.read_text())
    except OSError as e:
        raise ValueError(f"unreadable checkpoint config {path}: {e}")
    except ValueError as e:
        raise ValueError(f"corrupt checkpoint config {path}: not valid "
                         f"JSON ({e})")
    if not isinstance(raw, dict):
        raise ValueError(f"corrupt checkpoint config {path}: top level "
                         f"must be a JSON object, got {type(raw).__name__}")
    return raw


class SDXLPipeline:
    def __init__(self, model: SDXLModel, tokenizers: TokenizerPair,
                 schedule: Optional[NoiseSchedule] = None,
                 method: str = "ddpm", mesh=None, sampler: str = "euler",
                 deep_cache: int = 1):
        self.model = model
        self.tokenizers = tokenizers
        self.schedule = schedule or NoiseSchedule.create()
        self.method = method  # routes the sampler (ddpm | flow_matching)
        # serving parallelism: a jax.sharding.Mesh TP-splits the UNet over
        # the tensor axis and data-parallels the CFG-stacked batch
        # (ValidationSampler semantics); None = single device
        self.mesh = mesh
        # sigma-space integration rule: "euler" (reference-parity ZTSNR
        # walk) or "dpmpp_2m" (2nd-order multistep, ~half the steps for
        # the same quality — use num_inference_steps ~12-15)
        self.sampler = sampler
        # DeepCache interval: refresh the deep UNet feature every k steps,
        # run only the shallow stages between (1 = off)
        self.deep_cache = deep_cache

    @staticmethod
    def declared_method(model_dir) -> Optional[str]:
        """``training.method`` as the checkpoint's exported ``config.json``
        declares it (written by ``export_diffusers``), or None when the
        checkpoint predates the field / is a plain diffusers export."""
        raw = _read_ckpt_json(Path(model_dir) / "config.json")
        if raw is None:
            return None
        t = raw.get("training")
        if t is None:
            return None
        if not isinstance(t, dict):
            raise ValueError(
                f"corrupt checkpoint config {Path(model_dir)/'config.json'}:"
                f" key 'training' must be a mapping, got {type(t).__name__}")
        return t.get("method") or None

    @classmethod
    def detect_method(cls, model_dir) -> str:
        """``declared_method`` with the "ddpm" default for undeclared
        checkpoints."""
        return cls.declared_method(model_dir) or "ddpm"

    @staticmethod
    def declared_schedule(model_dir) -> Optional[NoiseSchedule]:
        """NoiseSchedule matching the checkpoint's exported framework config
        (``model.*`` sigma range / ZTSNR / rho + ``training.prediction_type``
        — the same fields ``NoiseSchedule.from_config`` reads at training
        time), or None for a plain diffusers export with no config.json.

        Without this an epsilon-trained checkpoint (BASELINE config #1)
        would silently sample through the default v-prediction/ZTSNR
        composition — the wrong inverse of its training forward process."""
        cfg_path = Path(model_dir) / "config.json"
        raw = _read_ckpt_json(cfg_path)
        if raw is None:
            return None
        m = raw.get("model") or {}
        t = raw.get("training") or {}
        if not isinstance(m, dict) or not isinstance(t, dict) or not m:
            return None
        kwargs = {}
        for field_name, cast in (("num_timesteps", int),
                                 ("sigma_min", float),
                                 ("sigma_max", float),
                                 ("rho", float),
                                 ("use_ztsnr", bool)):
            if m.get(field_name) is not None:
                try:
                    kwargs[field_name] = cast(m[field_name])
                except (TypeError, ValueError):
                    # a corrupted value must fail loudly with the key named,
                    # not silently fall back to the default schedule — the
                    # wrong sigma space samples garbage
                    raise ValueError(
                        f"corrupt checkpoint config {cfg_path}: "
                        f"model.{field_name}={m[field_name]!r} is not a "
                        f"valid {cast.__name__}")
        if "min_snr_gamma" in m:  # None is a valid (off) setting
            g = m["min_snr_gamma"]
            try:
                kwargs["min_snr_gamma"] = (None if g in (None, "None")
                                           else float(g))
            except (TypeError, ValueError):
                raise ValueError(
                    f"corrupt checkpoint config {cfg_path}: "
                    f"model.min_snr_gamma={g!r} is not a valid float")
        if t.get("prediction_type"):
            kwargs["prediction_type"] = str(t["prediction_type"])
        try:
            return NoiseSchedule.create(**kwargs)
        except (TypeError, ValueError) as e:
            raise ValueError(
                f"checkpoint config {cfg_path} declares an invalid "
                f"schedule ({kwargs}): {e}")

    @staticmethod
    def declared_unet_config(model_dir):
        """``UNetConfig`` from the checkpoint's ``unet/config.json`` (the
        diffusers topology declaration, written by ``export_diffusers`` and
        by diffusers itself), or None when absent — the path that makes
        refiner / inpainting / any conditioned-variant checkpoints load
        without out-of-band flags."""
        from sdxl_training_improvements_tpu.models.unet import UNetConfig
        raw = _read_ckpt_json(Path(model_dir) / "unet" / "config.json")
        if raw is None:
            return None
        return UNetConfig.from_diffusers_config(raw)

    @classmethod
    def from_pretrained(cls, model_dir, tiny: bool = False,
                        schedule: Optional[NoiseSchedule] = None,
                        method: Optional[str] = None,
                        mesh=None, sampler: str = "euler",
                        deep_cache: int = 1) -> "SDXLPipeline":
        """``method=None`` auto-detects from the checkpoint's config.json —
        a flow-matching-trained checkpoint must not be sampled through the
        sigma-space ZTSNR sampler (and vice versa).  The UNet topology and
        encoder family follow ``unet/config.json`` / the text-encoder
        directory layout, so base, inpainting (9-channel), and refiner
        (single-encoder, 5 time-ids) checkpoints all load through this one
        entry point."""
        from sdxl_training_improvements_tpu.training.checkpoints import (
            import_diffusers)
        declared = cls.declared_method(model_dir)
        if method and declared and method != declared:
            # sampling a flow-trained UNet through the sigma-space ZTSNR
            # sampler (or vice versa) is numerically meaningless — refuse
            # (before the expensive weight load) rather than emit garbage
            raise ValueError(
                f"checkpoint at {model_dir} was trained with method "
                f"{declared!r}; refusing to sample it as {method!r}. "
                "Use --method auto (or omit method) to follow the "
                "checkpoint.")
        method = method or declared or "ddpm"
        # inference schedule follows the checkpoint's training schedule
        # (prediction_type / sigma range / ZTSNR) unless the caller pins one
        schedule = schedule or cls.declared_schedule(model_dir)
        ucfg = cls.declared_unet_config(model_dir)
        # single-encoder (refiner) detection: the 5-id aesthetic-score
        # conditioning, or the text_encoder_2-only directory layout
        refiner = (ucfg is not None and ucfg.num_time_ids == 5) or (
            (Path(model_dir) / "text_encoder_2").exists()
            and not (Path(model_dir) / "text_encoder").exists())
        if ucfg is not None and tiny:
            # runtime knobs are not topology: keep the tiny test defaults
            import dataclasses
            ucfg = dataclasses.replace(ucfg, remat=False, attn_impl="xla")
        model = SDXLModel.create(tiny=tiny, unet_config=ucfg,
                                 refiner=refiner)
        model.params = import_diffusers(model, model_dir)
        required = {"unet", "vae", "clip_g"} | (
            set() if refiner else {"clip_l"})
        missing = required - set(model.params)
        if missing:
            raise FileNotFoundError(
                f"checkpoint at {model_dir} missing components: {missing}")
        return cls(model,
                   load_tokenizers(
                       Path(model_dir), single_encoder=refiner,
                       fallback_vocab_size=model.clip_g.cfg.vocab_size),
                   schedule, method=method, mesh=mesh, sampler=sampler,
                   deep_cache=deep_cache)

    @classmethod
    def from_model(cls, model: SDXLModel,
                   tokenizers: Optional[TokenizerPair] = None,
                   schedule: Optional[NoiseSchedule] = None,
                   method: str = "ddpm", mesh=None,
                   sampler: str = "euler",
                   deep_cache: int = 1) -> "SDXLPipeline":
        if tokenizers is None:
            # the hash fallback must match THIS model's vocab — oversized
            # ids gather NaN embeddings (nn.Embed's jnp.take fill mode)
            tokenizers = TokenizerPair.fallback(
                vocab_size=model.clip_g.cfg.vocab_size)
        return cls(model, tokenizers, schedule,
                   method=method, mesh=mesh, sampler=sampler,
                   deep_cache=deep_cache)

    # ----------------------------------------------------------- internals
    def _sampler(self, num_inference_steps: int,
                 guidance_scale: float) -> ValidationSampler:
        return ValidationSampler(self.model, self.tokenizers,
                                 self.schedule,
                                 num_inference_steps=num_inference_steps,
                                 guidance_scale=guidance_scale,
                                 method=self.method, mesh=self.mesh,
                                 sampler=self.sampler,
                                 deep_cache_interval=self.deep_cache)

    def _encode_pixels(self, images: Sequence[np.ndarray], height: int,
                       width: int, key) -> "jax.Array":
        """HWC images (uint8 [0,255] or float [-1,1]) -> sampled, scaled
        VAE latents [n, C, height/f, width/f]."""
        import jax.numpy as jnp
        arrs = []
        for i, img in enumerate(images):
            a = np.asarray(img)
            if a.ndim != 3 or a.shape[2] != 3:
                raise ValueError(f"image {i}: expected HWC RGB, got shape "
                                 f"{a.shape}")
            if a.shape[0] != height or a.shape[1] != width:
                raise ValueError(
                    f"image {i}: {a.shape[:2]} != ({height}, {width}) — "
                    "resize before calling")
            if np.issubdtype(a.dtype, np.integer):
                a = a.astype(np.float32) / 127.5 - 1.0
            else:
                a = a.astype(np.float32)  # already [-1, 1]
            arrs.append(a.transpose(2, 0, 1))
        return self.model.encode_images(jnp.asarray(np.stack(arrs)), key)

    # ------------------------------------------------------------ text2img
    def __call__(self, prompts: Sequence[str], height: int = 1024,
                 width: int = 1024, num_inference_steps: int = 28,
                 guidance_scale: float = 5.0, seed: int = 0,
                 negative_prompts: Optional[Sequence[str]] = None,
                 denoising_end: Optional[float] = None,
                 return_latents: bool = False) -> List[np.ndarray]:
        """Text -> image.  ``denoising_end`` + ``return_latents=True`` is
        the base stage of the SDXL base->refiner ensemble: stop at that
        fraction of the sigma walk and hand the still-noisy latents to
        ``refine`` on a refiner pipeline."""
        sampler = self._sampler(num_inference_steps, guidance_scale)
        return sampler.generate(self.model.params["unet"], list(prompts),
                                jax.random.key(seed), height=height,
                                width=width,
                                negative_prompts=negative_prompts,
                                denoising_end=denoising_end,
                                return_latents=return_latents
                                or denoising_end is not None)

    # ------------------------------------------------------------- img2img
    def img2img(self, prompts: Sequence[str],
                images: Optional[Sequence[np.ndarray]] = None,
                latents=None, strength: float = 0.3,
                num_inference_steps: int = 28, guidance_scale: float = 5.0,
                seed: int = 0,
                negative_prompts: Optional[Sequence[str]] = None,
                aesthetic_score: float = 6.0,
                negative_aesthetic_score: float = 2.5,
                return_latents: bool = False) -> List[np.ndarray]:
        """Image -> image: noise the init to ``strength`` of the schedule
        and denoise back down.  Pass HWC ``images`` (uint8 or [-1,1] float)
        or pre-encoded ``latents`` [n, C, h/f, w/f].  On a refiner pipeline
        this IS the standard refinement pass (aesthetic-score conditioning
        is applied automatically for 5-time-id UNets)."""
        if (images is None) == (latents is None):
            raise ValueError("img2img wants exactly one of images/latents")
        f = self.model.vae.config.downscale_factor
        key = jax.random.key(seed)
        if latents is None:
            h, w = np.asarray(images[0]).shape[:2]
            import jax.random as jr
            key, ekey = jr.split(key)
            latents = self._encode_pixels(images, h, w, ekey)
        else:
            h, w = latents.shape[2] * f, latents.shape[3] * f
        if len(prompts) != latents.shape[0]:
            raise ValueError(f"{len(prompts)} prompts for "
                             f"{latents.shape[0]} images")
        sampler = self._sampler(num_inference_steps, guidance_scale)
        return sampler.generate(self.model.params["unet"], list(prompts),
                                key, height=h, width=w,
                                negative_prompts=negative_prompts,
                                init_latents=latents, strength=strength,
                                aesthetic_score=aesthetic_score,
                                negative_aesthetic_score=
                                negative_aesthetic_score,
                                return_latents=return_latents)

    # ---------------------------------------------------------- refinement
    def refine(self, prompts: Sequence[str], noisy_latents,
               denoising_start: float = 0.8,
               num_inference_steps: int = 28, guidance_scale: float = 5.0,
               seed: int = 0,
               negative_prompts: Optional[Sequence[str]] = None,
               aesthetic_score: float = 6.0,
               negative_aesthetic_score: float = 2.5) -> List[np.ndarray]:
        """Second stage of the ensemble-of-expert-denoisers handoff: take
        the NOISY latents a base pipeline produced with
        ``denoising_end=denoising_start`` and walk the remaining sigma ramp.
        Both stages must use the same ``num_inference_steps`` (the sigma
        grid must line up)."""
        f = self.model.vae.config.downscale_factor
        h, w = noisy_latents.shape[2] * f, noisy_latents.shape[3] * f
        sampler = self._sampler(num_inference_steps, guidance_scale)
        return sampler.generate(self.model.params["unet"], list(prompts),
                                jax.random.key(seed), height=h, width=w,
                                negative_prompts=negative_prompts,
                                init_latents=noisy_latents,
                                denoising_start=denoising_start,
                                aesthetic_score=aesthetic_score,
                                negative_aesthetic_score=
                                negative_aesthetic_score)

    # ------------------------------------------------------------- inpaint
    def inpaint(self, prompts: Sequence[str],
                images: Sequence[np.ndarray],
                masks: Sequence[np.ndarray], strength: float = 1.0,
                num_inference_steps: int = 28, guidance_scale: float = 5.0,
                seed: int = 0,
                negative_prompts: Optional[Sequence[str]] = None
                ) -> List[np.ndarray]:
        """Masked image editing through a 9-channel inpainting UNet
        (``UNetConfig.sdxl_inpainting`` — the
        stable-diffusion-xl-1.0-inpainting-0.1 layout: per-step input is
        [noisy latents (4) | mask (1) | masked-image latents (4)]).

        ``masks``: HxW arrays, nonzero = repaint region.  ``strength < 1``
        additionally seeds the walk from the noised ORIGINAL image latents
        (softer edits); strength 1 repaints from pure noise under the mask
        conditioning."""
        import jax.numpy as jnp
        ucfg = self.model.unet_config
        lat_c = self.model.vae.config.latent_channels
        if ucfg.in_channels != 2 * lat_c + 1:
            raise ValueError(
                f"inpaint needs an inpainting UNet (in_channels="
                f"{2 * lat_c + 1}); this checkpoint has "
                f"{ucfg.in_channels}")
        if not (len(prompts) == len(images) == len(masks)):
            raise ValueError("prompts/images/masks length mismatch")
        f = self.model.vae.config.downscale_factor
        h, w = np.asarray(images[0]).shape[:2]
        key = jax.random.key(seed)
        import jax.random as jr
        key, k_img, k_masked = jr.split(key, 3)

        bin_masks, masked_imgs = [], []
        for img, mask in zip(images, masks):
            a = np.asarray(img)
            m = (np.asarray(mask) != 0).astype(np.float32)
            if m.shape != (h, w):
                raise ValueError(f"mask shape {m.shape} != image ({h}, {w})")
            if np.issubdtype(a.dtype, np.integer):
                a = a.astype(np.float32) / 127.5 - 1.0
            masked_imgs.append(a * (1.0 - m)[..., None])
            bin_masks.append(m)
        masked_latents = self._encode_pixels(masked_imgs, h, w, k_masked)
        # nearest-neighbour mask downsample to the latent grid (the
        # diffusers interpolate(mode="nearest") convention)
        m = np.stack(bin_masks)[:, f // 2::f, f // 2::f]
        mask_lat = jnp.asarray(m[:, None, :, :], jnp.float32)
        extra = jnp.concatenate(
            [mask_lat, jnp.asarray(masked_latents, jnp.float32)], axis=1)

        init_latents = None
        if strength < 1.0:
            init_latents = self._encode_pixels(list(images), h, w, k_img)
        sampler = self._sampler(num_inference_steps, guidance_scale)
        return sampler.generate(self.model.params["unet"], list(prompts),
                                key, height=h, width=w,
                                negative_prompts=negative_prompts,
                                init_latents=init_latents,
                                strength=strength, extra_channels=extra)
