"""Validation during training: sample images + validation loss.

The reference ships two validation modules that are both import-broken and
dead (``src/training/validation.py``, ``src/core/validation/`` — defect
ledger).  This is the working equivalent of their intended surface:

* ``ValidationSampler.generate`` — text -> image through the ZTSNR Karras
  Euler sampler (``schedules.sample_ztsnr``, the reference's
  ``sample_with_ztsnr`` ``novelai_v3.py:86-99``) with classifier-free
  guidance, decoded by the fp32 VAE; images are saved as PNGs and pushed to
  the logger's image sink (``wandb.log_images`` surface).
* ``validation_loss`` — the training loss measured over a held-out dataset
  (``data.validation_data_dir``), method-consistent (uses the same loss
  registry entry as training).
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sdxl_training_improvements_tpu.training import schedules as S
from sdxl_training_improvements_tpu.training.methods import get_method


def latents_to_images(decoded_nchw: jnp.ndarray) -> List["np.ndarray"]:
    """[-1,1] NCHW float -> list of HWC uint8 arrays."""
    arr = np.asarray(jnp.clip(decoded_nchw, -1, 1))
    arr = np.nan_to_num(arr, nan=0.0, posinf=1.0, neginf=-1.0)
    arr = ((arr + 1.0) * 127.5).astype(np.uint8)
    return [a.transpose(1, 2, 0) for a in arr]


class ValidationSampler:
    """``method`` selects the sampler matching how the UNet was trained:
    "ddpm" (v-prediction) -> ZTSNR Karras-Euler; "flow_matching" -> the
    Euler ODE over the OT path (``schedules.sample_flow``).  Sampling a
    flow-trained model through the sigma-space sampler (or vice versa) is
    numerically meaningless, so the method must be threaded from
    ``config.training.method`` (the loop and pipeline do this)."""

    def __init__(self, model, tokenizers, schedule: S.NoiseSchedule,
                 num_inference_steps: int = 28, guidance_scale: float = 5.0,
                 method: str = "ddpm", mesh=None, sampler: str = "euler",
                 deep_cache_interval: int = 1):
        self.model = model
        self.tokenizers = tokenizers
        self.schedule = schedule
        self.num_inference_steps = num_inference_steps
        self.guidance_scale = guidance_scale
        if method not in ("ddpm", "flow_matching"):
            # custom registry methods must declare which sampler family
            # applies; default to the sigma-space sampler with a warning is
            # NOT safe — fail loudly instead.
            raise ValueError(
                f"ValidationSampler supports methods 'ddpm' and "
                f"'flow_matching', got {method!r}")
        self.method = method
        if sampler not in ("euler", "dpmpp_2m"):
            raise ValueError(
                f"sampler must be 'euler' or 'dpmpp_2m', got {sampler!r}")
        if sampler != "euler" and method == "flow_matching":
            raise ValueError(
                "dpmpp_2m is a sigma-space sampler; flow_matching models "
                "integrate the OT ODE (sampler='euler' only)")
        # integration rule for the sigma-space walk: "euler" is the
        # reference-parity ZTSNR Karras-Euler; "dpmpp_2m" reaches the same
        # quality in ~half the steps (schedules.sample_dpmpp_2m)
        self.sampler = sampler
        # DeepCache (arXiv 2312.00858): refresh the UNet's deep feature
        # every k steps and run only conv_in + stage 0 + the last up stage
        # on the k-1 steps between (~90% of SDXL's FLOPs skipped on cached
        # steps).  1 = off (every step is a full forward).
        if deep_cache_interval < 1:
            raise ValueError(
                f"deep_cache_interval must be >= 1, got {deep_cache_interval}")
        if deep_cache_interval > 1 and method == "flow_matching":
            raise ValueError(
                "deep_cache is wired for the sigma-space samplers only")
        self.deep_cache_interval = deep_cache_interval
        # mesh-parallel serving: megatron-TP the UNet over the tensor axis
        # (the training TP_RULES apply unchanged) and shard the CFG-stacked
        # batch over data x fsdp; XLA inserts the collectives.  None =
        # single-device sampling.
        self.mesh = mesh
        # (src_tree, placed_tree): the mesh placement of the last param
        # tree seen, so a serving loop calling generate() repeatedly with
        # the same (functionally immutable) tree pays the multi-GB
        # device_put/re-layout once, not per request
        self._placed = None

    def _place_params(self, unet_params):
        if self.mesh is None:
            return unet_params
        if self._placed is not None and self._placed[0] is unet_params:
            return self._placed[1]
        from sdxl_training_improvements_tpu.parallel import mesh as M
        placed = jax.device_put(
            unet_params, M.param_shardings(self.mesh, unet_params))
        self._placed = (unet_params, placed)
        return placed

    def _bshard(self, x):
        """Constrain a [2n, ...] CFG-stacked tensor over the mesh's data
        axes (no-op without a mesh or when the batch doesn't divide)."""
        if self.mesh is None:
            return x
        from sdxl_training_improvements_tpu.parallel import mesh as M
        dp = self.mesh.shape[M.DATA_AXIS] * self.mesh.shape[M.FSDP_AXIS]
        if x.shape[0] % dp:
            return x
        return jax.lax.with_sharding_constraint(x, M.batch_sharding(self.mesh))

    def _conditioning(self, enc, n: int, height: int, width: int,
                      aesthetic_score: float, negative_aesthetic_score: float):
        """[cond; neg]-ordered encoder output -> CFG-stacked ([uncond; cond])
        prompt_embeds / pooled / time_ids.  5-time-id UNets (the refiner) get
        aesthetic-score conditioning rows with the diffusers cond/uncond
        split (StableDiffusionXLImg2ImgPipeline convention: 6.0 cond / 2.5
        uncond by default); 6-id UNets get [h, w, 0, 0, h, w].  Shared by
        ``generate`` and the AOT export tracer (``aot.py``)."""
        pe = jnp.concatenate([enc["prompt_embeds"][n:],
                              enc["prompt_embeds"][:n]], axis=0)
        pooled = jnp.concatenate([enc["pooled_prompt_embeds"][n:],
                                  enc["pooled_prompt_embeds"][:n]], axis=0)
        if self.model.unet_config.num_time_ids == 5:
            uncond_row = [height, width, 0, 0, negative_aesthetic_score]
            cond_row = [height, width, 0, 0, aesthetic_score]
            time_ids = jnp.concatenate([
                jnp.tile(jnp.asarray([uncond_row], jnp.float32), (n, 1)),
                jnp.tile(jnp.asarray([cond_row], jnp.float32), (n, 1)),
            ], axis=0)
        else:
            time_ids = jnp.tile(jnp.asarray(
                [[height, width, 0, 0, height, width]], jnp.float32),
                (2 * n, 1))
        return pe, pooled, time_ids

    def _denoiser(self, unet_params, prompt_embeds, pooled, time_ids,
                  extra=None, guidance=None):
        """model_fn(x, sigma) for the sampler: raw network F(c_in*x, t(sigma))
        with CFG when guidance > 1.  Conditioning rows are stacked
        [uncond; cond] along batch.  ``extra`` ([2B, K, h, w], already
        CFG-stacked) is concatenated on the channel axis every call — the
        inpainting conditioning (mask + masked-image latents) for 9-channel
        UNets.  ``guidance`` overrides ``self.guidance_scale`` — it may be a
        TRACED scalar (the AOT export path, ``aot.py``, bakes one program
        with a runtime-adjustable guidance input)."""
        sigmas = self.schedule.sigmas
        if guidance is None:
            guidance = self.guidance_scale

        def fn(x, sigma):
            # sigma -> nearest trained timestep (descending table)
            t_idx = jnp.argmin(jnp.abs(
                jnp.log(jnp.maximum(sigmas, 1e-8))
                - jnp.log(jnp.maximum(sigma, 1e-8))))
            b = x.shape[0]
            t = jnp.full((2 * b,), t_idx, jnp.int32)
            x2 = jnp.concatenate([x, x], axis=0)
            if extra is not None:
                x2 = jnp.concatenate([x2, extra.astype(x2.dtype)], axis=1)
            x2 = self._bshard(x2)
            pred = self.model.unet_apply(unet_params, x2, t, prompt_embeds,
                                         pooled, time_ids)
            uncond, cond = jnp.split(pred.astype(jnp.float32), 2, axis=0)
            return uncond + guidance * (cond - uncond)

        return fn

    def _cached_denoiser(self, unet_params, prompt_embeds, pooled, time_ids,
                         extra=None, guidance=None):
        """DeepCache variant of ``_denoiser``: aux-threading model_fn
        ``(x, sigma, (step, deep)) -> (cfg_pred, (step+1, deep'))``.

        Steps where ``step % interval == 0`` run the full UNet and refresh
        the deep feature; the others run only the shallow stages around the
        cached one (``SDXLUNet.__call__`` deep_cache/return_deep).  The
        carry rides the sampler scan (``sample_ztsnr``/``sample_dpmpp_2m``
        ``aux0=``)."""
        sigmas = self.schedule.sigmas
        if guidance is None:
            guidance = self.guidance_scale
        k = self.deep_cache_interval

        def fn(x, sigma, aux):
            step_i, deep = aux
            t_idx = jnp.argmin(jnp.abs(
                jnp.log(jnp.maximum(sigmas, 1e-8))
                - jnp.log(jnp.maximum(sigma, 1e-8))))
            b = x.shape[0]
            t = jnp.full((2 * b,), t_idx, jnp.int32)
            x2 = jnp.concatenate([x, x], axis=0)
            if extra is not None:
                x2 = jnp.concatenate([x2, extra.astype(x2.dtype)], axis=1)
            x2 = self._bshard(x2)

            def full(_):
                return self.model.unet_apply(
                    unet_params, x2, t, prompt_embeds, pooled, time_ids,
                    return_deep=True)

            def shallow(d):
                return (self.model.unet_apply(
                    unet_params, x2, t, prompt_embeds, pooled, time_ids,
                    deep_cache=d), d)

            pred, deep = jax.lax.cond(step_i % k == 0, full, shallow, deep)
            uncond, cond = jnp.split(pred.astype(jnp.float32), 2, axis=0)
            return (uncond + guidance * (cond - uncond),
                    (step_i + 1, deep))

        return fn

    def _deep_cache_aux0(self, n: int, height: int, width: int):
        """Initial (step, deep) carry: step 0 always refreshes, so the
        zeros placeholder is never consumed."""
        f = self.model.vae.config.downscale_factor
        deep_ch = self.model.unet_config.block_out_channels[1]
        deep = jnp.zeros((2 * n, height // f, width // f, deep_ch),
                         self.model.unet.dtype)
        return (jnp.asarray(0, jnp.int32), deep)

    def _flow_denoiser(self, unet_params, prompt_embeds, pooled, time_ids,
                       extra=None, guidance=None):
        """model_fn(x, t) -> CFG-combined velocity, t scalar in [0,1].

        The UNet is called with the float time directly — the flow-matching
        training convention (``methods.flow_matching_loss``; reference
        ``flow_matching_trainer.py:392-405``)."""
        if guidance is None:
            guidance = self.guidance_scale

        def fn(x, t):
            b = x.shape[0]
            tvec = jnp.full((2 * b,), t, jnp.float32)
            x2 = jnp.concatenate([x, x], axis=0)
            if extra is not None:
                x2 = jnp.concatenate([x2, extra.astype(x2.dtype)], axis=1)
            x2 = self._bshard(x2)
            v = self.model.unet_apply(unet_params, x2, tvec, prompt_embeds,
                                      pooled, time_ids)
            uncond, cond = jnp.split(v.astype(jnp.float32), 2, axis=0)
            return uncond + guidance * (cond - uncond)

        return fn

    def generate(self, unet_params, prompts: Sequence[str], key: jax.Array,
                 height: int = 1024, width: int = 1024,
                 negative_prompts: Optional[Sequence[str]] = None,
                 init_latents: Optional[jnp.ndarray] = None,
                 strength: float = 1.0,
                 extra_channels: Optional[jnp.ndarray] = None,
                 aesthetic_score: float = 6.0,
                 negative_aesthetic_score: float = 2.5,
                 denoising_start: Optional[float] = None,
                 denoising_end: Optional[float] = None,
                 return_latents: bool = False) -> List[np.ndarray]:
        """Sample one image per prompt; returns HWC uint8 arrays.

        ``negative_prompts`` replace the empty-string unconditional rows
        (the diffusers-pipeline CFG surface the reference hands back via
        ``create_pipeline``, ``sdxl.py:188-198``).

        ``init_latents`` [n, C_lat, h/f, w/f] + ``strength`` run img2img:
        the sampler enters its schedule partway down and denoises from the
        noised init instead of pure noise.  ``extra_channels`` [n, K, h/f,
        w/f] are per-step channel-concatenated conditioning (inpainting
        mask + masked latents for 9-channel UNets).  5-time-id UNets (the
        refiner) get [h, w, 0, 0, aesthetic_score] conditioning rows with
        the diffusers cond/uncond aesthetic-score split.
        ``return_latents`` skips VAE decode and returns the latent tensor
        (the base->refiner handoff)."""
        negs = (list(negative_prompts) if negative_prompts
                else [""] * len(prompts))
        if len(negs) != len(prompts):
            raise ValueError(
                f"negative_prompts ({len(negs)}) must match prompts "
                f"({len(prompts)})")
        ids_l, ids_g = self.tokenizers(list(prompts) + negs)
        enc = self.model.encode_prompt(jnp.asarray(ids_l), jnp.asarray(ids_g))
        n = len(prompts)
        pe, pooled, time_ids = self._conditioning(
            enc, n, height, width, aesthetic_score, negative_aesthetic_score)
        extra = None
        if extra_channels is not None:
            # CFG-stack the conditioning channels to match [uncond; cond]
            extra = jnp.concatenate([extra_channels, extra_channels], axis=0)

        if self.mesh is not None:
            # TP-split the UNet by the training rules (replicated over
            # data/fsdp); conditioning rows ride the batch sharding when
            # they divide, so the per-step collectives stay on the mesh
            unet_params = self._place_params(unet_params)
            pe = self._bshard(pe)
            pooled = self._bshard(pooled)
            time_ids = self._bshard(time_ids)

        f = self.model.vae.config.downscale_factor
        lat_ch = self.model.unet_config.in_channels - (
            0 if extra_channels is None else extra_channels.shape[1])
        lat_shape = (n, lat_ch, height // f, width // f)
        if init_latents is not None and tuple(init_latents.shape) != lat_shape:
            raise ValueError(
                f"init_latents shape {tuple(init_latents.shape)} != "
                f"expected {lat_shape}")
        if self.method == "flow_matching":
            if denoising_start is not None or denoising_end is not None:
                raise ValueError("denoising_start/denoising_end (the "
                                 "base->refiner sigma handoff) apply to the "
                                 "sigma-space sampler only, not "
                                 "flow_matching")
            model_fn = self._flow_denoiser(unet_params, pe, pooled, time_ids,
                                           extra=extra)
            latents = S.sample_flow(model_fn, key, lat_shape,
                                    num_steps=self.num_inference_steps,
                                    init=init_latents, strength=strength)
        else:
            aux0 = None
            if self.deep_cache_interval > 1:
                model_fn = self._cached_denoiser(unet_params, pe, pooled,
                                                 time_ids, extra=extra)
                aux0 = self._deep_cache_aux0(n, height, width)
            else:
                model_fn = self._denoiser(unet_params, pe, pooled, time_ids,
                                          extra=extra)
            sample = (S.sample_dpmpp_2m if self.sampler == "dpmpp_2m"
                      else S.sample_ztsnr)
            latents = sample(model_fn, key, lat_shape, self.schedule,
                             num_steps=self.num_inference_steps,
                             init=init_latents, strength=strength,
                             denoising_start=denoising_start,
                             denoising_end=denoising_end, aux0=aux0)
        if return_latents:
            return latents
        decoded = self.model.decode_latents(latents.astype(jnp.float32))
        return latents_to_images(decoded)


class ValidationLogger:
    """Periodic sampling + PNG save + image-sink logging (the reference
    ``ValidationLogger.run_validation`` intent, ``validation.py:33-92``)."""

    def __init__(self, sampler: ValidationSampler, prompts: Sequence[str],
                 output_dir, logger=None, height: int = 1024,
                 width: int = 1024):
        self.sampler = sampler
        self.prompts = list(prompts)
        self.output_dir = Path(output_dir)
        self.logger = logger
        self.height, self.width = height, width

    def run_validation(self, unet_params, step: int,
                       key: Optional[jax.Array] = None) -> List[Path]:
        key = key if key is not None else jax.random.key(step)
        images = self.sampler.generate(unet_params, self.prompts, key,
                                       self.height, self.width)
        out_dir = self.output_dir / f"validation-{step:06d}"
        out_dir.mkdir(parents=True, exist_ok=True)
        paths = []
        wandb_payload = {}
        try:
            from PIL import Image
        except ImportError:
            Image = None
        for i, (prompt, img) in enumerate(zip(self.prompts, images)):
            p = out_dir / f"{i:02d}.png"
            if Image is not None:
                try:
                    Image.fromarray(img).save(p)
                    paths.append(p)
                except OSError as e:  # disk full / unwritable dir: say so
                    if self.logger is not None:
                        self.logger.warning(
                            f"validation image save failed for {p}: {e}")
            wandb_payload[f"validation/{i:02d}"] = img
        if self.logger is not None:
            self.logger.log_images(wandb_payload, step=step)
            self.logger.info(f"Validation images at step {step} -> {out_dir}")
        return paths


# jit cache keyed on the closure identities: validation_loss is called once
# per epoch and a fresh `@jax.jit` closure each call would retrace every
# time.  Identity (`is`) matching with strong refs — ids alone could be
# reused after GC and silently return a jit built over a *different*
# schedule/config.  The strong refs retain unet_apply's bound model (full
# params), so the cache is tiny: 2 entries FIFO — one live trainer plus
# one in transition; a stale trainer's model is released on the next
# insert, never accumulated.
_VAL_JIT_CACHE: list = []
_VAL_JIT_CACHE_MAX = 2


def _jitted_val_loss(loss_fn, unet_apply, schedule, mcfg):
    objs = (loss_fn, unet_apply, schedule, mcfg)
    for refs, fn in _VAL_JIT_CACHE:
        if len(refs) == len(objs) and all(r is o for r, o in zip(refs, objs)):
            return fn
    while len(_VAL_JIT_CACHE) >= _VAL_JIT_CACHE_MAX:
        _VAL_JIT_CACHE.pop(0)

    @jax.jit
    def jitted(p, batch, k):
        loss, _ = loss_fn(unet_apply, p, batch, k, schedule, mcfg)
        return loss

    _VAL_JIT_CACHE.append((objs, jitted))
    return jitted


def validation_loss(unet_apply, params, dataset, schedule, config,
                    key: jax.Array, max_batches: int = 8,
                    num_time_ids: int = 6) -> Optional[float]:
    """Mean training-method loss over the validation set.

    Deterministic across calls (epoch-0 batch order, step-indexed rng keys
    derived from ``key``) so epoch-over-epoch values are comparable — this
    is what drives best-checkpoint selection when
    ``data.validation_data_dir`` is set (``SDXLTrainer.train``).  The loss
    is jitted per batch shape (bucketed datasets produce one executable per
    resolution, same as training)."""
    from sdxl_training_improvements_tpu.data.pipeline import (
        adapt_batch_time_ids, batches_for_epoch)

    loss_fn = get_method(config.training.method)
    mcfg = config.model
    jitted = _jitted_val_loss(loss_fn, unet_apply, schedule, mcfg)
    losses = []
    for i, batch in enumerate(batches_for_epoch(
            dataset, config.training.batch_size, epoch=0,
            seed=config.training.seed)):
        if i >= max_batches:
            break
        if num_time_ids != 6:  # refiner fine-tune: 5-id conditioning
            batch = adapt_batch_time_ids(
                batch, num_time_ids,
                getattr(mcfg, "aesthetic_score", 6.0))
        # fold_in(i), not split: the same key/batch pairing every call
        k = jax.random.fold_in(key, i)
        jbatch = {kk: jnp.asarray(v) for kk, v in batch.items()}
        losses.append(jitted(params, jbatch, k))
    return float(np.mean(jax.device_get(losses))) if losses else None
