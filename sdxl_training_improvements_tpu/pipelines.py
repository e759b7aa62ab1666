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


class SDXLPipeline:
    def __init__(self, model: SDXLModel, tokenizers: TokenizerPair,
                 schedule: Optional[NoiseSchedule] = None,
                 method: str = "ddpm", mesh=None):
        self.model = model
        self.tokenizers = tokenizers
        self.schedule = schedule or NoiseSchedule.create()
        self.method = method  # routes the sampler (ddpm | flow_matching)
        # serving parallelism: a jax.sharding.Mesh TP-splits the UNet over
        # the tensor axis and data-parallels the CFG-stacked batch
        # (ValidationSampler semantics); None = single device
        self.mesh = mesh

    @staticmethod
    def declared_method(model_dir) -> Optional[str]:
        """``training.method`` as the checkpoint's exported ``config.json``
        declares it (written by ``export_diffusers``), or None when the
        checkpoint predates the field / is a plain diffusers export."""
        import json
        cfg_path = Path(model_dir) / "config.json"
        try:
            raw = json.loads(cfg_path.read_text())
            return raw.get("training", {}).get("method") or None
        except (OSError, ValueError):
            return None

    @classmethod
    def detect_method(cls, model_dir) -> str:
        """``declared_method`` with the "ddpm" default for undeclared
        checkpoints."""
        return cls.declared_method(model_dir) or "ddpm"

    @classmethod
    def from_pretrained(cls, model_dir, tiny: bool = False,
                        schedule: Optional[NoiseSchedule] = None,
                        method: Optional[str] = None,
                        mesh=None) -> "SDXLPipeline":
        """``method=None`` auto-detects from the checkpoint's config.json —
        a flow-matching-trained checkpoint must not be sampled through the
        sigma-space ZTSNR sampler (and vice versa)."""
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
        model = SDXLModel.create(tiny=tiny)
        model.params = import_diffusers(model, model_dir)
        missing = {"unet", "vae", "clip_l", "clip_g"} - set(model.params)
        if missing:
            raise FileNotFoundError(
                f"checkpoint at {model_dir} missing components: {missing}")
        return cls(model, load_tokenizers(Path(model_dir)), schedule,
                   method=method, mesh=mesh)

    @classmethod
    def from_model(cls, model: SDXLModel,
                   tokenizers: Optional[TokenizerPair] = None,
                   schedule: Optional[NoiseSchedule] = None,
                   method: str = "ddpm", mesh=None) -> "SDXLPipeline":
        return cls(model, tokenizers or TokenizerPair.fallback(), schedule,
                   method=method, mesh=mesh)

    def __call__(self, prompts: Sequence[str], height: int = 1024,
                 width: int = 1024, num_inference_steps: int = 28,
                 guidance_scale: float = 5.0, seed: int = 0,
                 negative_prompts: Optional[Sequence[str]] = None
                 ) -> List[np.ndarray]:
        sampler = ValidationSampler(self.model, self.tokenizers,
                                    self.schedule,
                                    num_inference_steps=num_inference_steps,
                                    guidance_scale=guidance_scale,
                                    method=self.method, mesh=self.mesh)
        return sampler.generate(self.model.params["unet"], list(prompts),
                                jax.random.key(seed), height=height,
                                width=width,
                                negative_prompts=negative_prompts)
