"""Ahead-of-time (AOT) serving export: serialize the full text-to-image
program with ``jax.export`` into a portable deployment artifact.

TPU-native serving story: everything the pipeline runs on device — dual-CLIP
prompt encoding, the CFG denoise loop (the sampler's ``lax.scan``), and the
fp32 VAE decode to uint8 pixels — is traced ONCE, lowered to StableHLO, and
serialized.  A serving host then deserializes and runs the pinned program:

* zero retrace / recompile churn at startup (the multi-minute SDXL trace
  cost is paid at export time, not per replica);
* the executed HLO is version-pinned — a jax upgrade on the serving fleet
  cannot silently change the numerics of a deployed model;
* the artifact is pure XLA (Mosaic kernels are forced off during tracing),
  so one export runs on every platform it was lowered for (default: tpu and
  cpu — export on a CPU build host, deploy on TPU serving hosts).

Weights are NOT baked into the artifact: the exported functions take the
param pytrees as arguments, so the artifact is a few MB of StableHLO and the
checkpoint stays in its normal safetensors layout (one artifact serves every
fine-tune of the same topology).  Host-side work (tokenization) stays in
Python via the normal ``TokenizerPair``.

Static per-artifact choices (the scan structure): batch size, resolution,
step count, sampler family (euler | dpmpp_2m), method (ddpm |
flow_matching), and the DeepCache interval.  Runtime-adjustable inputs:
prompts (token ids), seed (PRNG key data), and ``guidance_scale`` (a traced
scalar — one artifact serves every CFG strength).

Reference context: the reference's serving story was handing back a
diffusers ``StableDiffusionXLPipeline`` (``src/models/sdxl.py:188-198``) —
a Python object graph that retraces/recompiles per process and pins nothing.

Layout of an artifact directory::

    artifact/
      meta.json       # shapes, sampler family, schedule summary, versions
      denoise.jaxexp  # (params, ids_l, ids_g, key_data, guidance) -> latents
      decode.jaxexp   # (vae_params, latents) -> uint8 NHWC images
"""
from __future__ import annotations

import dataclasses
import json
import os
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from sdxl_training_improvements_tpu.training import schedules as S

_DENOISE = "denoise.jaxexp"
_DECODE = "decode.jaxexp"
_META = "meta.json"
_FORMAT_VERSION = 1


def _specs_of(tree):
    return jax.tree.map(lambda x: jax.ShapeDtypeStruct(jnp.shape(x),
                                                       jnp.asarray(x).dtype),
                        tree)


def _encode_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """The subtree the denoise program consumes (no VAE)."""
    return {k: params[k] for k in ("unet", "clip_l", "clip_g") if k in params}


def _shape_digest(params: Dict[str, Any]) -> str:
    """sha256 over sorted (path, shape, dtype) of the components an artifact
    consumes — a topology fingerprint: any checkpoint of the exported
    topology matches, a different UNet/CLIP/VAE shape does not."""
    import hashlib
    lines = []
    for comp in sorted(set(params) & {"unet", "vae", "clip_l", "clip_g"}):
        for path, leaf in jax.tree_util.tree_flatten_with_path(
                params[comp])[0]:
            lines.append(f"{comp}{jax.tree_util.keystr(path)}:"
                         f"{tuple(leaf.shape)}:{leaf.dtype}")
    return hashlib.sha256("\n".join(sorted(lines)).encode()).hexdigest()


def _build_denoise(pipeline, n: int, height: int, width: int,
                   num_inference_steps: int, aesthetic_score: float,
                   negative_aesthetic_score: float):
    """Pure (params, ids_l, ids_g, key_data, guidance) -> latents, mirroring
    ``ValidationSampler.generate``'s text2img path (validation.py) below the
    tokenizer boundary, with guidance as a traced scalar."""
    from sdxl_training_improvements_tpu.models.clip import (
        encode_dual, encode_g)
    from sdxl_training_improvements_tpu.training.validation import (
        ValidationSampler)

    model = pipeline.model
    # jax.export tracing abstracts closed-over DEVICE arrays (so host
    # constants can't silently bake into the artifact) — the samplers read
    # scalar floats off ``schedule.sigmas`` at trace time, so hand the
    # tracer a host-constant (numpy) copy of the ramp.
    import dataclasses as _dc
    schedule = _dc.replace(pipeline.schedule,
                           sigmas=np.asarray(pipeline.schedule.sigmas))
    vs = ValidationSampler(model, pipeline.tokenizers, schedule,
                           num_inference_steps=num_inference_steps,
                           method=pipeline.method, sampler=pipeline.sampler,
                           deep_cache_interval=pipeline.deep_cache, mesh=None)
    f = model.vae.config.downscale_factor
    lat_shape = (n, model.unet_config.in_channels, height // f, width // f)

    def run(params, ids_l, ids_g, key_data, guidance):
        key = jax.random.wrap_key_data(key_data)
        if model.clip_l is None:  # refiner bundle: single-encoder CLIP-G
            enc = encode_g(model.clip_g, params["clip_g"], ids_g)
        else:
            enc = encode_dual(model.clip_l, params["clip_l"],
                              model.clip_g, params["clip_g"], ids_l, ids_g)
        pe, pooled, time_ids = vs._conditioning(
            enc, n, height, width, aesthetic_score, negative_aesthetic_score)
        if pipeline.method == "flow_matching":
            fn = vs._flow_denoiser(params["unet"], pe, pooled, time_ids,
                                   guidance=guidance)
            return S.sample_flow(fn, key, lat_shape,
                                 num_steps=num_inference_steps)
        aux0 = None
        if pipeline.deep_cache > 1:
            fn = vs._cached_denoiser(params["unet"], pe, pooled, time_ids,
                                     guidance=guidance)
            aux0 = vs._deep_cache_aux0(n, height, width)
        else:
            fn = vs._denoiser(params["unet"], pe, pooled, time_ids,
                              guidance=guidance)
        sample = (S.sample_dpmpp_2m if pipeline.sampler == "dpmpp_2m"
                  else S.sample_ztsnr)
        return sample(fn, key, lat_shape, schedule,
                      num_steps=num_inference_steps, aux0=aux0)

    return run


def _build_decode(model):
    """(vae_params, latents) -> uint8 NHWC images; on-device equivalent of
    ``validation.latents_to_images`` (clip -> nan_to_num -> [0,255])."""

    def decode(vae_params, latents):
        dec = model.vae.apply(vae_params, latents.astype(jnp.float32),
                              method=model.vae.decode)
        img = jnp.clip(dec, -1.0, 1.0)
        img = jnp.nan_to_num(img, nan=0.0, posinf=1.0, neginf=-1.0)
        img = ((img + 1.0) * 127.5).astype(jnp.uint8)
        return jnp.transpose(img, (0, 2, 3, 1))

    return decode


def export_text2img(pipeline, out_dir, *, batch: int = 1,
                    height: int = 1024, width: int = 1024,
                    num_inference_steps: int = 28,
                    guidance_scale: float = 5.0,
                    aesthetic_score: float = 6.0,
                    negative_aesthetic_score: float = 2.5,
                    platforms: Sequence[str] = ("tpu", "cpu")) -> Path:
    """Export ``pipeline``'s text2img path as an AOT artifact directory.

    ``platforms`` selects the lowering targets (multi-platform StableHLO:
    export anywhere, run on any listed platform).  ``guidance_scale`` here
    is only the recorded default — the exported program takes guidance as a
    runtime input.  Requires ``pipeline.model.params`` to be populated (the
    export traces with the real param SHAPES; values are not serialized).
    """
    params = pipeline.model.params
    required = {"unet", "vae", "clip_g"}
    if pipeline.model.clip_l is not None:
        required.add("clip_l")  # base topology traces the dual encoder
    missing = required - set(params)
    if missing:
        raise ValueError(f"pipeline params missing components: {missing} — "
                         "load or init the model before exporting")
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    seq = 77
    ids_spec = jax.ShapeDtypeStruct((2 * batch, seq), jnp.int32)
    key_spec = _specs_of(jax.random.key_data(jax.random.key(0)))
    g_spec = jax.ShapeDtypeStruct((), jnp.float32)
    f = pipeline.model.vae.config.downscale_factor
    lat_spec = jax.ShapeDtypeStruct(
        (batch, pipeline.model.unet_config.in_channels,
         height // f, width // f), jnp.float32)

    # The artifact must be pure XLA: a Mosaic custom call baked in at trace
    # time would pin it to one device generation (and trip jax.export's
    # custom-call safety checks).  Force the probe-gated kernels off for the
    # duration of the trace.
    forced = {"SDXL_TPU_FUSED_GN": "0", "SDXL_TPU_FLASH": "0",
              "SDXL_TPU_MOSAIC": "slow"}
    saved = {k: os.environ.get(k) for k in forced}
    os.environ.update(forced)
    # SDXL_TPU_MOSAIC='slow' is read through probe.mosaic_native's lru_cache;
    # if the probe already ran in-process the override would be a no-op, so
    # drop the cached verdict for the duration of the trace (and again after,
    # so the forced env doesn't leak into the restored verdict).
    from sdxl_training_improvements_tpu.ops import probe as _probe
    _probe.mosaic_native.cache_clear()
    try:
        run = _build_denoise(pipeline, batch, height, width,
                             num_inference_steps, aesthetic_score,
                             negative_aesthetic_score)
        exp_d = jax_export.export(jax.jit(run), platforms=tuple(platforms))(
            _specs_of(_encode_params(params)), ids_spec, ids_spec,
            key_spec, g_spec)
        dec = _build_decode(pipeline.model)
        exp_v = jax_export.export(jax.jit(dec), platforms=tuple(platforms))(
            _specs_of(params["vae"]), lat_spec)
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        _probe.mosaic_native.cache_clear()

    (out / _DENOISE).write_bytes(exp_d.serialize())
    (out / _DECODE).write_bytes(exp_v.serialize())
    sched = pipeline.schedule
    meta = {
        "format_version": _FORMAT_VERSION,
        "jax_version": jax.__version__,
        "platforms": list(platforms),
        "batch": batch, "height": height, "width": width,
        "seq_len": seq,
        "num_inference_steps": num_inference_steps,
        "method": pipeline.method,
        "sampler": pipeline.sampler,
        "deep_cache": pipeline.deep_cache,
        "default_guidance_scale": guidance_scale,
        "aesthetic_score": aesthetic_score,
        "negative_aesthetic_score": negative_aesthetic_score,
        "refiner": pipeline.model.clip_l is None,
        "param_shape_digest": _shape_digest(params),
        "schedule": {
            "prediction_type": sched.prediction_type,
            "num_timesteps": int(sched.num_timesteps),
            "use_ztsnr": bool(sched.use_ztsnr),
            "rho": float(sched.rho),
            # sigmas is the descending Karras ramp
            "sigma_min": float(sched.sigmas[-1]),
            "sigma_max": float(sched.sigmas[0]),
        },
    }
    (out / _META).write_text(json.dumps(meta, indent=1))
    return out


@dataclasses.dataclass
class AOTPipeline:
    """Deploy-time runner over a loaded artifact + a weight tree.

    ``params`` is the standard bundle dict (``unet``/``vae``/``clip_l``/
    ``clip_g``) from any checkpoint of the exported topology; ``tokenizers``
    a ``TokenizerPair``.  The exported programs execute as serialized —
    no retracing, no dependence on the framework's model code.
    """

    meta: Dict[str, Any]
    denoise: Any  # jax.export.Exported
    decode: Any   # jax.export.Exported
    params: Dict[str, Any]
    tokenizers: Any

    @classmethod
    def load(cls, artifact_dir, params: Dict[str, Any],
             tokenizers) -> "AOTPipeline":
        d = Path(artifact_dir)
        meta = json.loads((d / _META).read_text())
        if meta.get("format_version") != _FORMAT_VERSION:
            raise ValueError(
                f"artifact {d} has format_version "
                f"{meta.get('format_version')}; this runtime reads "
                f"{_FORMAT_VERSION}")
        # Topology validation up front: a mismatched checkpoint would
        # otherwise surface as an opaque pytree/shape error deep inside
        # denoise.call (round-3 advisor finding).
        if meta.get("refiner") != ("clip_l" not in params):
            kind = "refiner" if meta.get("refiner") else "base (dual-CLIP)"
            have = ("refiner (no clip_l)" if "clip_l" not in params
                    else "base (has clip_l)")
            raise ValueError(
                f"artifact {d} was exported for a {kind} topology but the "
                f"supplied checkpoint is {have}")
        want = meta.get("param_shape_digest")
        if want is not None:
            got = _shape_digest(params)
            if got != want:
                raise ValueError(
                    f"artifact {d} was exported for a different param "
                    f"topology: artifact shape digest {want[:12]}…, "
                    f"checkpoint {got[:12]}… — use a checkpoint of the "
                    "exported topology or re-export the artifact")
        return cls(meta=meta,
                   denoise=jax_export.deserialize(
                       (d / _DENOISE).read_bytes()),
                   decode=jax_export.deserialize((d / _DECODE).read_bytes()),
                   params=params, tokenizers=tokenizers)

    @classmethod
    def from_pretrained(cls, artifact_dir, model_dir,
                        tiny: bool = False) -> "AOTPipeline":
        """Artifact + a diffusers-layout checkpoint directory.  The
        framework's loader supplies weights and tokenizers; the device
        programs come from the artifact."""
        from sdxl_training_improvements_tpu.pipelines import SDXLPipeline
        pipe = SDXLPipeline.from_pretrained(model_dir, tiny=tiny)
        return cls.load(artifact_dir, pipe.model.params, pipe.tokenizers)

    def generate_latents(self, prompts: Sequence[str],
                         negative_prompts: Optional[Sequence[str]] = None,
                         seed: int = 0,
                         guidance_scale: Optional[float] = None):
        n = self.meta["batch"]
        if len(prompts) != n:
            raise ValueError(
                f"artifact was exported for batch {n}, got {len(prompts)} "
                "prompts (batch is static in an AOT program)")
        negs = (list(negative_prompts) if negative_prompts
                else [""] * n)
        if len(negs) != n:
            raise ValueError(f"negative_prompts ({len(negs)}) must match "
                             f"prompts ({n})")
        ids_l, ids_g = self.tokenizers(list(prompts) + negs)
        g = (self.meta["default_guidance_scale"] if guidance_scale is None
             else guidance_scale)
        return self.denoise.call(
            _encode_params(self.params),
            jnp.asarray(ids_l, jnp.int32), jnp.asarray(ids_g, jnp.int32),
            jax.random.key_data(jax.random.key(seed)),
            jnp.float32(g))

    def __call__(self, prompts: Sequence[str],
                 negative_prompts: Optional[Sequence[str]] = None,
                 seed: int = 0,
                 guidance_scale: Optional[float] = None
                 ) -> List[np.ndarray]:
        latents = self.generate_latents(prompts, negative_prompts, seed,
                                        guidance_scale)
        imgs = self.decode.call(self.params["vae"],
                                jnp.asarray(latents, jnp.float32))
        return [np.asarray(a) for a in np.asarray(imgs)]
