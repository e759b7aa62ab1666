"""Template for new training methods (reference ``methods/example_method.py``).

Copy this file, rename the method, implement the numerics, and select it via
``training.method`` in the config — nothing else to wire (docs/extending.md).
This template registers a runnable ``example_method`` that trains the UNet
as a plain denoising autoencoder (predict the clean latents from noisy ones
at a fixed mid-schedule timestep) — deliberately trivial, but end-to-end
functional so the template can be smoke-run as-is.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from sdxl_training_improvements_tpu.training.methods import (
    _apply_tag_weights, _finite_guard, register_method, sample_keys)


@register_method("example_method")
def example_method_loss(unet_apply, params, batch, rng, schedule, mcfg
                        ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    x = batch["vae_latents"].astype(jnp.float32)
    b = x.shape[0]

    # 1. sample the method's randomness — prefer the trainer's per-sample
    #    keys (keeps the method exactly re-tilable by tpu.micro_batch_size);
    #    fall back to the micro-batch `rng` for direct calls
    keys = sample_keys(batch)
    if keys is None:
        noise = jax.random.normal(rng, x.shape)
    else:
        noise = jax.vmap(lambda k: jax.random.normal(k, x.shape[1:]))(keys)

    # 2. build the model input (here: fixed mid-schedule noise level)
    t = jnp.full((b,), schedule.num_timesteps // 2, jnp.int32)
    noisy = schedule.add_noise(x, noise, t)

    # 3. run the UNet once
    pred = unet_apply(params, noisy, t, batch["prompt_embeds"],
                      batch["pooled_prompt_embeds"], batch["time_ids"])

    # 4. the method's loss, as a mean of per-sample terms
    per_sample = jnp.mean((pred.astype(jnp.float32) - x) ** 2, axis=(1, 2, 3))

    # 5. standard tail: tag weighting + finite guard (keep these)
    per_sample = _apply_tag_weights(per_sample, batch)
    loss = _finite_guard(jnp.mean(per_sample))

    return loss, {"loss": loss,
                  "pred_scale": jnp.mean(jnp.abs(pred.astype(jnp.float32)))}
