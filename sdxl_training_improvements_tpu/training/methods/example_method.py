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
    _apply_tag_weights, _finite_guard, register_method)


@register_method("example_method")
def example_method_loss(unet_apply, params, batch, rng, schedule, mcfg
                        ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    x = batch["vae_latents"].astype(jnp.float32)
    b = x.shape[0]

    # 1. sample whatever randomness the method needs through `rng`
    noise = jax.random.normal(rng, x.shape)

    # 2. build the model input (here: fixed mid-schedule noise level)
    t = jnp.full((b,), schedule.num_timesteps // 2, jnp.int32)
    noisy = schedule.add_noise(x, noise, t)

    # 3. run the UNet once
    pred = unet_apply(params, noisy, t, batch["prompt_embeds"],
                      batch["pooled_prompt_embeds"], batch["time_ids"])

    # 4. the method's loss
    loss = jnp.mean((pred.astype(jnp.float32) - x) ** 2)

    # 5. standard tail: tag weighting + finite guard (keep these)
    loss = _apply_tag_weights(loss, batch)
    loss = _finite_guard(loss)

    return loss, {"loss": loss,
                  "pred_scale": jnp.mean(jnp.abs(pred.astype(jnp.float32)))}
