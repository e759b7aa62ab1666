"""Pluggable training methods as pure loss functions.

The reference's method plugin contract is a trainer subclass with a
``compute_loss`` override selected by ``config.training.method``
(``sdxl_trainer.py:127-152``, ``methods/example_method.py``).  The TPU-native
equivalent is a registry of *pure loss functions* — everything else (grad
accumulation, clipping, optimizer, sharding) lives in the one jitted train
step, so a new method is exactly one function + one registry entry, still a
one-line config change away (SURVEY.md §7 design stance).

Signature::

    loss_fn(unet_apply, params, batch, rng, schedule, mcfg) -> (loss, metrics)

with ``batch`` carrying the reference's batch contract
(``ddpm_trainer.py:284-296``): ``vae_latents`` [B,C,H,W], ``prompt_embeds``
[B,77,2048], ``pooled_prompt_embeds`` [B,1280], ``time_ids`` [B,6], and
optional ``tag_weights`` [B].
"""
from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from sdxl_training_improvements_tpu.training import schedules as S

LOSS_CLAMP = 1000.0  # reference finite-guard ceiling (ddpm_trainer.py:379-384)

LossFn = Callable[..., Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]]
LOSS_REGISTRY: Dict[str, LossFn] = {}


def register_method(name: str):
    def deco(fn: LossFn) -> LossFn:
        LOSS_REGISTRY[name] = fn
        return fn
    return deco


def get_method(name: str) -> LossFn:
    if name not in LOSS_REGISTRY:
        raise ValueError(f"Unknown training method: {name!r}. "
                         f"Available: {sorted(LOSS_REGISTRY)}")
    return LOSS_REGISTRY[name]


def _finite_guard(loss: jnp.ndarray) -> jnp.ndarray:
    """Reference NaN posture: non-finite -> 1000.0, else clamp(max=1000)
    (``ddpm_trainer.py:379-384``) — as a branchless jnp.where.

    Double-where keeps the backward clean: the gradient must be exactly zero
    (the reference detaches by constructing a fresh tensor), not NaN from
    0 * inf through the discarded branch.
    """
    finite = jnp.isfinite(loss)
    safe = jnp.where(finite, loss, 0.0)
    return jnp.where(finite, jnp.minimum(safe, LOSS_CLAMP),
                     jnp.float32(LOSS_CLAMP))


def _finite_elements(err: jnp.ndarray) -> jnp.ndarray:
    """Element-level guard for squared errors: overflowed elements become a
    large constant with ZERO gradient, so one inf pixel cannot poison the
    whole gradient with NaN (0 * inf) while the loss still spikes visibly."""
    return jnp.where(jnp.isfinite(err), err, jnp.float32(LOSS_CLAMP))


def _apply_tag_weights(per_sample: jnp.ndarray, batch) -> jnp.ndarray:
    """Per-sample tag weighting: ``l_i *= w_i``.

    The reference computes per-image weights and then collapses them —
    ``loss = loss * tag_weights.mean()`` (``ddpm_trainer.py:347-368``),
    multiplying the batch-mean loss by the batch-mean weight — which (a)
    discards the per-image weighting it just built and (b) makes every
    sample's effective weight depend on which other samples share its
    batch.  We keep each image's weight on that image: the semantics the
    tag weighter computed, and invariant under ``tpu.micro_batch_size``
    re-tiling (the weighted batch mean is the same sum regardless of how
    the batch is split into micro-batches).

    A scalar (0-d) loss keeps the legacy contract — ``loss * tw.mean()``,
    the reference's collapse — so method plugins written against the
    pre-round-3 example (``loss = _apply_tag_weights(loss, batch)`` on an
    already-reduced loss) still return a scalar instead of broadcasting
    to ``(B,)`` and failing ``value_and_grad`` at trace time."""
    tw = batch.get("tag_weights")
    if tw is None:
        return per_sample
    tw = tw.astype(jnp.float32)
    if per_sample.ndim == 0:
        return per_sample * tw.mean()
    return per_sample * tw


def sample_keys(batch) -> "jax.Array | None":
    """Per-sample PRNG keys threaded by the trainer, or None.

    The train step keys every sample's randomness (noise, timesteps) by its
    position in the GLOBAL batch (``trainer.py``), carried through the
    accumulation scan as raw ``key_data`` so it reshapes/shards like any
    other batch leaf.  Methods that consume these are exactly re-tilable by
    ``tpu.micro_batch_size``; a method that ignores them still works but its
    draws become micro-batch-shaped (the pre-round-3 behavior)."""
    kd = batch.get("sample_keys")
    if kd is None:
        return None
    return jax.random.wrap_key_data(kd)


@register_method("ddpm")
def ddpm_loss(unet_apply, params, batch, rng, schedule: S.NoiseSchedule,
              mcfg) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """DDPM / v-prediction loss with ZTSNR + MinSNR.

    Numerics of ``DDPMTrainer.training_step`` (``ddpm_trainer.py:280-401``):
    sample noise + uniform timesteps, ``add_noise`` (x + sigma*eps, ZTSNR
    clamp), UNet prediction, target = eps or the reference's velocity
    ``(eps-x)/sigma``, MinSNR-weighted MSE, tag weighting, finite guard.
    """
    x = batch["vae_latents"]
    keys = sample_keys(batch)
    if keys is None:  # direct call (validation, parity tools): micro-keyed
        k_noise, k_t, k_apply = jax.random.split(rng, 3)
        kn = kt = None
    else:  # trainer path: sample-position-keyed -> re-tiling-invariant
        k_apply = rng  # dropout masks (off by default) stay micro-keyed
        ks2 = jax.vmap(lambda k: jax.random.split(k, 2))(keys)
        kn, kt = ks2[:, 0], ks2[:, 1]
    # deterministic-replay overrides: when the batch carries explicit
    # "noise"/"timesteps" (parity harnesses, reproduction of a logged step),
    # consume them instead of sampling — the loss becomes a pure function of
    # the batch.
    noise = batch.get("noise")
    if noise is None:
        if kn is None:
            noise = jax.random.normal(k_noise, x.shape, dtype=jnp.float32)
        else:
            noise = jax.vmap(lambda k: jax.random.normal(
                k, x.shape[1:], dtype=jnp.float32))(kn)
    t = batch.get("timesteps")
    if t is None:
        weights = None
        if getattr(mcfg, "timestep_bias_strategy", "none") != "none":
            n = schedule.num_timesteps
            weights = S.generate_timestep_weights(
                n, mcfg.timestep_bias_strategy,
                bias_portion=getattr(mcfg, "timestep_bias_portion", 0.25),
                bias_multiplier=getattr(mcfg, "timestep_bias_multiplier", 2.0),
                bias_begin=int(getattr(mcfg, "timestep_bias_min", 0.0) * n),
                bias_end=int(getattr(mcfg, "timestep_bias_max", 1.0) * n))
        if kt is None:
            t = schedule.sample_timesteps(k_t, x.shape[0], weights=weights)
        else:
            t = jax.vmap(lambda k: schedule.sample_timesteps(
                k, 1, weights=weights)[0])(kt)

    x32 = x.astype(jnp.float32)
    noisy = schedule.add_noise(x32, noise, t)
    pred = unet_apply(params, noisy, t, batch["prompt_embeds"],
                      batch["pooled_prompt_embeds"], batch["time_ids"],
                      rng=k_apply)
    pred = pred.astype(jnp.float32)

    if schedule.prediction_type == "v_prediction":
        target = schedule.get_velocity(x32, noise, t)
    else:
        target = noise

    mse = _finite_elements((pred - target) ** 2)
    # per-sample decomposition: mean(mse * w[:,None,None,None]) ==
    # mean_i(w_i * mean_pix(mse_i)) — same numerics, and per-sample form
    # keeps the loss a mean of per-sample terms (re-tiling-invariant)
    per_sample = jnp.mean(mse, axis=(1, 2, 3))
    if schedule.min_snr_gamma is not None:
        per_sample = per_sample * schedule.min_snr_weight(t)
    per_sample = _apply_tag_weights(per_sample, batch)
    loss = _finite_guard(jnp.mean(per_sample))

    tf = t.astype(jnp.float32)
    metrics = {
        "loss": loss,
        "timestep_mean": jnp.mean(tf),
        "timestep_std": jnp.std(tf),
        "noise_scale": jnp.mean(jnp.abs(noise)),
        "pred_scale": jnp.mean(jnp.abs(pred)),
    }
    return loss, metrics


@register_method("flow_matching")
def flow_matching_loss(unet_apply, params, batch, rng,
                       schedule: S.NoiseSchedule, mcfg
                       ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Optimal-transport flow matching with logit-normal time sampling.

    Numerics of ``FlowMatchingTrainer._compute_loss_impl`` (``flow_matching_
    trainer.py:267-352,373-419``): t ~ sigmoid(N(0,1)), x0 ~ N(0,I),
    xt = (1-t)x0 + t*x1, v_true = x1 - x0, per-sample-mean MSE -> mean.
    The UNet runs ONCE (the reference's double forward at ``:319+418`` is a
    ledger defect we do not carry).
    """
    x1 = batch["vae_latents"].astype(jnp.float32)
    keys = sample_keys(batch)
    if keys is None:  # direct call: micro-keyed (see ddpm)
        k_t, k_x0, k_apply = jax.random.split(rng, 3)
        kx0 = kt = None
    else:  # trainer path: sample-position-keyed -> re-tiling-invariant
        k_apply = rng
        ks2 = jax.vmap(lambda k: jax.random.split(k, 2))(keys)
        kx0, kt = ks2[:, 0], ks2[:, 1]
    t = batch.get("timesteps")  # deterministic-replay override (see ddpm)
    if t is None:
        if kt is None:
            t = S.sample_logit_normal(k_t, (x1.shape[0],))
        else:
            t = jax.vmap(lambda k: S.sample_logit_normal(k, ()))(kt)
    x0 = batch.get("noise")
    if x0 is None:
        if kx0 is None:
            x0 = jax.random.normal(k_x0, x1.shape, dtype=jnp.float32)
        else:
            x0 = jax.vmap(lambda k: jax.random.normal(
                k, x1.shape[1:], dtype=jnp.float32))(kx0)

    xt = S.optimal_transport_path(x0, x1, t)
    v_pred = unet_apply(params, xt, t, batch["prompt_embeds"],
                        batch["pooled_prompt_embeds"], batch["time_ids"],
                        rng=k_apply)
    v_pred = v_pred.astype(jnp.float32)
    v_true = S.flow_matching_target(x0, x1)

    per_sample = jnp.mean(_finite_elements((v_pred - v_true) ** 2),
                          axis=(1, 2, 3))
    per_sample = _apply_tag_weights(per_sample, batch)
    loss = _finite_guard(jnp.mean(per_sample))

    metrics = {
        "loss": loss,
        "x0_norm": jnp.linalg.norm(x0.reshape(-1)),
        "x1_norm": jnp.linalg.norm(x1.reshape(-1)),
        "velocity_norm": jnp.linalg.norm(v_pred.reshape(-1)),
        "time_mean": jnp.mean(t),
        "time_std": jnp.std(t),
    }
    return loss, metrics


# self-registering extra methods (import side effects populate the registry)
from sdxl_training_improvements_tpu.training.methods import (  # noqa: E402,F401
    example_method as _example_method)
