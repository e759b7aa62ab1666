"""8-bit-moment quality study (ROADMAP #3).

``optimizer.moments_8bit`` stores Adam's exp_avg/exp_avg_sq as 8-bit log
codes + one fp32 scale per leaf (``ops/quantize.py``) — 4 instead of 6
state bytes/param.  The unit suite proves convergence on small problems
(tests/test_optimizers.py::TestInt8Moments); this study asks the training
question: over a real multi-hundred-step fine-tune of the (tiny) SDXL UNet
through the production ddpm loss path, does moment quantization bend the
loss curve or the iterates?

Three arms, identical per-step batches and PRNG keys:

* ``bf16``  — adamw_bf16, bf16 moments (the production default)
* ``int8``  — adamw_bf16, 8-bit log-code moments
* ``fp32``  — optax.adamw over fp32 params (gold, no bf16 anywhere)

Writes ``outputs/int8_moments_study.json``: per-arm loss curves (window
means), the bf16-vs-int8 smoothed-loss divergence, and final param-space
distances.  CPU-runnable:

    env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= PYTHONPATH=/root/repo \
        python tools/study_int8_moments.py [steps]

Reference context: the reference's 8-bit story was bitsandbytes-style
optimizers it never shipped; its AdamW-bf16 keeps bf16 moments
(``adamw_bfloat16/__init__.py:107-128``).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
import optax

OUT = "/root/repo/outputs/int8_moments_study.json"


def build(arm: str):
    from sdxl_training_improvements_tpu.config import Config
    from sdxl_training_improvements_tpu.models.unet import SDXLUNet, UNetConfig
    from sdxl_training_improvements_tpu.training.methods import get_method
    from sdxl_training_improvements_tpu.training.optimizers.adamw_bf16 import (
        adamw_bf16)
    from sdxl_training_improvements_tpu.training.schedules import NoiseSchedule

    dtype = jnp.float32 if arm == "fp32" else jnp.bfloat16
    cfg = UNetConfig.tiny()
    model = SDXLUNet(config=cfg, dtype=dtype, param_dtype=dtype)
    sched = NoiseSchedule.create()
    loss_fn = get_method("ddpm")
    mcfg = Config().model

    b = 2
    sample = jnp.zeros((b, cfg.in_channels, 16, 16), dtype)
    ctx = jnp.zeros((b, 77, cfg.cross_attention_dim), dtype)
    pooled = jnp.zeros((b, cfg.pooled_embed_dim), dtype)
    time_ids = jnp.zeros((b, 6), jnp.float32)
    # one shared fp32 init cast per arm: sampling directly in bf16 draws
    # DIFFERENT values than fp32 (different bits->float pipeline), which
    # would make cross-arm comparisons init-confounded rather than
    # optimizer-confounded
    model32 = SDXLUNet(config=cfg, dtype=jnp.float32,
                       param_dtype=jnp.float32)
    params = jax.jit(model32.init)(
        jax.random.key(0), sample.astype(jnp.float32),
        jnp.zeros((b,), jnp.int32), ctx.astype(jnp.float32),
        pooled.astype(jnp.float32), time_ids)
    params = jax.tree.map(lambda x: x.astype(dtype), params)

    if arm == "fp32":
        opt = optax.adamw(5e-4, b1=0.9, b2=0.999, eps=1e-8,
                          weight_decay=0.01)
    else:
        opt = adamw_bf16(lr=5e-4, betas=(0.9, 0.999), eps=1e-8,
                         weight_decay=0.01, noise="hash",
                         moments="int8" if arm == "int8" else "bf16")
    opt_state = opt.init(params)

    def unet_apply(p, s_, t_, pe, pp, ti, rng=None):
        return model.apply(p, s_, t_, pe, pp, ti)

    @jax.jit
    def step(p, s, key):
        kb, kl = jax.random.split(key)
        batch = {
            "vae_latents": jax.random.normal(kb, sample.shape, jnp.float32),
            "prompt_embeds": ctx,
            "pooled_prompt_embeds": pooled,
            "time_ids": time_ids,
        }
        (loss, _), grads = jax.value_and_grad(
            lambda pp_: loss_fn(unet_apply, pp_, batch, kl, sched, mcfg),
            has_aux=True)(p)
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    return params, opt_state, step


def run_arm(arm: str, steps: int):
    params, opt_state, step = build(arm)
    losses = []
    t0 = time.perf_counter()
    for i in range(steps):
        # same key sequence in every arm -> same noise/timestep draws
        params, opt_state, loss = step(params, opt_state,
                                       jax.random.key(1000 + i))
        losses.append(float(loss))
    dt = time.perf_counter() - t0
    print(f"[{arm}] {steps} steps in {dt:.1f}s, "
          f"final-50 mean loss {np.mean(losses[-50:]):.5f}", flush=True)
    return np.asarray(losses), params


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    curves, finals = {}, {}
    for arm in ("bf16", "int8", "fp32"):
        curves[arm], finals[arm] = run_arm(arm, steps)

    def windows(c):
        k = max(1, len(c) // 8)
        return {
            "first_window_mean": round(float(np.mean(c[:k])), 6),
            "mid_window_mean": round(float(np.mean(c[len(c) // 2:
                                                     len(c) // 2 + k])), 6),
            "final_window_mean": round(float(np.mean(c[-k:])), 6),
        }

    # smoothed divergence between the production arm and the int8 arm
    w = max(1, steps // 16)
    kern = np.ones(w) / w
    sm = {a: np.convolve(curves[a], kern, mode="valid")
          for a in ("bf16", "int8")}
    rel = np.abs(sm["bf16"] - sm["int8"]) / np.maximum(np.abs(sm["bf16"]),
                                                       1e-12)

    def pdist(a, b):
        num = den = 0.0
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            d = np.asarray(x, np.float64) - np.asarray(y, np.float64)
            num += float((d * d).sum())
            den += float(np.asarray(x, np.float64).__pow__(2).sum())
        return (num / max(den, 1e-30)) ** 0.5

    out = {
        "steps": steps,
        "arms": {a: windows(curves[a]) for a in curves},
        "bf16_vs_int8_smoothed_rel_divergence_max": round(float(rel.max()), 6),
        "bf16_vs_int8_smoothed_rel_divergence_final": round(float(rel[-1]), 6),
        "param_rel_dist_bf16_vs_int8": round(pdist(finals["bf16"],
                                                   finals["int8"]), 6),
        "param_rel_dist_bf16_vs_fp32": round(pdist(finals["bf16"],
                                                   finals["fp32"]), 6),
        "note": ("int8 is acceptable when its divergence from bf16 moments "
                 "is the same order as bf16's own divergence from the fp32 "
                 "gold arm (quantization noise ≤ bf16 rounding noise)"),
    }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
