"""Loss-curve parity harness.

BASELINE.json's north star requires <=1% loss-curve divergence over 1k steps
vs the PyTorch reference.  This tool produces the comparable artifact: a
fixed-seed loss curve over deterministic synthetic latents for any config,
written as JSON.  Run it on two implementations (or two versions of this
one) and diff:

    python tools/parity_check.py --method ddpm --steps 100 --out curve.json
    python tools/parity_check.py --compare a.json b.json   # max rel. divergence

Determinism: latents/noise/timesteps all derive from the seed through
explicit PRNG keys, so curves are bit-reproducible given the same config and
software version.
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def run_curve(method: str, steps: int, seed: int, batch: int, size: int):
    import jax
    import jax.numpy as jnp
    from sdxl_training_improvements_tpu.config import Config
    from sdxl_training_improvements_tpu.models.sdxl import SDXLModel
    from sdxl_training_improvements_tpu.training.optimizers import (
        make_optimizer)
    from sdxl_training_improvements_tpu.training.schedules import (
        NoiseSchedule)
    from sdxl_training_improvements_tpu.training.trainer import (
        create_train_state, make_train_step)

    cfg = Config()
    cfg.training.method = method
    cfg.training.gradient_accumulation_steps = 1
    cfg.optimizer.optimizer_type = "adamw"
    cfg.optimizer.learning_rate = 1e-4

    model = SDXLModel.create(tiny=True, dtype=jnp.float32,
                             init_rng=jax.random.key(seed))
    step_fn = make_train_step(model.unet_apply,
                              NoiseSchedule.from_config(cfg),
                              make_optimizer(cfg), cfg, donate=False)
    state = create_train_state(model.trainable_params(), make_optimizer(cfg),
                               seed=seed)
    ucfg = model.unet_config
    data_key = jax.random.key(seed + 1)
    losses = []
    for i in range(steps):
        data_key, k1, k2, k3 = jax.random.split(data_key, 4)
        batch_dict = {
            "vae_latents": jax.random.normal(k1, (batch, 4, size, size)),
            "prompt_embeds": jax.random.normal(
                k2, (batch, 77, ucfg.cross_attention_dim)) * 0.1,
            "pooled_prompt_embeds": jax.random.normal(
                k3, (batch, ucfg.pooled_embed_dim)) * 0.1,
            "time_ids": jnp.tile(
                jnp.asarray([[size * 8., size * 8., 0., 0.,
                              size * 8., size * 8.]]), (batch, 1)),
        }
        state, metrics = step_fn(state, batch_dict)
        losses.append(float(metrics["loss"]))
    return losses


def compare(path_a: str, path_b: str) -> int:
    a = json.loads(Path(path_a).read_text())["losses"]
    b = json.loads(Path(path_b).read_text())["losses"]
    n = min(len(a), len(b))
    if n == 0:
        print("empty curves")
        return 2
    import numpy as np
    a, b = np.asarray(a[:n]), np.asarray(b[:n])
    denom = np.maximum(np.abs(a), 1e-8)
    rel = np.abs(a - b) / denom
    print(json.dumps({
        "steps_compared": n,
        "max_rel_divergence": float(rel.max()),
        "mean_rel_divergence": float(rel.mean()),
        "within_1pct": bool(rel.max() <= 0.01),
    }))
    return 0 if rel.max() <= 0.01 else 1


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--method", default="ddpm")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--size", type=int, default=16)
    p.add_argument("--out", default="parity_curve.json")
    p.add_argument("--compare", nargs=2, metavar=("A", "B"))
    args = p.parse_args()
    if args.compare:
        sys.exit(compare(*args.compare))
    losses = run_curve(args.method, args.steps, args.seed, args.batch,
                       args.size)
    Path(args.out).write_text(json.dumps({
        "method": args.method, "steps": args.steps, "seed": args.seed,
        "losses": losses}))
    print(f"wrote {args.out}: first={losses[0]:.6f} last={losses[-1]:.6f}")


if __name__ == "__main__":
    main()
