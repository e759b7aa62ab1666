"""Loss-curve parity harness — JAX rebuild vs a torch twin of the reference.

BASELINE.json's north star requires <=1% loss-curve divergence over 1k steps
vs the PyTorch reference.  The reference itself cannot run here (no GPU, no
diffusers), so the comparison target is ``tools/torch_twin.py``: the
reference's DDPM loss numerics (``ddpm_trainer.py:280-401`` +
``novelai_v3.py``) on a key-exact torch twin of the diffusers UNet.  Both
sides consume the SAME weights (twin init), the SAME data stream, the SAME
noise and timesteps (deterministic-replay batch overrides), and plain AdamW
with identical hyperparameters — any curve divergence is implementation
error, not sampling noise.

    python tools/parity_check.py --impl jax   --steps 1000 --out jax.json
    python tools/parity_check.py --impl torch --steps 1000 --out torch.json
    python tools/parity_check.py --compare jax.json torch.json

``--impl jax-self`` keeps the old self-curve mode (bit-reproducibility of
this implementation across versions).
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

LR = 1e-5
WD = 0.01
BETAS = (0.9, 0.999)
EPS = 1e-8
CLIP = 1.0


def gen_step_data(rng: np.random.Generator, batch: int, size: int,
                  ctx_dim: int, pooled_dim: int, num_timesteps: int,
                  method: str = "ddpm") -> dict:
    """One step's batch + injected noise/timesteps, all numpy fp32.

    For flow matching the injected ``timesteps`` are the logit-normal
    t in [0,1] (the method's deterministic-replay override)."""
    if method == "flow_matching":
        t = (1.0 / (1.0 + np.exp(-rng.standard_normal(batch)))
             ).astype(np.float32)
    else:
        t = rng.integers(0, num_timesteps, (batch,)).astype(np.int32)
    return {
        "vae_latents": rng.standard_normal(
            (batch, 4, size, size), dtype=np.float32),
        "prompt_embeds": 0.1 * rng.standard_normal(
            (batch, 77, ctx_dim), dtype=np.float32),
        "pooled_prompt_embeds": 0.1 * rng.standard_normal(
            (batch, pooled_dim), dtype=np.float32),
        "time_ids": np.tile(np.asarray(
            [[size * 8., size * 8., 0., 0., size * 8., size * 8.]],
            np.float32), (batch, 1)),
        "noise": rng.standard_normal((batch, 4, size, size),
                                     dtype=np.float32),
        "timesteps": t,
    }


def _twin_weights(seed: int):
    import torch
    from sdxl_training_improvements_tpu.models.unet import UNetConfig
    from tools.torch_twin import TorchTwinUNet
    cfg = UNetConfig.tiny()
    torch.manual_seed(seed)
    return cfg, TorchTwinUNet(cfg)


def run_torch(steps: int, seed: int, batch: int, size: int,
              method: str = "ddpm") -> list:
    """Reference loss path (torch twin) + plain AdamW + global-norm clip."""
    import torch
    from tools.torch_twin import TorchLossTwin
    cfg, unet = _twin_weights(seed)
    unet.train()
    sched = TorchLossTwin()
    opt = torch.optim.AdamW(unet.parameters(), lr=LR, betas=BETAS, eps=EPS,
                            weight_decay=WD)
    rng = np.random.default_rng(seed + 1)
    losses = []
    for _ in range(steps):
        d = gen_step_data(rng, batch, size, cfg.cross_attention_dim,
                          cfg.pooled_embed_dim, 1000, method=method)
        tb = {k: torch.from_numpy(v) for k, v in d.items()}
        opt.zero_grad()
        if method == "flow_matching":
            loss = sched.flow_matching_loss(unet, tb, tb["noise"],
                                            tb["timesteps"])
        else:
            loss = sched.loss(unet, tb, tb["noise"], tb["timesteps"].long())
        loss.backward()
        torch.nn.utils.clip_grad_norm_(unet.parameters(), CLIP)
        opt.step()
        losses.append(float(loss.detach()))
    return losses


def run_jax(steps: int, seed: int, batch: int, size: int,
            method: str = "ddpm") -> list:
    """This framework's real train step (same twin weights, plain AdamW)."""
    import jax
    import jax.numpy as jnp
    import optax
    from sdxl_training_improvements_tpu.config import Config
    from sdxl_training_improvements_tpu.models import weights as W
    from sdxl_training_improvements_tpu.models.unet import SDXLUNet
    from sdxl_training_improvements_tpu.training.schedules import NoiseSchedule
    from sdxl_training_improvements_tpu.training.trainer import (
        create_train_state, make_train_step)

    ucfg, twin = _twin_weights(seed)
    flax_unet = SDXLUNet(config=ucfg, dtype=jnp.float32,
                         param_dtype=jnp.float32)
    template = flax_unet.init(
        jax.random.key(0), jnp.zeros((1, 4, size, size)), jnp.zeros((1,)),
        jnp.zeros((1, 77, ucfg.cross_attention_dim)),
        jnp.zeros((1, ucfg.pooled_embed_dim)), jnp.zeros((1, 6)))
    state_dict = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    params = W.hf_to_flax_params(template, state_dict, strict=True)

    cfg = Config()
    cfg.training.method = method
    cfg.training.gradient_accumulation_steps = 1
    cfg.training.clip_grad_norm = CLIP
    opt = optax.adamw(LR, b1=BETAS[0], b2=BETAS[1], eps=EPS,
                      weight_decay=WD)
    step_fn = make_train_step(
        lambda p, *a, **kw: flax_unet.apply(p, *a),
        NoiseSchedule.from_config(cfg), opt, cfg, donate=False)
    state = create_train_state(params, opt, seed=seed)

    rng = np.random.default_rng(seed + 1)
    losses = []
    for _ in range(steps):
        d = gen_step_data(rng, batch, size, ucfg.cross_attention_dim,
                          ucfg.pooled_embed_dim, 1000, method=method)
        jb = {k: jnp.asarray(v) for k, v in d.items()}
        state, metrics = step_fn(state, jb)
        losses.append(float(metrics["loss"]))
    return losses


def run_jax_self(method: str, steps: int, seed: int, batch: int,
                 size: int) -> list:
    """Self-curve (fixed-seed reproducibility artifact, original mode)."""
    import jax
    import jax.numpy as jnp
    from sdxl_training_improvements_tpu.config import Config
    from sdxl_training_improvements_tpu.models.sdxl import SDXLModel
    from sdxl_training_improvements_tpu.training.optimizers import (
        make_optimizer)
    from sdxl_training_improvements_tpu.training.schedules import NoiseSchedule
    from sdxl_training_improvements_tpu.training.trainer import (
        create_train_state, make_train_step)

    cfg = Config()
    cfg.training.method = method
    cfg.training.gradient_accumulation_steps = 1
    cfg.optimizer.learning_rate = 1e-4

    model = SDXLModel.create(tiny=True, dtype=jnp.float32,
                             init_rng=jax.random.key(seed))
    step_fn = make_train_step(model.unet_apply, NoiseSchedule.from_config(cfg),
                              make_optimizer(cfg), cfg, donate=False)
    state = create_train_state(model.trainable_params(), make_optimizer(cfg),
                               seed=seed)
    ucfg = model.unet_config
    data_key = jax.random.key(seed + 1)
    losses = []
    for _ in range(steps):
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


def compare(path_a: str, path_b: str, tol: float = 0.01) -> int:
    a = json.loads(Path(path_a).read_text())["losses"]
    b = json.loads(Path(path_b).read_text())["losses"]
    n = min(len(a), len(b))
    if n == 0:
        print("empty curves")
        return 2
    a, b = np.asarray(a[:n]), np.asarray(b[:n])
    denom = np.maximum(np.abs(a), 1e-8)
    rel = np.abs(a - b) / denom
    print(json.dumps({
        "steps_compared": n,
        "max_rel_divergence": float(rel.max()),
        "mean_rel_divergence": float(rel.mean()),
        "within_1pct": bool(rel.max() <= tol),
    }))
    return 0 if rel.max() <= tol else 1


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--impl", default="jax",
                   choices=["jax", "torch", "jax-self"])
    p.add_argument("--method", default="ddpm",
                   choices=["ddpm", "flow_matching"])
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--size", type=int, default=16)
    p.add_argument("--out", default="parity_curve.json")
    p.add_argument("--compare", nargs=2, metavar=("A", "B"))
    args = p.parse_args()
    if args.compare:
        sys.exit(compare(*args.compare))
    if args.impl == "torch":
        losses = run_torch(args.steps, args.seed, args.batch, args.size,
                           method=args.method)
    elif args.impl == "jax":
        losses = run_jax(args.steps, args.seed, args.batch, args.size,
                         method=args.method)
    else:
        losses = run_jax_self(args.method, args.steps, args.seed, args.batch,
                              args.size)
    Path(args.out).write_text(json.dumps({
        "impl": args.impl, "steps": args.steps, "seed": args.seed,
        "losses": losses}))
    print(f"wrote {args.out}: first={losses[0]:.6f} last={losses[-1]:.6f}")


if __name__ == "__main__":
    main()
