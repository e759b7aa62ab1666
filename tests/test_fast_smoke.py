"""Fast-lane end-to-end smoke: one tiny jitted train step per method.

The heavyweight trainer/loop/pipeline modules are `slow`-marked (the fast
lane is ``pytest -m "not slow"``, README: Testing); this module keeps a
minimal end-to-end signal in the fast lane: a real ``make_train_step`` over
the tiny SDXL twin executes, the loss is finite, and the params move.
Reference behavior being smoked: the per-step accumulate→clip→step→zero
sequence (``flow_matching_trainer.py:172-189``).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdxl_training_improvements_tpu.config import Config
from sdxl_training_improvements_tpu.models.sdxl import SDXLModel
from sdxl_training_improvements_tpu.training.optimizers import make_optimizer
from sdxl_training_improvements_tpu.training.schedules import NoiseSchedule
from sdxl_training_improvements_tpu.training.trainer import (
    create_train_state, make_train_step)


@pytest.fixture(scope="module")
def tiny_model():
    return SDXLModel.create(tiny=True, dtype=jnp.float32,
                            init_rng=jax.random.key(0))


def make_batch(key, b, size=16, ctx_dim=64, pooled=32):
    ks = jax.random.split(key, 4)
    return {
        "vae_latents": jax.random.normal(ks[0], (b, 4, size, size)),
        "prompt_embeds": jax.random.normal(ks[1], (b, 77, ctx_dim)),
        "pooled_prompt_embeds": jax.random.normal(ks[2], (b, pooled)),
        "time_ids": jnp.tile(jnp.asarray([[128., 128., 0., 0., 128., 128.]]),
                             (b, 1)),
    }


@pytest.mark.parametrize("method", ["ddpm", "flow_matching"])
def test_train_step_executes_and_learns(tiny_model, method):
    cfg = Config()
    cfg.training.method = method
    cfg.training.batch_size = 2
    cfg.training.gradient_accumulation_steps = 1
    cfg.optimizer.optimizer_type = "adamw"
    cfg.optimizer.learning_rate = 1e-3

    sched = NoiseSchedule.from_config(cfg)
    opt = make_optimizer(cfg)
    step = make_train_step(tiny_model.unet_apply, sched, opt, cfg,
                           mesh=None, donate=False)
    state = create_train_state(tiny_model.trainable_params(), opt)
    batch = make_batch(jax.random.key(1), 2)
    new_state, metrics = step(state, batch)
    loss = float(metrics["loss"])
    assert np.isfinite(loss), metrics
    moved = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                           - b.astype(jnp.float32)))),
        state.params, new_state.params)
    assert max(jax.tree.leaves(moved)) > 0.0
    assert int(new_state.step) == 1
