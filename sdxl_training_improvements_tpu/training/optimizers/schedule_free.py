"""Schedule-free AdamW with Kahan-compensated updates, as an optax transform.

Capability parity with the reference ``AdamWScheduleFreeKahan``
(``src/training/optimizers/adamw_schedulefree/__init__.py``): LR warmup
(``(k+1)/warmup``), bias-correction-2 folding (adjusted_lr = lr*sched*
sqrt(1-beta2^(k+1)) with the sqrt cancelled again in the step size,
``:99-107,129``), decoupled weight decay ``p -= wd*p`` (``:131-132``), and a
Kahan compensation buffer recovering low-precision truncation (``:119-121,
134-140``).

Two deliberate deviations from the reference, recorded in SURVEY.md's defect
ledger:

* the reference's schedule-free y/x interpolation reads a ``state["z"]`` that
  is never initialized (``:57-81`` vs ``:45-55``), so its train()/eval()
  switches are dead code.  Here the schedule-free iterate ``z`` is real:
  ``z -= step*update; x = (1-c)x + c*z`` with ``c = 1/(k+1)``, params hold
  ``y = (1-beta1)*z + beta1*x`` (Defazio et al. 2024), and ``eval_params``
  recovers the x sequence for evaluation.
* the Kahan step uses the standard compensated-summation form
  (``c += update - ((p+update) - p)``) rather than the reference's
  self-cancelling buffer arithmetic.
"""
from __future__ import annotations

from typing import NamedTuple

import chex
import jax
import jax.numpy as jnp
import optax


class ScheduleFreeKahanState(NamedTuple):
    step: chex.Array
    exp_avg_sq: chex.ArrayTree
    z: chex.ArrayTree          # fp32 schedule-free iterate
    kahan_comp: chex.ArrayTree  # compensation for bf16 param writes


def adamw_schedule_free_kahan(lr: float = 1e-3, betas=(0.9, 0.999),
                              eps: float = 1e-8, weight_decay: float = 1e-2,
                              warmup_steps: int = 0, kahan_sum: bool = True,
                              correct_bias: bool = True
                              ) -> optax.GradientTransformation:
    beta1, beta2 = betas

    def init(params):
        f32 = lambda p: p.astype(jnp.float32)
        return ScheduleFreeKahanState(
            step=jnp.zeros((), jnp.int32),
            exp_avg_sq=jax.tree.map(lambda p: jnp.zeros_like(p, jnp.float32),
                                    params),
            z=jax.tree.map(f32, params),
            kahan_comp=jax.tree.map(lambda p: jnp.zeros_like(p, jnp.float32),
                                    params),
        )

    def update(grads, state, params):
        if params is None:
            raise ValueError("adamw_schedule_free_kahan requires params")
        k = state.step
        kf = k.astype(jnp.float32)
        sched = jnp.where(k < warmup_steps,
                          (kf + 1.0) / jnp.maximum(warmup_steps, 1), 1.0)
        bc2 = 1.0 - beta2 ** (kf + 1.0)
        step_size = lr * sched  # adjusted_lr/sqrt(bc2) per reference :129
        c = 1.0 / (kf + 1.0)

        def leaf(p, g, v, z, comp):
            g32 = g.astype(jnp.float32)
            p32 = p.astype(jnp.float32)
            v = beta2 * v + (1.0 - beta2) * g32 * g32
            denom = jnp.sqrt(v / bc2 if correct_bias else v) + eps
            # x recovered from y = (1-b1) z + b1 x
            x = (p32 - (1.0 - beta1) * z) / beta1
            z = z - step_size * (g32 / denom + weight_decay * p32)
            x = (1.0 - c) * x + c * z
            y = (1.0 - beta1) * z + beta1 * x
            upd = y - p32
            if kahan_sum:
                upd = upd + comp
                new_p = (p32 + upd).astype(p.dtype)
                comp = upd - (new_p.astype(jnp.float32) - p32)
                delta = new_p.astype(jnp.float32) - p32
            else:
                delta = upd
            return delta.astype(p.dtype), v, z, comp

        out = jax.tree.map(leaf, params, grads, state.exp_avg_sq, state.z,
                           state.kahan_comp)
        pick = lambda i: jax.tree.map(lambda t: t[i], out,
                                      is_leaf=lambda x: isinstance(x, tuple))
        new_state = ScheduleFreeKahanState(step=k + 1, exp_avg_sq=pick(1),
                                           z=pick(2), kahan_comp=pick(3))
        return pick(0), new_state

    return optax.GradientTransformation(init, update)


def schedule_free_eval_params(state: ScheduleFreeKahanState, params,
                              beta1: float = 0.9):
    """Recover the averaged x sequence for evaluation (reference ``eval()``,
    ``:57-69``): x = (y - (1-beta1) z)/beta1."""
    return jax.tree.map(
        lambda p, z: (((p.astype(jnp.float32) - (1.0 - beta1) * z) / beta1)
                      .astype(p.dtype)),
        params, state.z)
