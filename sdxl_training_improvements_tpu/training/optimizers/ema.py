"""Weight EMA as an optimizer wrapper.

Not present in the reference (a recognised gap — EMA is standard for
SDXL fine-tunes: the published SDXL base weights are themselves EMA'd).
Implemented as a wrapping ``GradientTransformation`` so it composes with
every optimizer in the registry: the wrapper applies the inner update,
then tracks ``ema = decay*ema + (1-decay)*new_params`` in fp32 (bf16
storage would swallow the (1-decay)~1e-4 increments below one ulp and
freeze the average).

The EMA tree is the model you ship: ``SDXLTrainer.eval_params`` returns it
for export/validation when ``training.ema_decay`` is set.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional

import chex
import jax
import jax.numpy as jnp
import optax


class EMAState(NamedTuple):
    inner: Any
    ema: chex.ArrayTree  # fp32 shadow of params
    count: chex.Array


def with_ema(inner: optax.GradientTransformation, decay: float = 0.9999,
             warmup: bool = True) -> optax.GradientTransformation:
    """Wrap ``inner`` with an fp32 weight EMA.

    ``warmup`` uses the standard debiasing ``min(decay, (1+t)/(10+t))``
    ramp so early training isn't anchored to the random init.
    """

    def init(params):
        # jnp.array(copy=True), NOT astype: astype on an already-fp32 leaf
        # returns the SAME buffer, and an EMA state aliasing the params
        # breaks buffer donation of the train state (XLA rejects
        # `f(donate(a), a)`) — caught by the multichip dryrun matrix
        return EMAState(
            inner=inner.init(params),
            ema=jax.tree.map(lambda p: jnp.array(p, jnp.float32, copy=True),
                             params),
            count=jnp.zeros((), jnp.int32))

    def update(grads, state, params=None):
        updates, inner_state = inner.update(grads, state.inner, params)
        new_params = optax.apply_updates(params, updates)
        count = state.count + 1
        if warmup:
            d = jnp.minimum(decay,
                            (1.0 + count) / (10.0 + count)).astype(jnp.float32)
        else:
            d = jnp.float32(decay)
        ema = jax.tree.map(
            lambda e, p: d * e + (1.0 - d) * p.astype(jnp.float32),
            state.ema, new_params)
        return updates, EMAState(inner=inner_state, ema=ema, count=count)

    return optax.GradientTransformation(init, update)


def ema_eval_params(opt_state, params):
    """The EMA tree cast back to the params' dtypes (the weights to ship);
    falls through to ``params`` when EMA isn't active."""
    if isinstance(opt_state, EMAState):
        return jax.tree.map(lambda e, p: e.astype(p.dtype),
                            opt_state.ema, params)
    return params


def unwrap_ema(opt_state):
    """Inner optimizer state (for eval-param recovery of wrapped
    optimizers, e.g. schedule-free)."""
    return opt_state.inner if isinstance(opt_state, EMAState) else opt_state
