"""Pure-bf16 AdamW with stochastic rounding, as an optax transform.

Functional re-implementation of the reference optimizer
(``src/training/optimizers/adamw_bfloat16/__init__.py``).  Per-parameter
state and update order match ``_make_step`` (``:146-197``):

1. ``exp_avg = SR(beta1*exp_avg + (1-beta1)*grad)``        (stochastic round)
2. ``exp_avg_sq = beta2*exp_avg_sq + (1-beta2)*grad^2``    (nearest round)
3. ``shift = SR(shift - lr*sqrt(1-beta2^t) * exp_avg/(sqrt(exp_avg_sq)+eps))``
4. ``p_new = SR(p + shift)``; ``shift = SR(shift + (p - p_new))``  — the
   shift carries the truncation error forward (``:107-111``)
5. weight decay is *batched*: an ``accumulated_decay`` scalar per parameter
   accrues ``wd*lr`` each step and fires as ``shift -= acc*p`` only once it
   exceeds 5e-3, with a random per-parameter starting phase so parameters
   don't all decay on the same step (``:112-128``).

All state is bf16 (same memory footprint as the reference: 3x params).  PRNG
keys are threaded functionally; per step each leaf consumes ONE
``jax.random.bits`` call producing all four stochastic-rounding noise planes
(rbg generator by default) — the compile-time-critical design point at 330+
leaves.  The whole update is elementwise, so XLA fuses it into a few HBM
passes.
"""
from __future__ import annotations

from typing import NamedTuple

import chex
import jax
import jax.numpy as jnp
import optax

from sdxl_training_improvements_tpu.ops.stochastic import (
    add_stochastic_bits, addcdiv_stochastic_bits)

DECAY_THRESHOLD = 5e-3


class AdamWBF16State(NamedTuple):
    step: chex.Array
    exp_avg: chex.ArrayTree
    exp_avg_sq: chex.ArrayTree
    shift: chex.ArrayTree
    accumulated_decay: chex.ArrayTree  # scalar per param
    key: chex.PRNGKey


def adamw_bf16(lr: float = 1e-4, betas=(0.9, 0.999), eps: float = 1e-8,
               weight_decay: float = 0.0, seed: int = 0,
               lr_schedule=None, prng_impl: str = "rbg"
               ) -> optax.GradientTransformation:
    """Build the transform.  ``update(grads, state, params)`` returns the
    *delta* to add to params (optax convention: ``p += updates``)."""
    beta1, beta2 = betas

    def init(params):
        leaves, treedef = jax.tree_util.tree_flatten(params)
        for p in leaves:
            if p.dtype not in (jnp.bfloat16, jnp.float32):
                raise ValueError("adamw_bf16 requires bfloat16 (or float32 "
                                 f"norm) params, got {p.dtype}")
        zeros = lambda p: jnp.zeros_like(p)
        key = jax.random.key(seed, impl=prng_impl)
        n = max(len(leaves), 1)
        # random per-parameter decay phase (reference :112-128)
        phases = jax.random.uniform(jax.random.fold_in(key, 1), (n,),
                                    jnp.float32) * DECAY_THRESHOLD
        accumulated = jax.tree_util.tree_unflatten(
            treedef, [phases[i] for i in range(len(leaves))])
        return AdamWBF16State(
            step=jnp.zeros((), jnp.int32),
            exp_avg=jax.tree.map(zeros, params),
            exp_avg_sq=jax.tree.map(zeros, params),
            shift=jax.tree.map(zeros, params),
            accumulated_decay=accumulated,
            key=jax.random.fold_in(key, 2),
        )

    def update(grads, state, params):
        if params is None:
            raise ValueError("adamw_bf16 requires params")
        step = state.step + 1
        cur_lr = lr_schedule(step) if lr_schedule is not None else lr
        denom_correction = jnp.sqrt(1.0 - beta2 ** step.astype(jnp.float32))

        new_key, step_key = jax.random.split(state.key)
        p_leaves, treedef = jax.tree_util.tree_flatten(params)
        flat = lambda t: treedef.flatten_up_to(t)
        leaf_keys = jax.random.split(step_key, max(len(p_leaves), 1))

        def leaf_update(p, g, m, v, shift, acc_decay, key):
            if p.dtype == jnp.float32:
                # fp32 leaves (norm scales/biases) need no stochastic
                # rounding: same update formula, exact arithmetic
                g32 = g.astype(jnp.float32)
                m = m * beta1 + (1.0 - beta1) * g32
                v = v * beta2 + (1.0 - beta2) * g32 * g32
                denom = jnp.sqrt(v) + eps
                delta = (-cur_lr * denom_correction) * m / denom \
                    - weight_decay * cur_lr * p
                return delta, m, v, shift, acc_decay
            from sdxl_training_improvements_tpu.ops.fused_adamw import (
                fused_adamw_enabled, fused_adamw_update)
            if fused_adamw_enabled():
                # single-pass Pallas kernel: whole m->v->shift->p chain in
                # one HBM residency with in-register RNG (ops/fused_adamw)
                acc = acc_decay + weight_decay * cur_lr
                fire = acc > DECAY_THRESHOLD
                decay_amt = jnp.where(fire, acc, 0.0)
                seed = jax.random.bits(key, (), jnp.uint32).astype(jnp.int32)
                p_new, m, v, shift = fused_adamw_update(
                    p, g, m, v, shift,
                    lr_eff=cur_lr * denom_correction, decay_amt=decay_amt,
                    seed=seed, beta1=beta1, beta2=beta2, eps=eps)
                acc = jnp.where(fire, jnp.zeros_like(acc), acc)
                delta = (p_new.astype(jnp.float32)
                         - p.astype(jnp.float32)).astype(p.dtype)
                return delta, m, v, shift, acc
            # each stochastic rounding consumes 16 bits; draw two uint32
            # planes and use both halves — halves the PRNG work, which is
            # a measurable slice of this HBM-bound elementwise update
            raw = jax.random.bits(key, (2,) + p.shape, jnp.uint32)
            noise = (raw[0], raw[0] >> 16, raw[1], raw[1] >> 16)
            g32 = g.astype(jnp.float32)
            # torch computes bf16 `exp_avg.mul_(beta1)` in fp32 opmath then
            # rounds to nearest; a bare jnp `m * beta1` would instead
            # downcast beta1 to bf16 (0.9 -> 0.8984375!) — multiply in fp32
            m_scaled = (m.astype(jnp.float32) * beta1).astype(jnp.bfloat16)
            m = add_stochastic_bits(m_scaled, g, noise[0], alpha=1.0 - beta1)
            v = (v.astype(jnp.float32) * beta2
                 + (1.0 - beta2) * g32 * g32).astype(jnp.bfloat16)
            denom = jnp.sqrt(v.astype(jnp.float32)) + eps
            shift = addcdiv_stochastic_bits(shift, m, denom, noise[1],
                                            value=-cur_lr * denom_correction)
            p_new = add_stochastic_bits(p, shift, noise[2])
            shift = add_stochastic_bits(
                shift, p.astype(jnp.float32) - p_new.astype(jnp.float32),
                noise[3])
            # batched weight decay with random per-param phase
            acc = acc_decay + weight_decay * cur_lr
            fire = acc > DECAY_THRESHOLD
            shift = jnp.where(
                fire,
                (shift.astype(jnp.float32)
                 - acc * p_new.astype(jnp.float32)).astype(jnp.bfloat16),
                shift)
            acc = jnp.where(fire, jnp.zeros_like(acc), acc)
            delta = p_new.astype(jnp.float32) - p.astype(jnp.float32)
            return delta.astype(p.dtype), m, v, shift, acc

        results = [leaf_update(p, g, m, v, s, a, leaf_keys[i])
                   for i, (p, g, m, v, s, a) in enumerate(zip(
                       p_leaves, flat(grads), flat(state.exp_avg),
                       flat(state.exp_avg_sq), flat(state.shift),
                       flat(state.accumulated_decay)))]
        pick = lambda i: jax.tree_util.tree_unflatten(
            treedef, [r[i] for r in results])
        new_state = AdamWBF16State(step=step, exp_avg=pick(1),
                                   exp_avg_sq=pick(2), shift=pick(3),
                                   accumulated_decay=pick(4), key=new_key)
        return pick(0), new_state

    return optax.GradientTransformation(init, update)
