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

All state is bf16 (same memory footprint as the reference: 3x params).

Two performance axes, both measurable via ``bench.py``:

* ``noise``: "rbg" draws materialised uint32 planes via ``jax.random.bits``
  (one call per leaf/group — the reference-faithful stream); "hash" derives
  the planes from a fused integer hash of a counter
  (``ops/stochastic.counter_noise``) so the noise never touches HBM —
  removing ~41 GB of the update's ~97 GB traffic at SDXL scale.
* ``flat_state``: pack the ~330 bf16 leaves into a few contiguous flat
  buffers at ``init`` so the whole update compiles to a handful of large
  fused elementwise passes instead of one per leaf (the measured per-leaf
  fragmentation, docs/performance.md).  Weight-decay phases are then per
  *group* rather than per leaf — within the reference's own randomness
  envelope (the phases are random draws either way), documented here
  because it changes which step each parameter decays on.

``flat_state`` changes the optimizer-state pytree layout, so checkpoints
written with one setting do not resume under the other (Orbax fails loudly
on the structure mismatch).

``moments="int8"`` (per-leaf layout only; ``optimizer.moments_8bit`` in
YAML) stores ``exp_avg``/``exp_avg_sq`` of bf16 leaves as 8-bit log codes
plus one fp32 scale per leaf (``ops/quantize.py``): 4 instead of 6 state
bytes/param (15.4 -> 10.3 GB at SDXL scale) and half the moment HBM
traffic; the SR ``shift`` stays bf16-exact.  Same loud-resume-mismatch
caveat as ``flat_state``.

``shift_host=True`` (``optimizer.shift_host`` in YAML; per-leaf only)
additionally parks the bf16-exact shift tree in pinned host memory,
streamed through HBM one leaf at a time inside the update.  Combined with
``moments="int8"`` the device-resident optimizer state drops to ~2
bytes/param, which is what lets the whole fwd+bwd+clip+update execute as a
single jitted program on a 16 GB chip (``bench.py`` single-program row).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import chex
import jax
import jax.numpy as jnp
import numpy as np
import optax

from sdxl_training_improvements_tpu.ops.stochastic import (
    add_stochastic_bits, addcdiv_stochastic_bits, counter_noise)

DECAY_THRESHOLD = 5e-3


class AdamWBF16State(NamedTuple):
    step: chex.Array
    exp_avg: chex.ArrayTree
    exp_avg_sq: chex.ArrayTree
    shift: chex.ArrayTree
    accumulated_decay: chex.ArrayTree  # scalar per param (or per flat group)
    key: chex.PRNGKey


def _noise_planes(key, n_elems: int, shape, mode: str):
    """Four 16-bit noise planes for the four stochastic roundings."""
    if mode == "hash":
        seeds = jax.random.bits(key, (2,), jnp.uint32)
        n0 = counter_noise(seeds[0], n_elems).reshape(shape)
        n1 = counter_noise(seeds[1], n_elems).reshape(shape)
    else:  # "rbg": materialised planes (reference-faithful stream shape)
        raw = jax.random.bits(key, (2,) + tuple(shape), jnp.uint32)
        n0, n1 = raw[0], raw[1]
    return (n0, n0 >> 16, n1, n1 >> 16)


def _partition_flat(leaves, n_groups: int):
    """Static partition: fp32 leaf indices + contiguous bf16 groups of
    ~equal element count.  Deterministic in the leaf structure alone, so
    ``init`` and every ``update`` agree without storing the partition."""
    f32_idx = [i for i, l in enumerate(leaves) if l.dtype == jnp.float32]
    bf16_idx = [i for i, l in enumerate(leaves) if l.dtype == jnp.bfloat16]
    if not bf16_idx:
        return f32_idx, []
    n_groups = max(1, min(n_groups, len(bf16_idx)))
    total = sum(leaves[i].size for i in bf16_idx)
    target = total / n_groups
    groups, cur, acc = [], [], 0
    for i in bf16_idx:
        cur.append(i)
        acc += leaves[i].size
        if acc >= target * (len(groups) + 1) and len(groups) < n_groups - 1:
            groups.append(cur)
            cur = []
    if cur:
        groups.append(cur)
    return f32_idx, groups


def adamw_bf16(lr: float = 1e-4, betas=(0.9, 0.999), eps: float = 1e-8,
               weight_decay: float = 0.0, seed: int = 0,
               lr_schedule=None, prng_impl: str = "rbg",
               flat_state: bool = False, flat_groups: int = 8,
               noise: Optional[str] = None, layout: Optional[str] = None,
               hybrid_threshold: int = 1 << 20, moments: str = "bf16",
               shift_host: bool = False, moments_host: bool = False,
               stream_group_params: int = 1 << 25
               ) -> optax.GradientTransformation:
    """Build the transform.  ``update(grads, state, params)`` returns the
    *delta* to add to params (optax convention: ``p += updates``).

    ``layout`` selects the state packing: "per_leaf" (default; the
    reference-faithful layout the sharding rules apply to), "flat"
    (contiguous 1-D buffers — measured SLOWER on TPU, kept for A/B:
    ravelling tiled layouts forces relayout copies), or "stacked"
    (same-shape leaves stacked along a new leading axis — relayout-free
    kernel-count reduction; per-leaf decay phases preserved as a vector).
    ``flat_state=True`` is legacy shorthand for layout="flat".

    ``noise`` defaults to "hash" for flat/stacked and "rbg" for per-leaf
    (the per-leaf rbg stream is what the bit-parity suite pins against the
    reference's kernels; tests/test_reference_parity.py)."""
    beta1, beta2 = betas
    layout = layout or ("flat" if flat_state else "per_leaf")
    if layout not in ("per_leaf", "flat", "stacked", "hybrid"):
        raise ValueError(
            f"layout must be per_leaf|flat|stacked|hybrid, got {layout!r}")
    noise_mode = noise if noise is not None else (
        "rbg" if layout == "per_leaf" else "hash")
    if noise_mode not in ("rbg", "hash"):
        raise ValueError(f"noise must be 'rbg' or 'hash', got {noise_mode!r}")
    if moments not in ("bf16", "int8"):
        raise ValueError(f"moments must be 'bf16' or 'int8', got {moments!r}")
    if moments == "int8" and layout != "per_leaf":
        raise ValueError("moments='int8' requires layout='per_leaf' "
                         f"(got layout={layout!r})")
    if shift_host and layout != "per_leaf":
        raise ValueError("shift_host requires layout='per_leaf' "
                         f"(got layout={layout!r})")
    if moments_host and layout != "per_leaf":
        raise ValueError("moments_host requires layout='per_leaf' "
                         f"(got layout={layout!r})")

    # ``shift_host``: the SR shift tree lives in pinned host memory and is
    # streamed through HBM one leaf at a time inside the jitted update —
    # XLA overlaps the per-leaf DMA with the elementwise math of other
    # leaves.  Removes 5.1 GB (at SDXL scale) of resident HBM; with
    # moments="int8" this is what lets the full fwd+bwd+clip+update run as
    # ONE program on a 16 GB chip (bench.py single_program_full_step).
    # Placement: derive from the leaf's own sharding with the memory kind
    # swapped when the leaf is a concrete array (so an FSDP/NamedSharding
    # leaf keeps its device layout and only changes memory space); fall
    # back to single-device placement (the small-HBM scenario this exists
    # for) for tracers/abstract leaves.  The production guard against the
    # untested shard_params+host-streaming combination lives in
    # make_optimizer (ADVICE round-4, medium).
    def _shift_mem(kind: str):
        from jax.sharding import SingleDeviceSharding
        return SingleDeviceSharding(jax.devices()[0], memory_kind=kind)

    def _put(x, kind):
        try:  # concrete array: keep its sharding, swap the memory kind
            if isinstance(x, jax.Array):
                return jax.device_put(x, x.sharding.with_memory_kind(kind))
        except Exception:
            pass
        try:
            return jax.device_put(x, _shift_mem(kind))
        except Exception:  # backend without pinned_host: stay resident
            return x

    def _host_put(x):
        return _put(x, "pinned_host")

    def _dev_put(x):
        return _put(x, "device")

    _shift_to_host = _host_put if shift_host else (lambda x: x)
    _shift_to_device = _dev_put if shift_host else (lambda x: x)

    # ``moments_host``: like shift_host but for the m/v trees (works with
    # bf16 or int8 moments; int8 is the intended pairing — 1 state byte per
    # param each way over PCIe instead of 2).  With shift_host this drops
    # the update's resident HBM to params+grads only, which is what lets
    # the FULL fwd+bwd+clip+update run as one program on the 16 GB chip:
    # params 5.13 GB + grads 5.13 GB resident, everything else streamed
    # leaf-group by leaf-group (see the barrier pipeline in
    # ``update_per_leaf``).
    _mom_to_host = _host_put if moments_host else (lambda x: x)
    _mom_to_device = _dev_put if moments_host else (lambda x: x)

    def _validate(leaves):
        for p in leaves:
            if p.dtype not in (jnp.bfloat16, jnp.float32):
                raise ValueError("adamw_bf16 requires bfloat16 (or float32 "
                                 f"norm) params, got {p.dtype}")

    # ------------------------------------------------------- f32-leaf chain
    def f32_update(p, g, m, v):
        g32 = g.astype(jnp.float32)
        m = m * beta1 + (1.0 - beta1) * g32
        v = v * beta2 + (1.0 - beta2) * g32 * g32
        return m, v  # delta computed by caller (needs cur_lr)

    def f32_delta(p, m, v, cur_lr, denom_correction):
        """The exact-arithmetic AdamW delta for fp32 leaves — the ONE
        definition every packing variant shares (bit-identical paths)."""
        return (-cur_lr * denom_correction) * m \
            / (jnp.sqrt(v) + eps) - weight_decay * cur_lr * p

    # ------------------------------------------------------ bf16 chain body
    def bf16_update(p, g, m, v, shift, acc_decay, key, cur_lr,
                    denom_correction):
        """One bf16 tensor (leaf or flat group).  ``acc_decay`` is a scalar;
        returns (delta, m, v, shift, acc)."""
        from sdxl_training_improvements_tpu.ops.fused_adamw import (
            fused_adamw_enabled, fused_adamw_update)
        # the fused kernel takes a scalar decay amount (per-leaf/flat);
        # the stacked layout carries a per-slice vector -> XLA path
        if fused_adamw_enabled() and jnp.ndim(acc_decay) == 0:
            # single-pass Pallas kernel: whole m->v->shift->p chain in
            # one HBM residency with in-register RNG (ops/fused_adamw)
            acc = acc_decay + weight_decay * cur_lr
            fire = acc > DECAY_THRESHOLD
            decay_amt = jnp.where(fire, acc, 0.0)
            kseed = jax.random.bits(key, (), jnp.uint32).astype(jnp.int32)
            p_new, m, v, shift = fused_adamw_update(
                p, g, m, v, shift,
                lr_eff=cur_lr * denom_correction, decay_amt=decay_amt,
                seed=kseed, beta1=beta1, beta2=beta2, eps=eps)
            acc = jnp.where(fire, jnp.zeros_like(acc), acc)
            delta = (p_new.astype(jnp.float32)
                     - p.astype(jnp.float32)).astype(p.dtype)
            return delta, m, v, shift, acc
        # each stochastic rounding consumes 16 bits; two 32-bit planes
        # cover the four roundings
        noise = _noise_planes(key, p.size, p.shape, noise_mode)
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
        # batched weight decay with random starting phase
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

    # ============================================================ per-leaf
    # moments="int8": m and v of bf16 leaves are stored as 8-bit log codes
    # + one fp32 scale per leaf (ops/quantize.py) — 4 instead of 6 state
    # bytes/param.  The update dequantizes, runs the exact bf16-SR chain,
    # and re-quantizes; fp32 (norm) leaves and the SR shift stay exact.
    quantized = moments == "int8"

    # Nested-jit leaf kernels: the per-leaf update math is emitted once per
    # distinct (shape, dtype) signature — StableHLO `func.call`s into shared
    # functions — instead of being inlined ~1,700 times into the outer step
    # jaxpr.  Measured 13.5x StableHLO reduction at SDXL scale (the full
    # int8 update lowered to 45 MB of MLIR uncached, 2026-08-19), which is
    # what lets bench.py's single-program full step compile at all.  XLA
    # inlines the calls during HLO optimization, so the executed program is
    # unchanged.  The pinned-host shift transfers stay OUTSIDE these
    # kernels (memory-kind device_put stays in the outer trace).
    @jax.jit
    def _f32_leaf_kernel(p, g, m, v, cur_lr, denom_correction):
        m, v = f32_update(p, g, m, v)
        return f32_delta(p, m, v, cur_lr, denom_correction), m, v

    @jax.jit
    def _bf16_leaf_kernel(p, g, m, v, shift, acc_decay, key, cur_lr,
                          denom_correction):
        return bf16_update(p, g, m, v, shift, acc_decay, key, cur_lr,
                           denom_correction)

    @jax.jit
    def _bf16_q_leaf_kernel(p, g, m, v, shift, acc_decay, key, cur_lr,
                            denom_correction):
        from sdxl_training_improvements_tpu.ops.quantize import (
            dequantize_8bit, quantize_8bit)
        delta, m2, v2, shift, acc = bf16_update(
            p, g, dequantize_8bit(m, signed=True),
            dequantize_8bit(v, signed=False), shift, acc_decay,
            key, cur_lr, denom_correction)
        return (delta, quantize_8bit(m2, signed=True),
                quantize_8bit(v2, signed=False), shift, acc)

    def _m_init(p):
        if quantized and p.dtype == jnp.bfloat16:
            from sdxl_training_improvements_tpu.ops.quantize import (
                quantized_zeros)
            return quantized_zeros(p.shape, signed=True)
        return jnp.zeros_like(p)

    def _v_init(p):
        if quantized and p.dtype == jnp.bfloat16:
            from sdxl_training_improvements_tpu.ops.quantize import (
                quantized_zeros)
            return quantized_zeros(p.shape, signed=False)
        return jnp.zeros_like(p)

    def init_per_leaf(params):
        leaves, treedef = jax.tree_util.tree_flatten(params)
        _validate(leaves)
        key = jax.random.key(seed, impl=prng_impl)
        n = max(len(leaves), 1)
        # random per-parameter decay phase (reference :112-128)
        phases = jax.random.uniform(jax.random.fold_in(key, 1), (n,),
                                    jnp.float32) * DECAY_THRESHOLD
        accumulated = jax.tree_util.tree_unflatten(
            treedef, [phases[i] for i in range(len(leaves))])
        return AdamWBF16State(
            step=jnp.zeros((), jnp.int32),
            exp_avg=jax.tree.map(lambda p: _mom_to_host(_m_init(p)), params),
            exp_avg_sq=jax.tree.map(lambda p: _mom_to_host(_v_init(p)),
                                    params),
            shift=jax.tree.map(
                lambda p: _shift_to_host(jnp.zeros_like(p)), params),
            accumulated_decay=accumulated,
            key=jax.random.fold_in(key, 2),
        )

    def update_per_leaf(grads, state, params):
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
                m, v = _mom_to_device(m), _mom_to_device(v)
                delta, m, v = _f32_leaf_kernel(p, g, m, v, cur_lr,
                                               denom_correction)
                return delta, _mom_to_host(m), _mom_to_host(v), shift, \
                    acc_decay
            shift = _shift_to_device(shift)
            m, v = _mom_to_device(m), _mom_to_device(v)
            kernel = _bf16_q_leaf_kernel if quantized else _bf16_leaf_kernel
            delta, m, v, shift, acc = kernel(
                p, g, m, v, shift, acc_decay, key, cur_lr,
                denom_correction)
            return (delta, _mom_to_host(m), _mom_to_host(v),
                    _shift_to_host(shift), acc)

        leaf_args = list(zip(p_leaves, flat(grads), flat(state.exp_avg),
                             flat(state.exp_avg_sq), flat(state.shift),
                             flat(state.accumulated_decay)))

        if not (shift_host or moments_host):
            results = [leaf_update(*a, leaf_keys[i])
                       for i, a in enumerate(leaf_args)]
        else:
            # Streaming modes: without explicit sequencing XLA is free to
            # schedule every leaf's fp32 update temps concurrently — at
            # SDXL scale that is ~60 GB of HLO temps (measured OOM report,
            # 2026-08-19).  Chain the leaves in ~33.5M-param groups
            # (``stream_group_params``, the default measured in the
            # round-4 single-program runs; ~2x0.5 GB of fp32 temps) through
            # lax.optimization_barrier with a pipeline depth of 2: group
            # k+1's inputs depend on group k-1's outputs, so at most two
            # groups' temps (and host DMAs) are in flight — the DMA-in of
            # the next group overlaps the elementwise math of the current
            # one.  PRNG keys stay outside the barrier (extended dtypes);
            # they are tiny and carry no memory pressure.
            budget = stream_group_params
            groups, cur, n = [], [], 0
            for i, p in enumerate(p_leaves):
                cur.append(i)
                n += p.size
                if n >= budget:
                    groups.append(cur)
                    cur, n = [], 0
            if cur:
                groups.append(cur)

            results = [None] * len(p_leaves)
            pending = []  # (group_indices, outputs) not yet finalized
            for grp in groups:
                ins = tuple(leaf_args[i] for i in grp)
                if len(pending) >= 2:
                    old_grp, old_outs = pending.pop(0)
                    ins, old_outs = jax.lax.optimization_barrier(
                        (ins, old_outs))
                    for j, gi in enumerate(old_grp):
                        results[gi] = old_outs[j]
                outs = [leaf_update(*a, leaf_keys[gi])
                        for a, gi in zip(ins, grp)]
                pending.append((grp, outs))
            for old_grp, old_outs in pending:
                for j, gi in enumerate(old_grp):
                    results[gi] = old_outs[j]
        pick = lambda i: jax.tree_util.tree_unflatten(
            treedef, [r[i] for r in results])
        new_state = AdamWBF16State(step=step, exp_avg=pick(1),
                                   exp_avg_sq=pick(2), shift=pick(3),
                                   accumulated_decay=pick(4), key=new_key)
        return pick(0), new_state

    # ================================================================ flat
    def init_flat(params):
        leaves, _ = jax.tree_util.tree_flatten(params)
        _validate(leaves)
        f32_idx, groups = _partition_flat(leaves, flat_groups)
        key = jax.random.key(seed, impl=prng_impl)
        phases = jax.random.uniform(
            jax.random.fold_in(key, 1),
            (max(len(groups), 1),), jnp.float32) * DECAY_THRESHOLD

        def flat_zeros(group):
            return jnp.zeros((sum(leaves[i].size for i in group),),
                             jnp.bfloat16)

        def tree(maker_flat, maker_f32):
            d = {f"flat_{g}": maker_flat(group)
                 for g, group in enumerate(groups)}
            d.update({f"leaf_{i}": maker_f32(leaves[i]) for i in f32_idx})
            return d

        return AdamWBF16State(
            step=jnp.zeros((), jnp.int32),
            exp_avg=tree(flat_zeros, jnp.zeros_like),
            exp_avg_sq=tree(flat_zeros, jnp.zeros_like),
            shift=tree(flat_zeros, jnp.zeros_like),
            accumulated_decay={f"flat_{g}": phases[g]
                               for g in range(len(groups))},
            key=jax.random.fold_in(key, 2),
        )

    def update_flat(grads, state, params):
        if params is None:
            raise ValueError("adamw_bf16 requires params")
        step = state.step + 1
        cur_lr = lr_schedule(step) if lr_schedule is not None else lr
        denom_correction = jnp.sqrt(1.0 - beta2 ** step.astype(jnp.float32))

        p_leaves, treedef = jax.tree_util.tree_flatten(params)
        g_leaves = treedef.flatten_up_to(grads)
        f32_idx, groups = _partition_flat(p_leaves, flat_groups)
        new_key, step_key = jax.random.split(state.key)
        keys = jax.random.split(step_key,
                                max(len(groups) + len(f32_idx), 1))

        deltas = [None] * len(p_leaves)
        new_m = dict(state.exp_avg)
        new_v = dict(state.exp_avg_sq)
        new_sh = dict(state.shift)
        new_acc = dict(state.accumulated_decay)

        for g, group in enumerate(groups):
            name = f"flat_{g}"
            p_flat = jnp.concatenate([p_leaves[i].ravel() for i in group])
            g_flat = jnp.concatenate(
                [g_leaves[i].ravel().astype(jnp.bfloat16) for i in group])
            delta_flat, m, v, sh, acc = bf16_update(
                p_flat, g_flat, state.exp_avg[name],
                state.exp_avg_sq[name], state.shift[name],
                state.accumulated_decay[name], keys[g], cur_lr,
                denom_correction)
            new_m[name], new_v[name], new_sh[name] = m, v, sh
            new_acc[name] = acc
            sizes = [p_leaves[i].size for i in group]
            offsets = np.cumsum(sizes)[:-1]
            for i, piece in zip(group, jnp.split(delta_flat, offsets)):
                deltas[i] = piece.reshape(p_leaves[i].shape)

        for j, i in enumerate(f32_idx):
            name = f"leaf_{i}"
            m, v = f32_update(p_leaves[i], g_leaves[i],
                              state.exp_avg[name], state.exp_avg_sq[name])
            deltas[i] = f32_delta(p_leaves[i], m, v, cur_lr,
                                  denom_correction)
            new_m[name], new_v[name] = m, v

        new_state = AdamWBF16State(
            step=step, exp_avg=new_m, exp_avg_sq=new_v, shift=new_sh,
            accumulated_decay=new_acc, key=new_key)
        return jax.tree_util.tree_unflatten(treedef, deltas), new_state

    # ============================================================== hybrid
    # Small bf16 leaves (< hybrid_threshold elements) pack into ONE flat
    # buffer; big leaves stay per-leaf.  Rationale (tools/measure_r3.py, 2026-08-17):
    # full flat packing measured ~500 ms at SDXL scale because ravelling
    # the BIG tiled conv/matmul leaves forces relayout copies — but 984 of
    # the UNet's 1680 leaves hold only 1.85% of the parameters, so packing
    # just those removes ~60% of the per-leaf kernel dispatches while the
    # relayout traffic scales with their (negligible) bytes.  Decay phase
    # is per flat group / per big leaf, same policy as "flat".
    def _partition_hybrid(leaves):
        f32_idx = [i for i, l in enumerate(leaves)
                   if l.dtype == jnp.float32]
        small = [i for i, l in enumerate(leaves)
                 if l.dtype == jnp.bfloat16 and l.size < hybrid_threshold]
        big = [i for i, l in enumerate(leaves)
               if l.dtype == jnp.bfloat16 and l.size >= hybrid_threshold]
        return f32_idx, ([small] if small else []), big

    def init_hybrid(params):
        leaves, _ = jax.tree_util.tree_flatten(params)
        _validate(leaves)
        f32_idx, groups, big = _partition_hybrid(leaves)
        key = jax.random.key(seed, impl=prng_impl)
        n_phases = max(len(groups) + len(big), 1)
        phases = jax.random.uniform(jax.random.fold_in(key, 1),
                                    (n_phases,), jnp.float32) * DECAY_THRESHOLD

        def flat_zeros(group):
            return jnp.zeros((sum(leaves[i].size for i in group),),
                             jnp.bfloat16)

        def tree(maker_flat, maker_leaf):
            d = {f"flat_{g}": maker_flat(group)
                 for g, group in enumerate(groups)}
            d.update({f"leaf_{i}": maker_leaf(leaves[i])
                      for i in big + f32_idx})
            return d

        acc = {f"flat_{g}": phases[g] for g in range(len(groups))}
        acc.update({f"leaf_{i}": phases[len(groups) + j]
                    for j, i in enumerate(big)})
        return AdamWBF16State(
            step=jnp.zeros((), jnp.int32),
            exp_avg=tree(flat_zeros, jnp.zeros_like),
            exp_avg_sq=tree(flat_zeros, jnp.zeros_like),
            shift=tree(flat_zeros, jnp.zeros_like),
            accumulated_decay=acc,
            key=jax.random.fold_in(key, 2),
        )

    def update_hybrid(grads, state, params):
        if params is None:
            raise ValueError("adamw_bf16 requires params")
        step = state.step + 1
        cur_lr = lr_schedule(step) if lr_schedule is not None else lr
        denom_correction = jnp.sqrt(1.0 - beta2 ** step.astype(jnp.float32))

        p_leaves, treedef = jax.tree_util.tree_flatten(params)
        g_leaves = treedef.flatten_up_to(grads)
        f32_idx, groups, big = _partition_hybrid(p_leaves)
        new_key, step_key = jax.random.split(state.key)
        keys = jax.random.split(step_key, max(len(groups) + len(big), 1))

        deltas = [None] * len(p_leaves)
        new_m = dict(state.exp_avg)
        new_v = dict(state.exp_avg_sq)
        new_sh = dict(state.shift)
        new_acc = dict(state.accumulated_decay)

        for g, group in enumerate(groups):
            name = f"flat_{g}"
            p_flat = jnp.concatenate([p_leaves[i].ravel() for i in group])
            g_flat = jnp.concatenate(
                [g_leaves[i].ravel().astype(jnp.bfloat16) for i in group])
            delta_flat, m, v, sh, acc = bf16_update(
                p_flat, g_flat, state.exp_avg[name],
                state.exp_avg_sq[name], state.shift[name],
                state.accumulated_decay[name], keys[g], cur_lr,
                denom_correction)
            new_m[name], new_v[name], new_sh[name] = m, v, sh
            new_acc[name] = acc
            sizes = [p_leaves[i].size for i in group]
            offsets = np.cumsum(sizes)[:-1]
            for i, piece in zip(group, jnp.split(delta_flat, offsets)):
                deltas[i] = piece.reshape(p_leaves[i].shape)

        for j, i in enumerate(big):
            name = f"leaf_{i}"
            delta, m, v, sh, acc = bf16_update(
                p_leaves[i], g_leaves[i], state.exp_avg[name],
                state.exp_avg_sq[name], state.shift[name],
                state.accumulated_decay[name], keys[len(groups) + j],
                cur_lr, denom_correction)
            new_m[name], new_v[name], new_sh[name] = m, v, sh
            new_acc[name] = acc
            deltas[i] = delta

        for i in f32_idx:
            name = f"leaf_{i}"
            m, v = f32_update(p_leaves[i], g_leaves[i],
                              state.exp_avg[name], state.exp_avg_sq[name])
            deltas[i] = f32_delta(p_leaves[i], m, v, cur_lr,
                                  denom_correction)
            new_m[name], new_v[name] = m, v

        new_state = AdamWBF16State(
            step=step, exp_avg=new_m, exp_avg_sq=new_v, shift=new_sh,
            accumulated_decay=new_acc, key=new_key)
        return jax.tree_util.tree_unflatten(treedef, deltas), new_state

    # ============================================================= stacked
    def _partition_stacked(leaves):
        """Same-shape bf16 leaves grouped (deterministic order); f32 leaves
        stay per-leaf.  Stacking along a NEW leading axis keeps each
        slice's tiled layout intact — no relayout, unlike "flat"."""
        f32_idx = [i for i, l in enumerate(leaves)
                   if l.dtype == jnp.float32]
        by_shape = {}
        for i, l in enumerate(leaves):
            if l.dtype == jnp.bfloat16:
                by_shape.setdefault(tuple(l.shape), []).append(i)
        groups = [by_shape[k] for k in sorted(by_shape)]
        return f32_idx, groups

    def init_stacked(params):
        leaves, _ = jax.tree_util.tree_flatten(params)
        _validate(leaves)
        f32_idx, groups = _partition_stacked(leaves)
        key = jax.random.key(seed, impl=prng_impl)
        n_leaves = max(len(leaves), 1)
        # per-LEAF decay phases, exactly like the per-leaf layout
        phases = jax.random.uniform(jax.random.fold_in(key, 1),
                                    (n_leaves,), jnp.float32) * DECAY_THRESHOLD

        def tree(maker_stack, maker_f32):
            d = {f"stack_{j}": maker_stack(group)
                 for j, group in enumerate(groups)}
            d.update({f"leaf_{i}": maker_f32(leaves[i]) for i in f32_idx})
            return d

        def zeros_stack(group):
            return jnp.zeros((len(group),) + tuple(leaves[group[0]].shape),
                             jnp.bfloat16)

        return AdamWBF16State(
            step=jnp.zeros((), jnp.int32),
            exp_avg=tree(zeros_stack, jnp.zeros_like),
            exp_avg_sq=tree(zeros_stack, jnp.zeros_like),
            shift=tree(zeros_stack, jnp.zeros_like),
            accumulated_decay={f"stack_{j}": phases[jnp.asarray(group)]
                               for j, group in enumerate(groups)},
            key=jax.random.fold_in(key, 2),
        )

    def update_stacked(grads, state, params):
        if params is None:
            raise ValueError("adamw_bf16 requires params")
        step = state.step + 1
        cur_lr = lr_schedule(step) if lr_schedule is not None else lr
        denom_correction = jnp.sqrt(1.0 - beta2 ** step.astype(jnp.float32))

        p_leaves, treedef = jax.tree_util.tree_flatten(params)
        g_leaves = treedef.flatten_up_to(grads)
        f32_idx, groups = _partition_stacked(p_leaves)
        new_key, step_key = jax.random.split(state.key)
        keys = jax.random.split(step_key, max(len(groups), 1))

        deltas = [None] * len(p_leaves)
        new_m = dict(state.exp_avg)
        new_v = dict(state.exp_avg_sq)
        new_sh = dict(state.shift)
        new_acc = dict(state.accumulated_decay)

        for j, group in enumerate(groups):
            name = f"stack_{j}"
            k = len(group)
            bshape = (k,) + (1,) * p_leaves[group[0]].ndim
            p_st = jnp.stack([p_leaves[i] for i in group])
            g_st = jnp.stack([g_leaves[i].astype(jnp.bfloat16)
                              for i in group])
            acc_b = state.accumulated_decay[name].reshape(bshape)
            delta_st, m, v, sh, acc_b = bf16_update(
                p_st, g_st, state.exp_avg[name], state.exp_avg_sq[name],
                state.shift[name], acc_b, keys[j], cur_lr,
                denom_correction)
            new_m[name], new_v[name], new_sh[name] = m, v, sh
            new_acc[name] = acc_b.reshape((k,))
            for row, i in enumerate(group):
                deltas[i] = delta_st[row]

        for i in f32_idx:
            name = f"leaf_{i}"
            m, v = f32_update(p_leaves[i], g_leaves[i],
                              state.exp_avg[name], state.exp_avg_sq[name])
            deltas[i] = f32_delta(p_leaves[i], m, v, cur_lr,
                                  denom_correction)
            new_m[name], new_v[name] = m, v

        new_state = AdamWBF16State(
            step=step, exp_avg=new_m, exp_avg_sq=new_v, shift=new_sh,
            accumulated_decay=new_acc, key=new_key)
        return jax.tree_util.tree_unflatten(treedef, deltas), new_state

    if layout == "flat":
        return optax.GradientTransformation(init_flat, update_flat)
    if layout == "stacked":
        return optax.GradientTransformation(init_stacked, update_stacked)
    if layout == "hybrid":
        return optax.GradientTransformation(init_hybrid, update_hybrid)
    return optax.GradientTransformation(init_per_leaf, update_per_leaf)
