"""Train-step tests: ddpm + flow_matching methods, grad accumulation,
clipping, finite-guard, and data-parallel execution on the 8-device mesh."""
import chex
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdxl_training_improvements_tpu.config import Config
from sdxl_training_improvements_tpu.models.sdxl import SDXLModel
from sdxl_training_improvements_tpu.parallel import mesh as M
from sdxl_training_improvements_tpu.training.methods import (
    LOSS_REGISTRY, get_method)
from sdxl_training_improvements_tpu.training.optimizers import make_optimizer
from sdxl_training_improvements_tpu.training.schedules import NoiseSchedule
from sdxl_training_improvements_tpu.training.trainer import (

    TrainState, create_train_state, make_train_step, shard_batch,
    shard_train_state)


# fast lane: `pytest -m "not slow"` (compile-heavy module, README: Testing)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny_model():
    model = SDXLModel.create(tiny=True, dtype=jnp.float32,
                             init_rng=jax.random.key(0))
    return model


def make_batch(key, b, size=16, ctx_dim=64, pooled=32):
    ks = jax.random.split(key, 4)
    return {
        "vae_latents": jax.random.normal(ks[0], (b, 4, size, size)),
        "prompt_embeds": jax.random.normal(ks[1], (b, 77, ctx_dim)),
        "pooled_prompt_embeds": jax.random.normal(ks[2], (b, pooled)),
        "time_ids": jnp.tile(jnp.asarray([[128., 128., 0., 0., 128., 128.]]),
                             (b, 1)),
    }


def build(config, model, mesh=None):
    sched = NoiseSchedule.from_config(config)
    opt = make_optimizer(config)
    step = make_train_step(model.unet_apply, sched, opt, config, mesh=mesh,
                           donate=False)
    state = create_train_state(model.trainable_params(), opt)
    return step, state


class TestMethods:
    def test_registry(self):
        assert set(LOSS_REGISTRY) >= {"ddpm", "flow_matching"}
        with pytest.raises(ValueError, match="Unknown training method"):
            get_method("bogus")

    @pytest.mark.parametrize("method", ["ddpm", "flow_matching"])
    def test_loss_finite(self, tiny_model, method):
        cfg = Config()
        cfg.training.method = method
        cfg.optimizer.optimizer_type = "adamw"
        cfg.training.gradient_accumulation_steps = 1
        step, state = build(cfg, tiny_model)
        batch = make_batch(jax.random.key(1), 2)
        state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))
        assert int(state.step) == 1

    def test_ddpm_metrics_surface(self, tiny_model):
        cfg = Config()
        cfg.optimizer.optimizer_type = "adamw"
        step, state = build(cfg, tiny_model)
        _, metrics = step(state, make_batch(jax.random.key(1), 2))
        for k in ["loss", "timestep_mean", "timestep_std", "noise_scale",
                  "pred_scale", "grad_norm"]:
            assert k in metrics

    def test_flow_matching_metrics_surface(self, tiny_model):
        cfg = Config()
        cfg.training.method = "flow_matching"
        cfg.optimizer.optimizer_type = "adamw"
        step, state = build(cfg, tiny_model)
        _, metrics = step(state, make_batch(jax.random.key(1), 2))
        for k in ["loss", "x0_norm", "x1_norm", "velocity_norm", "time_mean",
                  "time_std"]:
            assert k in metrics

    def test_tag_weights_scale_loss(self, tiny_model):
        cfg = Config()
        cfg.optimizer.optimizer_type = "adamw"
        cfg.model.min_snr_gamma = None
        cfg.model.use_ztsnr = False
        cfg.model.sigma_max = 10.0
        cfg.training.prediction_type = "epsilon"  # moderate loss, no clamp
        sched = NoiseSchedule.from_config(cfg)
        loss_fn = get_method("ddpm")
        batch = make_batch(jax.random.key(1), 2)
        l1, _ = loss_fn(tiny_model.unet_apply, tiny_model.trainable_params(),
                        batch, jax.random.key(2), sched, cfg.model)
        batch2 = dict(batch, tag_weights=jnp.asarray([2.0, 2.0]))
        l2, _ = loss_fn(tiny_model.unet_apply, tiny_model.trainable_params(),
                        batch2, jax.random.key(2), sched, cfg.model)
        np.testing.assert_allclose(float(l2), 2 * float(l1), rtol=1e-5)

    def test_tag_weights_legacy_scalar_contract(self):
        """A method plugin written against the pre-round-3 example —
        ``loss = _apply_tag_weights(loss, batch)`` on an already-reduced
        scalar — must still get a scalar back (``loss * tw.mean()``, the
        reference's collapse), not a (B,) broadcast that breaks
        value_and_grad at trace time."""
        from sdxl_training_improvements_tpu.training.methods import (
            _apply_tag_weights)
        batch = {"tag_weights": jnp.asarray([2.0, 4.0])}
        out = _apply_tag_weights(jnp.float32(10.0), batch)
        assert out.ndim == 0
        np.testing.assert_allclose(float(out), 30.0, rtol=1e-6)
        per = _apply_tag_weights(jnp.asarray([1.0, 1.0]), batch)
        np.testing.assert_allclose(np.asarray(per), [2.0, 4.0])

    def test_finite_guard_on_nan_input(self, tiny_model):
        """NaN latents -> loss == 1000.0 fallback, not NaN
        (reference ``ddpm_trainer.py:379-384``)."""
        cfg = Config()
        cfg.optimizer.optimizer_type = "adamw"
        sched = NoiseSchedule.from_config(cfg)
        loss_fn = get_method("ddpm")
        batch = make_batch(jax.random.key(1), 2)
        batch["vae_latents"] = batch["vae_latents"].at[0, 0, 0, 0].set(jnp.nan)
        loss, _ = loss_fn(tiny_model.unet_apply, tiny_model.trainable_params(),
                          batch, jax.random.key(2), sched, cfg.model)
        assert float(loss) == 1000.0


class TestGradAccum:
    def test_accum_equals_large_batch_direction(self, tiny_model):
        """G=2 over batch 4 must equal G=1 over the same batch 4 when the
        per-micro RNG is the only difference -> check shapes/finiteness and
        that accumulation divides by G (loss scale comparable)."""
        cfg = Config()
        cfg.optimizer.optimizer_type = "adamw"
        cfg.training.gradient_accumulation_steps = 2
        step, state = build(cfg, tiny_model)
        batch = make_batch(jax.random.key(1), 4)
        state2, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))
        # params changed
        diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                            state.params, state2.params)
        assert max(jax.tree.leaves(diff)) > 0

    def test_indivisible_batch_raises(self, tiny_model):
        cfg = Config()
        cfg.optimizer.optimizer_type = "adamw"
        cfg.training.gradient_accumulation_steps = 3
        step, state = build(cfg, tiny_model)
        batch = make_batch(jax.random.key(1), 4)
        with pytest.raises(Exception):
            step(state, batch)

    @pytest.mark.parametrize("method", ["ddpm", "flow_matching"])
    def test_micro_batch_retile_is_exact(self, tiny_model, method):
        """tpu.micro_batch_size is a pure re-tiling of the same global
        batch: per-sample PRNG keys + per-sample tag weights make every
        tiling (4x1, 2x2, 1x4 micro-batches) compute the same mean over
        the same per-sample terms — equal up to fp32 summation order."""
        batch = make_batch(jax.random.key(1), 4)
        # per-sample tag weights exercise the per-sample weighting path
        # (the batch-mean formula the reference uses would NOT be
        # tile-invariant)
        batch["tag_weights"] = jnp.asarray([0.5, 1.0, 1.5, 2.0])

        outs = []
        for batch_size, accum, micro in [(4, 1, None), (2, 2, None),
                                         (4, 1, 1), (4, 1, 2), (1, 4, None)]:
            cfg = Config()
            cfg.training.method = method
            cfg.optimizer.optimizer_type = "adamw"
            cfg.training.batch_size = batch_size
            cfg.training.gradient_accumulation_steps = accum
            if micro is not None:
                cfg.tpu.micro_batch_size = micro
            step, state = build(cfg, tiny_model)
            out, m = step(state, batch)
            outs.append((out, m))

        ref_out, ref_m = outs[0]
        for out, m in outs[1:]:
            assert float(m["loss"]) == pytest.approx(
                float(ref_m["loss"]), rel=1e-5)
            chex.assert_trees_all_close(out.params, ref_out.params,
                                        rtol=1e-4, atol=1e-6)

    @pytest.mark.parametrize("accum", [1, 2])
    def test_bf16_grad_accum_close_to_fp32(self, tiny_model, accum):
        """tpu.grad_accum_dtype=bfloat16 (the 16 GB single-program knob):
        same step, bf16 running sum — params land within bf16 rounding of
        the fp32-accumulated step and the loss is identical (the loss
        doesn't flow through the accumulator)."""
        batch = make_batch(jax.random.key(3), 4)
        outs = {}
        for dtype in ("float32", "bfloat16"):
            cfg = Config()
            cfg.optimizer.optimizer_type = "adamw"
            cfg.training.gradient_accumulation_steps = accum
            cfg.tpu.grad_accum_dtype = dtype
            step, state = build(cfg, tiny_model)
            outs[dtype] = step(state, batch)
        s32, m32 = outs["float32"]
        s16, m16 = outs["bfloat16"]
        assert float(m16["loss"]) == pytest.approx(float(m32["loss"]),
                                                   rel=1e-6)
        chex.assert_trees_all_close(s16.params, s32.params,
                                    rtol=2e-2, atol=2e-5)

    def test_grad_accum_dtype_validated(self):
        cfg = Config()
        with pytest.raises(ValueError, match="grad_accum_dtype"):
            cfg.tpu.grad_accum_dtype = "fp8"
            cfg.tpu.__post_init__()

    def test_micro_batch_must_divide_global(self, tiny_model):
        cfg = Config()
        cfg.optimizer.optimizer_type = "adamw"
        cfg.training.batch_size = 4
        cfg.training.gradient_accumulation_steps = 1
        cfg.tpu.micro_batch_size = 3
        with pytest.raises(ValueError, match="must divide the global"):
            build(cfg, tiny_model)


class TestClipping:
    def test_grad_norm_reported_and_clipped(self, tiny_model):
        cfg = Config()
        cfg.optimizer.optimizer_type = "adamw"
        cfg.training.clip_grad_norm = 1e-9  # clip everything to ~0
        step, state = build(cfg, tiny_model)
        state2, metrics = step(state, make_batch(jax.random.key(1), 2))
        assert float(metrics["grad_norm"]) > 0
        # with near-zero clip the adam update is still ~lr-sized; just check
        # it ran and produced finite params
        assert all(np.isfinite(np.asarray(l)).all()
                   for l in jax.tree.leaves(state2.params))


class TestDataParallel:
    def test_dp8_matches_single_device(self, tiny_model):
        """The sharded step on the 8-device mesh must produce the same loss
        as the unsharded step (same RNG) — DDP-equivalence."""
        cfg = Config()
        cfg.optimizer.optimizer_type = "adamw"
        mesh = M.create_mesh()
        step_sharded = make_train_step(
            tiny_model.unet_apply, NoiseSchedule.from_config(cfg),
            make_optimizer(cfg), cfg, mesh=mesh, donate=False)
        step_plain = make_train_step(
            tiny_model.unet_apply, NoiseSchedule.from_config(cfg),
            make_optimizer(cfg), cfg, mesh=None, donate=False)
        opt = make_optimizer(cfg)
        state = create_train_state(tiny_model.trainable_params(), opt)
        batch = make_batch(jax.random.key(1), 8)

        s_state = shard_train_state(state, mesh, shard_params=False)
        s_batch = shard_batch(batch, mesh)
        out_s, m_s = step_sharded(s_state, s_batch)
        out_p, m_p = step_plain(state, batch)
        np.testing.assert_allclose(float(m_s["loss"]), float(m_p["loss"]),
                                   rtol=2e-4)
        # params stay in sync across devices and match the unsharded result
        pa = jax.tree.leaves(out_s.params)[0]
        pb = jax.tree.leaves(out_p.params)[0]
        np.testing.assert_allclose(np.asarray(pa, np.float32),
                                   np.asarray(pb, np.float32), atol=2e-4)

    def test_fsdp_sharded_params_execute(self, tiny_model):
        cfg = Config()
        cfg.optimizer.optimizer_type = "adamw"
        cfg.tpu.mesh_shape = [2, 4, 1]
        mesh = M.mesh_from_config(cfg)
        step = make_train_step(
            tiny_model.unet_apply, NoiseSchedule.from_config(cfg),
            make_optimizer(cfg), cfg, mesh=mesh, donate=False)
        opt = make_optimizer(cfg)
        state = create_train_state(tiny_model.trainable_params(), opt)
        state = shard_train_state(state, mesh, shard_params=True)
        batch = shard_batch(make_batch(jax.random.key(1), 8), mesh)
        state2, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))
        # some param leaf actually sharded over fsdp
        shardings = [l.sharding.spec for l in jax.tree.leaves(state.params)]
        assert any("fsdp" in str(s) for s in shardings)

    def test_tensor_parallel_matches_dp(self, tiny_model):
        """Megatron column/row sharding over the tensor axis (mesh 2,2,2)
        must compute the same loss as the unsharded step — TP is a layout,
        not a different function (round-2 item 8)."""
        cfg = Config()
        cfg.optimizer.optimizer_type = "adamw"
        cfg.tpu.mesh_shape = [2, 2, 2]
        mesh = M.mesh_from_config(cfg)
        step_tp = make_train_step(
            tiny_model.unet_apply, NoiseSchedule.from_config(cfg),
            make_optimizer(cfg), cfg, mesh=mesh, donate=False)
        step_plain = make_train_step(
            tiny_model.unet_apply, NoiseSchedule.from_config(cfg),
            make_optimizer(cfg), cfg, mesh=None, donate=False)
        opt = make_optimizer(cfg)
        state = create_train_state(tiny_model.trainable_params(), opt)
        batch = make_batch(jax.random.key(1), 8)

        s_state = shard_train_state(state, mesh, shard_params=True)
        # qkv/ff kernels actually carry the tensor axis
        specs = {
            "/".join(str(getattr(k, "key", k)) for k in path):
                leaf.sharding.spec
            for path, leaf in
            jax.tree_util.tree_flatten_with_path(s_state.params)[0]}
        tp_kernels = [s for p, s in specs.items()
                      if "to_q/kernel" in p or "ff/net_2/kernel" in p]
        assert tp_kernels and all("tensor" in str(s) for s in tp_kernels)
        # opt-state moments mirror their params' sharding
        m_specs = {
            "/".join(str(getattr(k, "key", k)) for k in path):
                leaf.sharding.spec
            for path, leaf in jax.tree_util.tree_flatten_with_path(
                s_state.opt_state)[0]}
        assert any("tensor" in str(s) for p, s in m_specs.items()
                   if "to_q/kernel" in p)

        out_tp, m_tp = step_tp(s_state, shard_batch(batch, mesh))
        out_p, m_p = step_plain(state, batch)
        np.testing.assert_allclose(float(m_tp["loss"]), float(m_p["loss"]),
                                   rtol=2e-4)
        pa = jax.tree.leaves(out_tp.params)[0]
        pb = jax.tree.leaves(out_p.params)[0]
        np.testing.assert_allclose(np.asarray(pa, np.float32),
                                   np.asarray(pb, np.float32), atol=2e-4)

    def test_fsdp_spec_replicates_small_params(self):
        """1-D and small params must replicate: fsdp-sharding biases/norm
        scales forces SPMD involuntary full rematerialization of their
        grad reduces (round-1 verdict, MULTICHIP_r01 tail)."""
        from jax.sharding import PartitionSpec as P
        assert M._fsdp_spec_for((128,), 2) == P()          # bias
        assert M._fsdp_spec_for((10240,), 2) == P()        # largest SDXL bias
        assert M._fsdp_spec_for((320, 64), 2) == P()       # small 2-D
        big = M._fsdp_spec_for((1280, 10240), 2)           # ff kernel
        assert "fsdp" in str(big)
        conv = M._fsdp_spec_for((3, 3, 320, 640), 2)
        assert conv == P(None, None, None, "fsdp")

    def test_fsdp_compile_emits_no_spmd_remat_warnings(self, tiny_model,
                                                       capfd):
        """Fresh-compiling the fsdp-sharded step must not trigger the SPMD
        partitioner's 'Involuntary full rematerialization' path.  (On a
        compilation-cache hit XLA emits nothing, which also passes — the
        assertion bites whenever this HLO is actually rebuilt.)"""
        cfg = Config()
        cfg.optimizer.optimizer_type = "adamw"
        cfg.tpu.mesh_shape = [2, 4, 1]
        mesh = M.mesh_from_config(cfg)
        step = make_train_step(
            tiny_model.unet_apply, NoiseSchedule.from_config(cfg),
            make_optimizer(cfg), cfg, mesh=mesh, donate=False)
        opt = make_optimizer(cfg)
        state = create_train_state(tiny_model.trainable_params(), opt)
        state = shard_train_state(state, mesh, shard_params=True)
        batch = shard_batch(make_batch(jax.random.key(1), 8), mesh)
        capfd.readouterr()  # drain
        state2, metrics = step(state, batch)
        jax.block_until_ready(metrics["loss"])
        err = capfd.readouterr().err
        assert "Involuntary full rematerialization" not in err


class TestNaNRobustness:
    def test_overflow_loss_never_poisons_params(self, tiny_model):
        """Extreme latents -> overflowed mse -> clamped loss, ZERO (not NaN)
        gradients, finite params after the step (the reference detaches its
        fallback loss tensor; our guards must match that posture)."""
        cfg = Config()
        cfg.optimizer.optimizer_type = "adamw"
        step, state = build(cfg, tiny_model)
        batch = make_batch(jax.random.key(1), 2)
        batch["vae_latents"] = batch["vae_latents"] * 1e30  # force overflow
        state2, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))  # guarded, never NaN
        for leaf in jax.tree.leaves(state2.params):
            assert np.isfinite(np.asarray(leaf, np.float32)).all(), \
                "params poisoned by non-finite gradients"
