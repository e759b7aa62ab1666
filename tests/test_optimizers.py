"""Optimizer tests: stochastic rounding properties, convergence on a quadratic,
SOAP preconditioner behaviour (SURVEY.md §4: property tests for
copy_stochastic_ — mean-preserving, bf16-representable output)."""
import chex
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from sdxl_training_improvements_tpu.ops.stochastic import (
    add_stochastic, stochastic_round_to_bf16)
from sdxl_training_improvements_tpu.training.optimizers import (
    adamw_bf16, adamw_schedule_free_kahan, make_optimizer, soap)
from sdxl_training_improvements_tpu.config import Config


class TestStochasticRounding:
    def test_output_is_bf16_representable(self):
        x = jnp.asarray([1.2345678, -3.1415926, 1e-8], jnp.float32)
        r = stochastic_round_to_bf16(x, jax.random.key(0))
        assert r.dtype == jnp.bfloat16

    def test_exact_values_unchanged(self):
        # values exactly representable in bf16 never move
        x = jnp.asarray([1.0, 0.5, -2.0, 256.0], jnp.float32)
        for s in range(5):
            r = stochastic_round_to_bf16(x, jax.random.key(s))
            np.testing.assert_array_equal(np.asarray(r, np.float32),
                                          np.asarray(x))

    def test_mean_preserving(self):
        # E[SR(x)] == x: x exactly halfway between two bf16 neighbours
        lo = jnp.float32(1.0)
        hi = np.nextafter(np.float32(1.0), 2.0, dtype=np.float32)
        # bf16 next value after 1.0 is 1.0078125
        x = jnp.full((100_000,), 1.00390625, jnp.float32)  # halfway
        r = stochastic_round_to_bf16(x, jax.random.key(1)).astype(jnp.float32)
        mean = float(jnp.mean(r))
        assert abs(mean - 1.00390625) < 1e-4
        vals = set(np.unique(np.asarray(r)))
        assert vals == {1.0, 1.0078125}

    def test_rounds_up_with_correct_probability(self):
        # x = lo + 0.25*(hi-lo) -> P(up) = 0.25
        x = jnp.full((200_000,), 1.001953125, jnp.float32)
        r = stochastic_round_to_bf16(x, jax.random.key(2)).astype(jnp.float32)
        p_up = float(jnp.mean(r > 1.0))
        assert abs(p_up - 0.25) < 0.01

    def test_add_stochastic_accumulates_tiny_updates(self):
        """The motivating property: repeatedly adding sub-ulp values to a bf16
        accumulator must make progress on average (nearest-rounding stalls)."""
        acc = jnp.full((4096,), 1.0, jnp.bfloat16)
        tiny = jnp.full((4096,), 1e-4, jnp.float32)  # ulp(1.0)=0.0078 in bf16
        key = jax.random.key(3)
        for i in range(100):
            key, k = jax.random.split(key)
            acc = add_stochastic(acc, tiny, k)
        mean = float(jnp.mean(acc.astype(jnp.float32)))
        # exact result 1.01; nearest rounding would stay at 1.0
        assert 1.005 < mean < 1.015


def quadratic_losses(opt, dtype, steps=200, lr_check=True):
    """Minimize ||x - target||^2 and report trajectory."""
    target = jnp.asarray([1.0, -2.0, 3.0, 0.5], jnp.float32)
    params = {"w": jnp.zeros((4,), dtype)}
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        def loss_fn(p):
            return jnp.mean((p["w"].astype(jnp.float32) - target) ** 2)
        loss, g = jax.value_and_grad(loss_fn)(params)
        g = jax.tree.map(lambda x: x.astype(params["w"].dtype), g)
        updates, state2 = opt.update(g, state, params)
        import optax
        return optax.apply_updates(params, updates), state2, loss

    losses = []
    for _ in range(steps):
        params, state, loss = step(params, state)
        losses.append(float(loss))
    return losses, params


class TestAdamWBF16:
    def test_rejects_fp16(self):
        opt = adamw_bf16(lr=0.1)
        with pytest.raises(ValueError, match="bfloat16"):
            opt.init({"w": jnp.zeros((4,), jnp.float16)})

    def test_fp32_norm_leaves_get_exact_path(self):
        """Mixed trees: bf16 weights + fp32 norm params both update."""
        import optax
        opt = adamw_bf16(lr=0.1)
        params = {"w": jnp.ones((4,), jnp.bfloat16),
                  "scale": jnp.ones((4,), jnp.float32)}
        state = opt.init(params)
        g = {"w": jnp.ones((4,), jnp.bfloat16),
             "scale": jnp.ones((4,), jnp.float32)}
        upd, state = opt.update(g, state, params)
        params = optax.apply_updates(params, upd)
        assert params["scale"].dtype == jnp.float32
        assert float(params["scale"][0]) < 1.0
        assert float(params["w"].astype(jnp.float32)[0]) < 1.0

    def test_converges_on_quadratic(self):
        opt = adamw_bf16(lr=0.05, seed=0)
        losses, params = quadratic_losses(opt, jnp.bfloat16, steps=300)
        assert losses[-1] < 0.01 * losses[0]

    def test_weight_decay_batched_fires(self):
        # pure decay: zero grads, nonzero params -> params shrink eventually
        opt = adamw_bf16(lr=0.1, weight_decay=0.5, seed=1)
        params = {"w": jnp.full((16,), 1.0, jnp.bfloat16)}
        state = opt.init(params)
        import optax
        for _ in range(40):
            g = {"w": jnp.zeros((16,), jnp.bfloat16)}
            upd, state = opt.update(g, state, params)
            params = optax.apply_updates(params, upd)
        assert float(jnp.mean(params["w"].astype(jnp.float32))) < 0.9

    def test_state_is_bf16(self):
        opt = adamw_bf16(lr=0.1)
        state = opt.init({"w": jnp.zeros((8,), jnp.bfloat16)})
        assert state.exp_avg["w"].dtype == jnp.bfloat16
        assert state.shift["w"].dtype == jnp.bfloat16


class TestCounterNoise:
    """The fused hash noise source (ops/stochastic.counter_noise) must be
    uniform enough for stochastic rounding (it replaces materialised
    jax.random.bits planes in the flat/hash optimizer paths)."""

    def test_deterministic_and_seed_sensitive(self):
        from sdxl_training_improvements_tpu.ops.stochastic import counter_noise
        a = np.asarray(counter_noise(jnp.uint32(1), 1024))
        b = np.asarray(counter_noise(jnp.uint32(1), 1024))
        c = np.asarray(counter_noise(jnp.uint32(2), 1024))
        np.testing.assert_array_equal(a, b)
        assert (a != c).mean() > 0.99

    def test_low16_uniformity(self):
        """Chi-square over 64 buckets of the low 16 bits (what SR consumes)."""
        from sdxl_training_improvements_tpu.ops.stochastic import counter_noise
        n = 1 << 18
        bits = np.asarray(counter_noise(jnp.uint32(7), n)) & 0xFFFF
        counts = np.bincount(bits >> 10, minlength=64)  # 64 buckets
        expected = n / 64
        chi2 = float(((counts - expected) ** 2 / expected).sum())
        # 63 dof: 99.9th percentile ~ 103
        assert chi2 < 110, chi2

    def test_sr_unbiased_with_hash_noise(self):
        from sdxl_training_improvements_tpu.ops.stochastic import (
            counter_noise, stochastic_round_bits)
        n = 1 << 18
        ulp = 2.0 ** -7  # bf16 ulp at 1.0
        x = jnp.full((n,), 1.0 + ulp / 4, jnp.float32)
        noise = counter_noise(jnp.uint32(3), n)
        r = np.asarray(stochastic_round_bits(x, noise), np.float32)
        assert set(np.unique(r)) <= {1.0, 1.0 + ulp}
        mean = r.mean()
        assert abs(mean - (1.0 + ulp / 4)) < ulp / 40, mean


class TestAdamWBF16Flat:
    """Flat-state layout: same algorithm on contiguous buffers
    (adamw_bf16(flat_state=True)); the leverage is a handful of large fused
    passes + fused hash noise instead of ~330 per-leaf kernels."""

    def _tree(self):
        return {
            "a": jnp.ones((8, 4), jnp.bfloat16),
            "b": {"w": jnp.full((16,), 0.5, jnp.bfloat16),
                  "scale": jnp.ones((4,), jnp.float32)},
            "c": jnp.full((3, 3), -0.25, jnp.bfloat16),
        }

    def test_state_layout(self):
        opt = adamw_bf16(lr=0.1, flat_state=True, flat_groups=2)
        state = opt.init(self._tree())
        flat_keys = [k for k in state.exp_avg if k.startswith("flat_")]
        leaf_keys = [k for k in state.exp_avg if k.startswith("leaf_")]
        assert flat_keys and leaf_keys  # bf16 groups + the fp32 scale leaf
        total = sum(state.exp_avg[k].size for k in flat_keys)
        assert total == 8 * 4 + 16 + 9
        for k in flat_keys:
            assert state.exp_avg[k].dtype == jnp.bfloat16
            assert k in state.accumulated_decay

    def test_single_step_matches_per_leaf_within_sr_ulp(self):
        """From identical state, flat and per-leaf updates may differ only
        by stochastic-rounding noise (different streams)."""
        import optax
        tree = self._tree()
        g = jax.tree.map(
            lambda p: jnp.full(p.shape, 0.1, p.dtype), tree)
        results = {}
        for name, opt in [
                ("leaf", adamw_bf16(lr=0.05, seed=0)),
                ("flat", adamw_bf16(lr=0.05, seed=0, flat_state=True))]:
            state = opt.init(tree)
            upd, _ = opt.update(g, state, tree)
            results[name] = optax.apply_updates(tree, upd)
        la = jax.tree.leaves(results["leaf"])
        fa = jax.tree.leaves(results["flat"])
        for x, y in zip(la, fa):
            np.testing.assert_allclose(
                np.asarray(x, np.float32), np.asarray(y, np.float32),
                atol=2e-2)

    @pytest.mark.parametrize("noise", ["hash", "rbg"])
    def test_converges_on_quadratic(self, noise):
        opt = adamw_bf16(lr=0.05, seed=0, flat_state=True, noise=noise)
        losses, params = quadratic_losses(opt, jnp.bfloat16, steps=300)
        assert losses[-1] < 0.01 * losses[0]

    def test_hash_noise_per_leaf_converges(self):
        opt = adamw_bf16(lr=0.05, seed=0, noise="hash")
        losses, _ = quadratic_losses(opt, jnp.bfloat16, steps=300)
        assert losses[-1] < 0.01 * losses[0]

    def test_weight_decay_fires_per_group(self):
        import optax
        opt = adamw_bf16(lr=0.1, weight_decay=0.5, seed=1, flat_state=True)
        params = {"w": jnp.full((16,), 1.0, jnp.bfloat16)}
        state = opt.init(params)
        for _ in range(40):
            g = {"w": jnp.zeros((16,), jnp.bfloat16)}
            upd, state = opt.update(g, state, params)
            params = optax.apply_updates(params, upd)
        assert float(jnp.mean(params["w"].astype(jnp.float32))) < 0.9

    def test_resolve_flat_state(self):
        """auto resolves OFF (flat measured 3.5x slower at full scale:
        TPU tiled-layout relayouts); "on" is the A/B escape hatch and is
        rejected under model sharding."""
        from sdxl_training_improvements_tpu.training.optimizers import (
            resolve_flat_state)
        cfg = Config()
        assert resolve_flat_state(cfg.tpu) is False  # auto -> per-leaf
        cfg.tpu.flat_optimizer = "off"
        assert resolve_flat_state(cfg.tpu) is False
        cfg.tpu.flat_optimizer = "on"
        assert resolve_flat_state(cfg.tpu) is True
        cfg.tpu.shard_params = True
        with pytest.raises(ValueError, match="model sharding"):
            resolve_flat_state(cfg.tpu)
        cfg.tpu.shard_params = False
        cfg.tpu.mesh_shape = [2, 1, 4]
        with pytest.raises(ValueError, match="model sharding"):
            resolve_flat_state(cfg.tpu)

    def test_make_optimizer_threads_flat(self):
        cfg = Config()
        cfg.optimizer.optimizer_type = "adamw_bf16"
        cfg.tpu.flat_optimizer = "on"
        opt = make_optimizer(cfg)
        state = opt.init({"w": jnp.zeros((8,), jnp.bfloat16)})
        inner = state[0] if isinstance(state, tuple) and not hasattr(
            state, "exp_avg") else state
        assert any(k.startswith("flat_") for k in inner.exp_avg)


class TestScheduleFree:
    def test_converges(self):
        opt = adamw_schedule_free_kahan(lr=0.05, weight_decay=0.0)
        losses, _ = quadratic_losses(opt, jnp.float32, steps=300)
        assert losses[-1] < 0.01 * losses[0]

    def test_warmup_slows_start(self):
        fast = adamw_schedule_free_kahan(lr=0.1, weight_decay=0.0)
        slow = adamw_schedule_free_kahan(lr=0.1, weight_decay=0.0,
                                         warmup_steps=100)
        lf, _ = quadratic_losses(fast, jnp.float32, steps=20)
        ls, _ = quadratic_losses(slow, jnp.float32, steps=20)
        assert ls[-1] > lf[-1]

    def test_kahan_with_bf16_params(self):
        opt = adamw_schedule_free_kahan(lr=0.05, weight_decay=0.0)
        losses, _ = quadratic_losses(opt, jnp.bfloat16, steps=300)
        assert losses[-1] < 0.05 * losses[0]


class TestQuantize8bit:
    """ops/quantize.py: the log-code storage behind moments='int8'."""

    def test_roundtrip_relative_error_bound(self):
        from sdxl_training_improvements_tpu.ops.quantize import (
            dequantize_8bit, quantize_8bit)
        # values spanning 7 decades, both signs
        mags = 10.0 ** jnp.linspace(-7, 0, 500)
        x = jnp.concatenate([mags, -mags]) * 3.7  # arbitrary scale
        y = dequantize_8bit(quantize_8bit(x, signed=True), signed=True,
                            dtype=jnp.float32)
        rel = np.abs(np.asarray(y) - np.asarray(x)) / np.abs(np.asarray(x))
        # log step over 8 decades with 127 signed codes: half-step ~ 7.5%
        assert rel.max() < 0.08, rel.max()

    def test_unsigned_has_finer_resolution(self):
        from sdxl_training_improvements_tpu.ops.quantize import (
            dequantize_8bit, quantize_8bit)
        x = 10.0 ** jnp.linspace(-7, 0, 500)
        y = dequantize_8bit(quantize_8bit(x, signed=False), signed=False,
                            dtype=jnp.float32)
        rel = np.abs(np.asarray(y) - np.asarray(x)) / np.asarray(x)
        assert rel.max() < 0.04, rel.max()

    def test_zeros_and_shape_and_dtype(self):
        from sdxl_training_improvements_tpu.ops.quantize import (
            dequantize_8bit, quantize_8bit, quantized_zeros)
        x = jnp.zeros((3, 5), jnp.bfloat16)
        qs = quantize_8bit(x)
        assert qs["q"].dtype == jnp.uint8 and qs["q"].shape == (3, 5)
        np.testing.assert_array_equal(
            np.asarray(dequantize_8bit(qs, dtype=jnp.float32)), 0.0)
        qz = quantized_zeros((3, 5))
        np.testing.assert_array_equal(np.asarray(qz["q"]),
                                      np.asarray(qs["q"]))

    def test_sign_preserved(self):
        from sdxl_training_improvements_tpu.ops.quantize import (
            dequantize_8bit, quantize_8bit)
        x = jnp.asarray([-1.0, -1e-4, 1e-4, 1.0], jnp.float32)
        y = np.asarray(dequantize_8bit(quantize_8bit(x), dtype=jnp.float32))
        assert (np.sign(y) == np.sign(np.asarray(x))).all()

    def test_jit_safe(self):
        from sdxl_training_improvements_tpu.ops.quantize import (
            dequantize_8bit, quantize_8bit)
        f = jax.jit(lambda x: dequantize_8bit(quantize_8bit(x),
                                              dtype=jnp.float32))
        x = jax.random.normal(jax.random.key(0), (64,))
        rel = np.abs(np.asarray(f(x) - x)) / np.abs(np.asarray(x))
        assert rel.max() < 0.08


class TestInt8Moments:
    def test_converges_on_quadratic(self):
        opt = adamw_bf16(lr=0.05, weight_decay=0.0, moments="int8")
        losses, _ = quadratic_losses(opt, jnp.bfloat16, steps=300)
        assert losses[-1] < 0.05 * losses[0]

    def test_state_is_8bit(self):
        opt = adamw_bf16(lr=0.01, moments="int8")
        params = {"w": jnp.ones((16, 16), jnp.bfloat16),
                  "scale": jnp.ones((16,), jnp.float32)}
        state = opt.init(params)
        assert state.exp_avg["w"]["q"].dtype == jnp.uint8
        assert state.exp_avg_sq["w"]["q"].dtype == jnp.uint8
        assert state.shift["w"].dtype == jnp.bfloat16  # SR carry stays exact
        assert state.exp_avg["scale"].dtype == jnp.float32  # f32 leaf exact
        g = jax.tree.map(jnp.ones_like, params)
        upd, state = jax.jit(opt.update)(g, state, params)
        assert state.exp_avg["w"]["q"].dtype == jnp.uint8
        assert np.isfinite(np.asarray(upd["w"], np.float32)).all()

    def test_tracks_bf16_moments_closely(self):
        """200 steps on a noisy quadratic: the int8-moment trajectory stays
        within a few percent of the bf16-moment trajectory (the 'quality
        study' gate for ROADMAP's 8-bit-moments lever)."""
        def run(moments):
            opt = adamw_bf16(lr=0.02, weight_decay=0.0, seed=3,
                             moments=moments)
            key = jax.random.key(0)
            w = jnp.full((64,), 2.0, jnp.bfloat16)
            state = opt.init({"w": w})
            import optax
            for i in range(200):
                g = (w.astype(jnp.float32)
                     + 0.1 * jax.random.normal(jax.random.fold_in(key, i),
                                               (64,))).astype(jnp.bfloat16)
                upd, state = jax.jit(opt.update)({"w": g}, state, {"w": w})
                w = optax.apply_updates({"w": w}, upd)["w"]
            return float(jnp.mean(w.astype(jnp.float32) ** 2))
        final_bf16 = run("bf16")
        final_int8 = run("int8")
        # both descend from w^2=4.0 by >99.7%; int8 stays within 2x of the
        # bf16 endpoint (measured 0.0049 vs 0.0036 on CPU)
        assert final_bf16 < 0.003 * 4.0
        assert final_int8 < 0.003 * 4.0
        assert final_int8 < 2.0 * final_bf16 + 1e-3

    def test_requires_per_leaf_layout(self):
        with pytest.raises(ValueError, match="per_leaf"):
            adamw_bf16(moments="int8", layout="flat")
        with pytest.raises(ValueError, match="moments"):
            adamw_bf16(moments="fp4")

    def test_shift_host_bit_identical_and_offloaded(self):
        """shift_host=True: the SR shift tree lives in pinned host memory
        and the update stream is BIT-identical to the resident path (same
        noise stream, same arithmetic — only the residency changes)."""
        import optax
        params = {"w": jnp.full((128,), 1.5, jnp.bfloat16),
                  "n": jnp.ones((4,), jnp.float32)}

        def run(shift_host):
            opt = adamw_bf16(lr=0.02, weight_decay=0.01, seed=7,
                             shift_host=shift_host)
            state = opt.init(params)
            p = params
            for i in range(5):
                g = jax.tree.map(
                    lambda x: (0.1 * (i + 1)
                               * jnp.ones_like(x)).astype(x.dtype), p)
                upd, state = jax.jit(opt.update)(g, state, p)
                p = optax.apply_updates(p, upd)
            return p, state

        p_host, st_host = run(True)
        p_res, _ = run(False)
        # NOTE: the forced multi-CPU test backend drops memory-kind
        # annotations inside jit (no annotate_device_placement
        # registration), so post-update host residency is asserted on real
        # hardware (tests/test_tpu_smoke.py); here we pin the INIT placement
        # (eager device_put works on CPU) and the bit-exact numerics.
        init_state = adamw_bf16(lr=0.02, seed=7, shift_host=True).init(
            {"w": jnp.zeros((8,), jnp.bfloat16)})
        assert init_state.shift["w"].sharding.memory_kind == "pinned_host"
        np.testing.assert_array_equal(np.asarray(p_host["w"], np.float32),
                                      np.asarray(p_res["w"], np.float32))
        np.testing.assert_array_equal(np.asarray(p_host["n"]),
                                      np.asarray(p_res["n"]))

    def test_shift_host_with_int8_moments(self):
        """The 16 GB single-program combination: int8 moments + host shift
        still converges and keeps its layouts."""
        opt = adamw_bf16(lr=0.05, weight_decay=0.0, moments="int8",
                         shift_host=True)
        losses, _ = quadratic_losses(opt, jnp.bfloat16, steps=300)
        assert losses[-1] < 0.05 * losses[0]
        state = opt.init({"w": jnp.zeros((8,), jnp.bfloat16)})
        assert state.exp_avg["w"]["q"].dtype == jnp.uint8
        assert state.shift["w"].sharding.memory_kind == "pinned_host"

    def test_shift_host_requires_per_leaf(self):
        with pytest.raises(ValueError, match="per_leaf"):
            adamw_bf16(shift_host=True, layout="stacked")

    def test_moments_host_requires_per_leaf(self):
        with pytest.raises(ValueError, match="per_leaf"):
            adamw_bf16(moments_host=True, layout="flat")

    def test_streaming_bit_identical_to_resident(self):
        """shift_host + moments_host (the single-program 16 GB memory
        plan) must be a pure placement/scheduling change: with a group
        budget small enough to force several optimization_barrier groups,
        5 steps produce bit-identical params vs the all-resident path."""
        def tree():
            ks = jax.random.split(jax.random.key(0), 5)
            return {
                "a": jax.random.normal(ks[0], (1024, 257), jnp.bfloat16),
                "b": jax.random.normal(ks[1], (999,), jnp.bfloat16),
                "norm": jax.random.normal(ks[2], (64,), jnp.float32),
                "c": jax.random.normal(ks[3], (512, 130), jnp.bfloat16),
                "d": jax.random.normal(ks[4], (7, 7, 33), jnp.bfloat16),
            }

        def run(**kw):
            opt = adamw_bf16(lr=1e-3, weight_decay=0.01, moments="int8",
                             stream_group_params=1 << 16, **kw)
            p = tree()
            s = opt.init(p)

            @jax.jit
            def step(p, s, i):
                g = jax.tree.map(
                    lambda x: (0.01 * jnp.sin(x.astype(jnp.float32)
                                              + i)).astype(x.dtype), p)
                u, s2 = opt.update(g, s, p)
                return optax.apply_updates(p, u), s2

            for i in range(5):
                p, s = step(p, s, float(i))
            return p

        p0 = run()
        p1 = run(shift_host=True, moments_host=True)
        chex.assert_trees_all_equal(p0, p1)

    def test_code_tables_all_distinct(self):
        """Every one of the 256 codes is a distinct value on both maps
        (a duplicated endpoint would silently waste a code slot)."""
        from sdxl_training_improvements_tpu.ops.quantize import _code_np
        for signed in (True, False):
            c = _code_np(signed)
            assert len(np.unique(c)) == 256, signed

    def test_nonfinite_element_stays_confined(self):
        """An inf/NaN element must not poison the shared per-leaf scale:
        like bf16 moments, corruption stays on the offending element and
        dequantizes bounded (reviewer finding, round 3)."""
        from sdxl_training_improvements_tpu.ops.quantize import (
            dequantize_8bit, quantize_8bit)
        for bad in (float("inf"), float("-inf"), float("nan")):
            x = jnp.array([bad, 1.0, -0.5, 1e-6], jnp.float32)
            d = np.asarray(dequantize_8bit(quantize_8bit(x),
                                           dtype=jnp.float32))
            assert np.isfinite(d).all(), (bad, d)
            # healthy elements keep their values (signed map half-step 7.5%)
            assert abs(d[1] - 1.0) < 0.08 and abs(d[2] + 0.5) < 0.05
            # the bad element is bounded by +-absmax of the finite elements
            assert abs(d[0]) <= 1.0 + 1e-6

    def test_config_knob(self):
        cfg = Config()
        cfg.optimizer.optimizer_type = "adamw_bf16"
        cfg.optimizer.moments_8bit = True
        opt = make_optimizer(cfg)
        state = opt.init({"w": jnp.ones((8, 8), jnp.bfloat16)})
        dtypes = {str(l.dtype) for l in jax.tree.leaves(state)
                  if hasattr(l, "dtype")}
        assert "uint8" in dtypes, dtypes

    def test_mesh_sharded_int8_step(self):
        """Quantized moments inherit the param's TP/fsdp spec (the uint8
        codes have the param's own shape and path-prefix; the fp32 scale
        replicates as a scalar)."""
        import optax
        from jax.sharding import NamedSharding, PartitionSpec as P
        from sdxl_training_improvements_tpu.parallel import mesh as M
        from sdxl_training_improvements_tpu.training.trainer import (
            TrainState, create_train_state, shard_train_state)
        mesh = M.create_mesh([2, 2, 2])
        opt = adamw_bf16(lr=0.01, moments="int8")
        params = {"blk": {"attn1": {"to_q": {"kernel":
                                             jnp.ones((16, 16),
                                                      jnp.bfloat16)}}}}
        state = create_train_state(params, opt, seed=0)
        state = shard_train_state(state, mesh, shard_params=True)
        q = state.opt_state.exp_avg["blk"]["attn1"]["to_q"]["kernel"]["q"]
        assert not q.sharding.is_fully_replicated  # TP rule applied
        s = state.opt_state.exp_avg["blk"]["attn1"]["to_q"]["kernel"]["s"]
        assert s.sharding.is_fully_replicated

        @jax.jit
        def step(state, g):
            upd, opt_state = opt.update(g, state.opt_state, state.params)
            return TrainState(step=state.step + 1,
                              params=optax.apply_updates(state.params, upd),
                              opt_state=opt_state, rng=state.rng)

        g = jax.device_put(
            jax.tree.map(jnp.ones_like, params),
            jax.tree.map(lambda _: NamedSharding(mesh, P()), params))
        for _ in range(2):
            state = step(state, g)
        leaf = state.params["blk"]["attn1"]["to_q"]["kernel"]
        assert np.isfinite(np.asarray(leaf, np.float32)).all()


class TestSOAP:
    def test_first_step_no_update(self):
        opt = soap(lr=0.1)
        params = {"w": jnp.ones((4, 4), jnp.float32)}
        state = opt.init(params)
        g = {"w": jnp.ones((4, 4), jnp.float32)}
        upd, state = opt.update(g, state, params)
        np.testing.assert_array_equal(np.asarray(upd["w"]), 0.0)
        # preconditioner installed
        assert float(jnp.abs(state.gg["w"][0]).max()) > 0

    def test_converges_on_quadratic(self):
        opt = soap(lr=0.05, weight_decay=0.0, precondition_frequency=5,
                   precondition_1d=True)
        losses, _ = quadratic_losses(opt, jnp.float32, steps=300)
        assert losses[-1] < 0.01 * losses[0]

    def test_matrix_param_preconditioners(self):
        opt = soap(lr=0.01)
        params = {"w": jnp.ones((8, 16), jnp.float32)}
        state = opt.init(params)
        assert state.gg["w"][0].shape == (8, 8)
        assert state.gg["w"][1].shape == (16, 16)

    def test_large_dim_skipped(self):
        opt = soap(lr=0.01, max_precond_dim=10)
        params = {"w": jnp.ones((8, 100), jnp.float32)}
        state = opt.init(params)
        assert state.gg["w"][0].shape == (8, 8)
        assert state.gg["w"][1].shape == (0, 0)
        # still steps fine
        g = {"w": jnp.ones((8, 100), jnp.float32)}
        for _ in range(3):
            upd, state = opt.update(g, state, params)
        assert np.isfinite(np.asarray(upd["w"])).all()

    def test_merge_dims(self):
        opt = soap(lr=0.01, merge_dims=True, max_precond_dim=50)
        params = {"w": jnp.ones((3, 3, 4, 8), jnp.float32)}  # conv kernel
        state = opt.init(params)
        # 3*3*4=36 <=50 merges; 36*8 > 50 -> (36, 8)
        shapes = tuple(m.shape[0] for m in state.gg["w"])
        assert shapes == (36, 8)
        g = {"w": jnp.ones((3, 3, 4, 8), jnp.float32)}
        for _ in range(3):
            upd, state = opt.update(g, state, params)
        assert upd["w"].shape == (3, 3, 4, 8)

    def test_qr_refresh_runs(self):
        opt = soap(lr=0.05, precondition_frequency=2, weight_decay=0.0)
        params = {"w": jnp.ones((4, 4), jnp.float32)}
        state = opt.init(params)
        key = jax.random.key(0)
        import optax
        for i in range(6):
            key, k = jax.random.split(key)
            g = {"w": jax.random.normal(k, (4, 4))}
            upd, state = opt.update(g, state, params)
            params = optax.apply_updates(params, upd)
        q = state.q["w"][0]
        # Q orthogonal
        np.testing.assert_allclose(np.asarray(q.T @ q), np.eye(4), atol=1e-4)

    def test_stacked_matches_unrolled(self):
        """stack_leaves (vmapped same-shape groups, the compile-scalable
        default) must reproduce the unrolled per-leaf program exactly —
        across install, plain, and QR-refresh steps, with merge_dims and a
        skipped large axis in the mix."""
        import optax
        kw = dict(lr=0.03, weight_decay=0.01, precondition_frequency=3,
                  merge_dims=True, max_precond_dim=24)
        opt_s = soap(stack_leaves=True, **kw)
        opt_u = soap(stack_leaves=False, **kw)
        key = jax.random.key(7)
        params = {
            "a": jax.random.normal(jax.random.fold_in(key, 1), (8, 8)),
            "b": jax.random.normal(jax.random.fold_in(key, 2), (8, 8)),
            "c": jax.random.normal(jax.random.fold_in(key, 3), (8, 8)),
            "conv": jax.random.normal(jax.random.fold_in(key, 4), (3, 3, 2, 5)),
            "wide": jax.random.normal(jax.random.fold_in(key, 5), (4, 100)),
            "bias": jax.random.normal(jax.random.fold_in(key, 6), (8,)),
        }
        ps, pu = params, params
        ss, su = opt_s.init(params), opt_u.init(params)
        for i in range(7):  # covers refresh steps at 3 and 6
            g = {k: jax.random.normal(
                jax.random.fold_in(key, 100 + 10 * i + n), p.shape)
                for n, (k, p) in enumerate(params.items())}
            us_, ss = jax.jit(opt_s.update)(g, ss, ps)
            uu_, su = jax.jit(opt_u.update)(g, su, pu)
            ps = optax.apply_updates(ps, us_)
            pu = optax.apply_updates(pu, uu_)
        for k in params:
            np.testing.assert_array_equal(np.asarray(ps[k]), np.asarray(pu[k]),
                                          err_msg=k)
        for k in params:
            for m_s, m_u in zip(ss.q[k], su.q[k]):
                np.testing.assert_array_equal(np.asarray(m_s), np.asarray(m_u))

    def test_mesh_sharded_soap_step(self):
        """SOAP state placement under a model-sharded mesh (round-2 verdict
        weak #3): exp_avg shards like its param; exp_avg_sq/gg/q replicate
        deliberately (trainer.shard_train_state); a sharded update step and
        a QR-refresh step both execute."""
        import optax
        from jax.sharding import NamedSharding, PartitionSpec as P
        from sdxl_training_improvements_tpu.parallel import mesh as M
        from sdxl_training_improvements_tpu.training.trainer import (
            TrainState, create_train_state, shard_train_state)
        mesh = M.create_mesh([2, 2, 2])
        opt = soap(lr=0.01, precondition_frequency=2, merge_dims=True,
                   max_precond_dim=64)
        params = {"blk": {"attn1": {"to_q": {"kernel":
                                             jnp.ones((16, 16),
                                                      jnp.float32)}},
                          "conv1": {"kernel":
                                    jnp.ones((3, 3, 8, 16), jnp.float32)}}}
        state = create_train_state(params, opt, seed=0)
        state = shard_train_state(state, mesh, shard_params=True)
        # gg/q factors replicated; exp_avg sharded like the TP'd param
        gg0 = state.opt_state.gg["blk"]["attn1"]["to_q"]["kernel"][0]
        assert gg0.sharding.is_fully_replicated
        ea = state.opt_state.exp_avg["blk"]["attn1"]["to_q"]["kernel"]
        assert not ea.sharding.is_fully_replicated  # TP rule applied

        @jax.jit
        def step(state, g):
            upd, opt_state = opt.update(g, state.opt_state, state.params)
            return TrainState(step=state.step + 1,
                              params=optax.apply_updates(state.params, upd),
                              opt_state=opt_state, rng=state.rng)

        g = jax.device_put(
            jax.tree.map(jnp.ones_like, params),
            jax.tree.map(lambda _: NamedSharding(mesh, P()), params))
        for _ in range(3):  # covers install, plain, and refresh steps
            state = step(state, g)
        leaf = state.params["blk"]["conv1"]["kernel"]
        assert np.isfinite(np.asarray(jax.device_get(leaf))).all()


class TestRegistry:
    @pytest.mark.parametrize("kind", ["adamw_bf16", "adamw_schedule_free_kahan",
                                      "soap", "adamw"])
    def test_make_optimizer(self, kind):
        cfg = Config()
        cfg.optimizer.optimizer_type = kind
        opt = make_optimizer(cfg)
        dtype = jnp.bfloat16 if kind == "adamw_bf16" else jnp.float32
        params = {"w": jnp.zeros((4,), dtype)}
        state = opt.init(params)
        upd, _ = opt.update({"w": jnp.ones((4,), dtype)}, state, params)
        assert upd["w"].shape == (4,)

    def test_unknown_type(self):
        cfg = Config()
        cfg.optimizer.optimizer_type = "bogus"
        with pytest.raises(ValueError, match="Unsupported optimizer"):
            make_optimizer(cfg)


class TestEMA:
    def _setup(self):
        import optax
        from sdxl_training_improvements_tpu.training.optimizers import (
            with_ema)
        params = {"w": jnp.ones((4,), jnp.float32)}
        opt = with_ema(optax.sgd(0.1), decay=0.5, warmup=False)
        return opt, params

    def test_init_never_aliases_fp32_params(self):
        """astype(fp32) on fp32 params returns the SAME buffer; an EMA
        state aliasing the params breaks train-state donation
        (XLA rejects `f(donate(a), a)`) — regression for the multichip
        dryrun matrix failure."""
        opt, params = self._setup()
        state = opt.init(params)  # params are fp32 in _setup
        assert state.ema["w"] is not params["w"]
        # and donation of (params, opt_state) together must compile
        import optax

        def step(p, s):
            g = jax.tree.map(jnp.ones_like, p)
            u, s2 = opt.update(g, s, p)
            return optax.apply_updates(p, u), s2

        p2, s2 = jax.jit(step, donate_argnums=(0, 1))(params, state)
        assert np.isfinite(np.asarray(p2["w"])).all()

    def test_tracks_average(self):
        opt, params = self._setup()
        state = opt.init(params)
        np.testing.assert_allclose(np.asarray(state.ema["w"]), 1.0)
        grads = {"w": jnp.ones((4,), jnp.float32)}
        for _ in range(3):
            updates, state = opt.update(grads, state, params)
            import optax
            params = optax.apply_updates(params, updates)
        # sgd(0.1): params 1.0 -> 0.9 -> 0.8 -> 0.7
        np.testing.assert_allclose(np.asarray(params["w"]), 0.7, rtol=1e-6)
        # ema with d=0.5: 1 -> .95 -> .875 -> .7875
        np.testing.assert_allclose(np.asarray(state.ema["w"]), 0.7875,
                                   rtol=1e-6)

    def test_eval_params_and_unwrap(self):
        from sdxl_training_improvements_tpu.training.optimizers import (
            ema_eval_params, unwrap_ema)
        opt, params = self._setup()
        state = opt.init(params)
        out = ema_eval_params(state, {"w": jnp.zeros((4,), jnp.bfloat16)})
        assert out["w"].dtype == jnp.bfloat16
        assert unwrap_ema(state) is state.inner
        # non-EMA state falls through
        assert ema_eval_params("not-ema", params) is params

    def test_config_wiring(self):
        from sdxl_training_improvements_tpu.config import Config
        from sdxl_training_improvements_tpu.training.optimizers import (
            EMAState, make_optimizer)
        cfg = Config()
        cfg.optimizer.optimizer_type = "adamw_bf16"
        cfg.training.ema_decay = 0.999
        opt = make_optimizer(cfg)
        params = {"w": jnp.ones((4,), jnp.bfloat16)}
        state = opt.init(params)
        assert isinstance(state, EMAState)
        g = {"w": jnp.full((4,), 0.01, jnp.bfloat16)}
        updates, state2 = opt.update(g, state, params)
        assert state2.ema["w"].dtype == jnp.float32
        assert int(state2.count) == 1
        # off by default
        cfg.training.ema_decay = None
        assert not isinstance(make_optimizer(cfg).init(params), EMAState)

    def test_schedule_free_composition_rejected(self):
        """EMA over the schedule-free y iterate is ill-defined (the x
        sequence IS the averaged model) — make_optimizer refuses loudly
        instead of shipping ambiguous export weights."""
        from sdxl_training_improvements_tpu.config import Config
        from sdxl_training_improvements_tpu.training.optimizers import (
            make_optimizer)
        cfg = Config()
        cfg.optimizer.optimizer_type = "adamw_schedule_free_kahan"
        cfg.training.ema_decay = 0.999
        with pytest.raises(ValueError, match="schedule-free"):
            make_optimizer(cfg)
        # schedule-free without EMA still builds and recovers eval params
        cfg.training.ema_decay = None
        from sdxl_training_improvements_tpu.training.optimizers import (
            schedule_free_eval_params)
        opt = make_optimizer(cfg)
        params = {"w": jnp.ones((4,), jnp.float32)}
        state = opt.init(params)
        import optax
        upd, state = opt.update({"w": jnp.full((4,), 0.1, jnp.float32)},
                                state, params)
        params = optax.apply_updates(params, upd)
        evalp = schedule_free_eval_params(state, params)
        assert evalp["w"].shape == (4,)
        assert bool(jnp.isfinite(evalp["w"]).all())

    def test_trainer_eval_params_prefers_ema(self, tmp_path):
        from sdxl_training_improvements_tpu.config import Config
        from sdxl_training_improvements_tpu.models.sdxl import SDXLModel
        from sdxl_training_improvements_tpu.training.loop import SDXLTrainer
        cfg = Config()
        cfg.model.model_type = "sdxl_tiny"
        cfg.model.pretrained_model_name = "/nonexistent"
        cfg.training.mixed_precision = "no"
        cfg.training.ema_decay = 0.9
        cfg.tpu.donate_state = False
        cfg.global_config.logging.log_dir = str(tmp_path)
        model = SDXLModel.create(tiny=True, dtype=jnp.float32,
                                 init_rng=jax.random.key(0))
        tr = SDXLTrainer(cfg, model=model, output_dir=str(tmp_path),
                         use_mesh=False)
        ucfg = model.unet_config
        batch = {
            "vae_latents": jax.random.normal(jax.random.key(1),
                                             (4, 4, 16, 16)),
            "prompt_embeds": jnp.zeros((4, 77, ucfg.cross_attention_dim)),
            "pooled_prompt_embeds": jnp.zeros((4, ucfg.pooled_embed_dim)),
            "time_ids": jnp.zeros((4, 6)),
        }
        tr.state, _ = tr.train_step(tr.state, batch)
        ev = tr.eval_params()
        # EMA after 1 warmupless... warmup ramp: d=min(0.9, 2/11) small ->
        # ema closer to new params than old; just check it differs from
        # both raw trees and has param dtypes
        leaves_ev = jax.tree_util.tree_leaves(ev)
        leaves_p = jax.tree_util.tree_leaves(tr.state.params)
        assert leaves_ev[0].dtype == leaves_p[0].dtype
        assert not all(
            np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(leaves_ev, leaves_p))


class TestAdamWBF16Stacked:
    """Stacked layout: same-shape leaves stacked on a new leading axis —
    kernel-count reduction without the flat layout's relayout penalty,
    and per-leaf decay phases preserved exactly."""

    def _tree(self):
        return {
            "a": jnp.ones((8, 4), jnp.bfloat16),
            "b": jnp.full((8, 4), 0.5, jnp.bfloat16),   # same shape as a
            "c": jnp.full((16,), -0.25, jnp.bfloat16),
            "s": jnp.ones((4,), jnp.float32),
        }

    def test_state_layout(self):
        opt = adamw_bf16(lr=0.1, layout="stacked")
        state = opt.init(self._tree())
        stacks = {k: v for k, v in state.exp_avg.items()
                  if k.startswith("stack_")}
        shapes = sorted(tuple(v.shape) for v in stacks.values())
        assert shapes == [(1, 16), (2, 8, 4)]  # a+b stacked, c alone
        assert "leaf_3" in state.exp_avg  # the f32 leaf, per-leaf
        for k, v in state.accumulated_decay.items():
            assert v.ndim == 1  # per-leaf phase vector

    def test_single_step_matches_per_leaf_within_sr_ulp(self):
        import optax
        tree = self._tree()
        g = jax.tree.map(lambda p: jnp.full(p.shape, 0.1, p.dtype), tree)
        results = {}
        for name, opt in [
                ("leaf", adamw_bf16(lr=0.05, seed=0)),
                ("stacked", adamw_bf16(lr=0.05, seed=0, layout="stacked"))]:
            state = opt.init(tree)
            upd, _ = opt.update(g, state, tree)
            results[name] = optax.apply_updates(tree, upd)
        for x, y in zip(jax.tree.leaves(results["leaf"]),
                        jax.tree.leaves(results["stacked"])):
            np.testing.assert_allclose(
                np.asarray(x, np.float32), np.asarray(y, np.float32),
                atol=2e-2)

    @pytest.mark.parametrize("noise", ["hash", "rbg"])
    def test_converges_on_quadratic(self, noise):
        opt = adamw_bf16(lr=0.05, seed=0, layout="stacked", noise=noise)
        losses, _ = quadratic_losses(opt, jnp.bfloat16, steps=300)
        assert losses[-1] < 0.01 * losses[0]

    def test_weight_decay_fires_per_leaf_phase(self):
        import optax
        opt = adamw_bf16(lr=0.1, weight_decay=0.5, seed=1, layout="stacked")
        params = {"w": jnp.full((16,), 1.0, jnp.bfloat16),
                  "w2": jnp.full((16,), 1.0, jnp.bfloat16)}
        state = opt.init(params)
        for _ in range(40):
            g = jax.tree.map(jnp.zeros_like, params)
            upd, state = opt.update(g, state, params)
            params = optax.apply_updates(params, upd)
        assert float(jnp.mean(params["w"].astype(jnp.float32))) < 0.9
        assert float(jnp.mean(params["w2"].astype(jnp.float32))) < 0.9

    def test_bad_layout_rejected(self):
        with pytest.raises(ValueError, match="layout"):
            adamw_bf16(layout="bogus")


class TestAdamWBF16Hybrid:
    """Hybrid layout: bf16 leaves below the threshold pack into one flat
    buffer, big leaves stay per-leaf — the flat layout's kernel-count win
    without relayouting the big tiled tensors."""

    def _tree(self):
        return {
            "big": jnp.ones((64, 8), jnp.bfloat16),      # >= threshold
            "small1": jnp.full((8,), 0.5, jnp.bfloat16),
            "small2": jnp.full((4, 2), -0.25, jnp.bfloat16),
            "s": jnp.ones((4,), jnp.float32),
        }

    def test_state_layout(self):
        opt = adamw_bf16(lr=0.1, layout="hybrid", hybrid_threshold=64)
        state = opt.init(self._tree())
        # one flat group holding small1+small2 (8 + 8 = 16 elements)
        assert state.exp_avg["flat_0"].shape == (16,)
        assert state.exp_avg["flat_0"].dtype == jnp.bfloat16
        # big leaf per-leaf (index 0 in sorted-dict flatten order)
        assert state.exp_avg["leaf_0"].shape == (64, 8)
        # f32 leaf per-leaf with no shift/decay participation
        assert state.exp_avg["leaf_1"].dtype == jnp.float32
        assert set(state.accumulated_decay) == {"flat_0", "leaf_0"}

    def test_single_step_matches_per_leaf_within_sr_ulp(self):
        import optax
        tree = self._tree()
        g = jax.tree.map(lambda p: jnp.full(p.shape, 0.1, p.dtype), tree)
        results = {}
        for name, opt in [
                ("leaf", adamw_bf16(lr=0.05, seed=0)),
                ("hybrid", adamw_bf16(lr=0.05, seed=0, layout="hybrid",
                                      hybrid_threshold=64))]:
            state = opt.init(tree)
            upd, _ = opt.update(g, state, tree)
            results[name] = optax.apply_updates(tree, upd)
        for x, y in zip(jax.tree.leaves(results["leaf"]),
                        jax.tree.leaves(results["hybrid"])):
            np.testing.assert_allclose(
                np.asarray(x, np.float32), np.asarray(y, np.float32),
                atol=2e-2)

    @pytest.mark.parametrize("noise", ["hash", "rbg"])
    def test_converges_on_quadratic(self, noise):
        opt = adamw_bf16(lr=0.05, seed=0, layout="hybrid",
                         hybrid_threshold=8, noise=noise)
        losses, _ = quadratic_losses(opt, jnp.bfloat16, steps=300)
        assert losses[-1] < 0.01 * losses[0]

    def test_all_small_and_all_big_edge_cases(self):
        import optax
        # every leaf below threshold -> single flat group, no big leaves
        small = {"a": jnp.ones((4,), jnp.bfloat16),
                 "b": jnp.ones((2, 2), jnp.bfloat16)}
        opt = adamw_bf16(lr=0.1, layout="hybrid", hybrid_threshold=1 << 10)
        st = opt.init(small)
        assert set(st.exp_avg) == {"flat_0"}
        upd, _ = opt.update(jax.tree.map(jnp.ones_like, small), st, small)
        assert jax.tree.structure(upd) == jax.tree.structure(small)
        # every leaf above threshold -> pure per-leaf, no flat group
        opt2 = adamw_bf16(lr=0.1, layout="hybrid", hybrid_threshold=1)
        st2 = opt2.init(small)
        assert not any(k.startswith("flat_") for k in st2.exp_avg)
        upd2, _ = opt2.update(jax.tree.map(jnp.ones_like, small), st2, small)
        assert jax.tree.structure(upd2) == jax.tree.structure(small)


class TestSRNoiseKnob:
    def test_config_validates(self):
        cfg = Config()
        assert cfg.tpu.sr_noise == "hash"  # measured default
        with pytest.raises(ValueError, match="sr_noise"):
            Config.from_dict({"tpu": {"sr_noise": "bogus"}})

    def test_threads_into_make_optimizer(self):
        cfg = Config()
        cfg.optimizer.optimizer_type = "adamw_bf16"
        for noise in ("hash", "rbg"):
            cfg.tpu.sr_noise = noise
            opt = make_optimizer(cfg)
            import optax
            p = {"w": jnp.full((64,), 1.0, jnp.bfloat16)}
            st = opt.init(p)
            upd, _ = opt.update({"w": jnp.full((64,), 0.1, jnp.bfloat16)},
                                st, p)
            assert np.isfinite(np.asarray(upd["w"], np.float32)).all()
