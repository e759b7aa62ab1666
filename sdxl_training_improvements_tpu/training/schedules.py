"""Noise-schedule numerics as pure JAX transforms.

Re-implements (TPU-first, jit-friendly: no data-dependent control flow, all
static shapes) the reference's NovelAI-V3 scheduler semantics
(``src/training/schedulers/novelai_v3.py``) and the flow-matching numerics
(``src/training/trainers/methods/flow_matching_trainer.py:373-419``):

* Karras sigma ramp (``novelai_v3.py:160-184``), with the ZTSNR override to
  sigma_max=20000 (``:101-109``).
* ``add_noise`` = x + sigma*eps with the ZTSNR +-20000 clamp (``:111-120``).
* the reference's (nonstandard) ``get_velocity`` = (eps - x)/sigma
  (``:122-127``) and ``get_snr`` = (sigma_data/sigma)^2 (``:129-132``) —
  reproduced deliberately for loss parity.
* Karras boundary scalings c_skip/c_out/c_in (``:59-70``).
* MinSNR weighting mse*min(snr, gamma) (``ddpm_trainer.py:335-345``).
* logit-normal time sampling sigmoid(mu + std*N(0,1)) and the optimal
  transport path xt=(1-t)x0+t*x1 with target v=x1-x0.
* timestep-bias sampling weights (``models/sdxl.py:99-157``).
* SDXL additional time-ids (``novelai_v3.py:209-235``).

Everything here is a pure function of explicit PRNG keys and precomputed
schedule arrays — the schedule is built once on host (``NoiseSchedule.create``)
and closed over by the jitted train step.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

ZTSNR_SIGMA_MAX = 20000.0


# --------------------------------------------------------------------------
# Karras schedule
# --------------------------------------------------------------------------

def karras_sigmas(n_sigmas: int, sigma_min: float, sigma_max: float,
                  rho: float = 7.0, dtype=jnp.float32) -> jnp.ndarray:
    """Karras et al. (2022) sigma ramp, descending from sigma_max to sigma_min.

    Matches reference ``get_karras_sigmas`` (``novelai_v3.py:160-184``):
    ``((max^(1/rho) + ramp*(min^(1/rho) - max^(1/rho)))^rho`` over a linspace
    ramp in [0, 1].
    """
    ramp = jnp.linspace(0.0, 1.0, n_sigmas, dtype=jnp.float64 if dtype == jnp.float64 else jnp.float32)
    min_inv_rho = sigma_min ** (1.0 / rho)
    max_inv_rho = sigma_max ** (1.0 / rho)
    sigmas = (max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** rho
    return sigmas.astype(dtype)


def karras_scalings(sigma: jnp.ndarray, sigma_data: float = 1.0
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Boundary-condition scalings (c_skip, c_out, c_in) — ``novelai_v3.py:59-64``."""
    var = sigma ** 2 + sigma_data ** 2
    c_skip = (sigma_data ** 2) / var
    c_out = -sigma * sigma_data * jax.lax.rsqrt(var)
    c_in = jax.lax.rsqrt(var)
    return c_skip, c_out, c_in


def infinite_karras_scalings(sigma_data: float = 1.0) -> Tuple[float, float]:
    """sigma->inf limit: c_skip=0, c_out=-sigma_data (``novelai_v3.py:66-70``)."""
    return 0.0, -sigma_data


# --------------------------------------------------------------------------
# Schedule container
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class NoiseSchedule:
    """Precomputed training schedule closed over by the jitted step.

    ``sigmas[t]`` is indexed directly by integer timesteps, exactly like the
    reference's ``timestep_to_sigma`` (``novelai_v3.py:134-137``) which indexes
    the descending Karras ramp — so t=0 is the *highest* sigma.
    """

    sigmas: jnp.ndarray  # [num_timesteps], descending
    num_timesteps: int
    sigma_data: float
    use_ztsnr: bool
    prediction_type: str  # "epsilon" | "v_prediction"
    min_snr_gamma: Optional[float]
    rho: float = 7.0  # retained so inference ramps match training ramps

    @classmethod
    def create(cls, *, num_timesteps: int = 1000, sigma_min: float = 0.002,
               sigma_max: float = 20000.0, rho: float = 7.0,
               use_ztsnr: bool = True, sigma_data: float = 1.0,
               prediction_type: str = "v_prediction",
               min_snr_gamma: Optional[float] = 5.0) -> "NoiseSchedule":
        eff_sigma_max = ZTSNR_SIGMA_MAX if use_ztsnr else sigma_max
        sigmas = karras_sigmas(num_timesteps, sigma_min, eff_sigma_max, rho)
        return cls(sigmas=sigmas, num_timesteps=num_timesteps,
                   sigma_data=sigma_data, use_ztsnr=use_ztsnr,
                   prediction_type=prediction_type,
                   min_snr_gamma=min_snr_gamma, rho=rho)

    @classmethod
    def from_config(cls, config) -> "NoiseSchedule":
        m = config.model
        return cls.create(num_timesteps=m.num_timesteps, sigma_min=m.sigma_min,
                          sigma_max=m.sigma_max, rho=m.rho, use_ztsnr=m.use_ztsnr,
                          prediction_type=config.training.prediction_type,
                          min_snr_gamma=m.min_snr_gamma)

    # ------------------------------------------------------------- pure ops
    def timestep_to_sigma(self, timesteps: jnp.ndarray) -> jnp.ndarray:
        return self.sigmas[timesteps]

    def sample_timesteps(self, key: jax.Array, batch_size: int,
                         weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Uniform integer timesteps, optionally biased by ``weights``.

        The reference samples uniformly either way (``novelai_v3.py:139-151``);
        ``weights`` supports the timestep-bias strategies of
        ``models/sdxl.py:99-157`` via categorical sampling.
        """
        if weights is None:
            return jax.random.randint(key, (batch_size,), 0, self.num_timesteps)
        logits = jnp.log(weights)
        return jax.random.categorical(key, logits, shape=(batch_size,))

    def add_noise(self, sample: jnp.ndarray, noise: jnp.ndarray,
                  timesteps: jnp.ndarray) -> jnp.ndarray:
        """x + sigma*eps, clamped to +-20000 under ZTSNR (``novelai_v3.py:111-120``)."""
        sigma = _bcast(self.timestep_to_sigma(timesteps), sample)
        noisy = sample + sigma * noise.astype(sigma.dtype)
        if self.use_ztsnr:
            noisy = jnp.clip(noisy, -ZTSNR_SIGMA_MAX, ZTSNR_SIGMA_MAX)
        return noisy

    def get_velocity(self, sample: jnp.ndarray, noise: jnp.ndarray,
                     timesteps: jnp.ndarray) -> jnp.ndarray:
        """Reference's v-target: (eps - x)/sigma (``novelai_v3.py:122-127``)."""
        sigma = _bcast(self.timestep_to_sigma(timesteps), sample)
        return (noise.astype(sigma.dtype) - sample) / sigma

    def get_snr(self, timesteps: jnp.ndarray) -> jnp.ndarray:
        """(sigma_data/sigma)^2 (``novelai_v3.py:129-132``)."""
        sigma = self.timestep_to_sigma(timesteps)
        return (self.sigma_data / sigma) ** 2

    def min_snr_weight(self, timesteps: jnp.ndarray) -> jnp.ndarray:
        """min(snr, gamma) per MinSNR (``ddpm_trainer.py:335-345``); ones if off."""
        if self.min_snr_gamma is None:
            return jnp.ones(timesteps.shape, dtype=jnp.float32)
        snr = self.get_snr(timesteps)
        return jnp.minimum(snr, jnp.float32(self.min_snr_gamma))


def _bcast(per_example: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    """Reshape [B] to [B, 1, 1, ...] to broadcast against ``like``."""
    shape = (per_example.shape[0],) + (1,) * (like.ndim - 1)
    return per_example.reshape(shape).astype(jnp.float32)


# --------------------------------------------------------------------------
# Flow matching numerics
# --------------------------------------------------------------------------

def sample_logit_normal(key: jax.Array, shape, mean: float = 0.0,
                        std: float = 1.0, dtype=jnp.float32) -> jnp.ndarray:
    """sigmoid(mean + std*N(0,1)) (``flow_matching_trainer.py:373-385``)."""
    normal = mean + std * jax.random.normal(key, shape, dtype=dtype)
    return jax.nn.sigmoid(normal)


def optimal_transport_path(x0: jnp.ndarray, x1: jnp.ndarray,
                           t: jnp.ndarray) -> jnp.ndarray:
    """(1-t)x0 + t*x1 with t broadcast per-example (``:387-390``)."""
    tb = _bcast(t, x0).astype(x0.dtype)
    return (1.0 - tb) * x0 + tb * x1


def flow_matching_target(x0: jnp.ndarray, x1: jnp.ndarray) -> jnp.ndarray:
    """Straight-path velocity target v = x1 - x0 (``:417``)."""
    return x1 - x0


# --------------------------------------------------------------------------
# Timestep bias weights
# --------------------------------------------------------------------------

def generate_timestep_weights(num_timesteps: int, bias_strategy: str = "none",
                              bias_portion: float = 0.25,
                              bias_multiplier: float = 2.0,
                              bias_begin: Optional[int] = None,
                              bias_end: Optional[int] = None) -> jnp.ndarray:
    """Normalized sampling weights over timesteps (``models/sdxl.py:99-157``)."""
    weights = jnp.ones((num_timesteps,), dtype=jnp.float32)
    if bias_strategy == "none":
        return weights / weights.sum()
    if bias_multiplier <= 0:
        raise ValueError("Timestep bias multiplier must be positive; use "
                         "bias_strategy='none' to disable biasing.")
    num_to_bias = int(bias_portion * num_timesteps)
    idx = jnp.arange(num_timesteps)
    if bias_strategy == "later":
        mask = idx >= num_timesteps - num_to_bias
    elif bias_strategy == "earlier":
        mask = idx < num_to_bias
    elif bias_strategy == "range":
        if bias_begin is None or bias_end is None:
            raise ValueError("bias_begin and bias_end must be specified for range strategy")
        if bias_begin < 0 or bias_end > num_timesteps:
            raise ValueError(f"Bias range must be within [0, {num_timesteps}], "
                             f"got [{bias_begin}, {bias_end}]")
        mask = (idx >= bias_begin) & (idx < bias_end)
    else:
        raise ValueError(f"Unknown bias strategy: {bias_strategy}. "
                         "Must be one of: none, earlier, later, range")
    weights = jnp.where(mask, weights * bias_multiplier, weights)
    return weights / weights.sum()


# --------------------------------------------------------------------------
# SDXL conditioning time-ids
# --------------------------------------------------------------------------

def get_add_time_ids(original_sizes, crop_top_lefts, target_sizes,
                     dtype=jnp.float32) -> jnp.ndarray:
    """[B, 6] = (orig_h, orig_w, crop_t, crop_l, tgt_h, tgt_w) per example
    (``novelai_v3.py:209-235``)."""
    rows = [list(o) + list(c) + list(t)
            for o, c, t in zip(original_sizes, crop_top_lefts, target_sizes)]
    return jnp.asarray(rows, dtype=dtype)


# --------------------------------------------------------------------------
# ZTSNR / Euler sampling (inference + validation imaging)
# --------------------------------------------------------------------------

def make_denoised_fn(model_fn, schedule: NoiseSchedule):
    """D(x, sigma): the clean-image estimate implied by the raw network,
    per the schedule's prediction type.

    * v_prediction: the Karras boundary composition the reference samples
      with — ``D = c_skip*x + c_out*F(c_in*x, sigma)`` (``novelai_v3.py:
      59-84``).
    * epsilon: the training forward applies no input scaling
      (``ddpm_trainer.py:302-333``), so ``D = x - sigma*F(x, sigma)``.

    Shared by every sigma-space sampler (Euler, DPM-Solver++); all of them
    step on D, differing only in the integration rule.
    """
    aux_fn = _make_aux_denoised_fn(_wrap_aux(model_fn, False), schedule)
    return lambda x, sigma: aux_fn(x, sigma, None)[0]


def _wrap_aux(model_fn, has_aux: bool):
    """Normalize a sampler model_fn to the aux-threading form
    ``(x, sigma, aux) -> (out, aux)``.

    ``has_aux=False`` is the plain stateless closure; ``has_aux=True`` is
    the stateful form used by per-step caches carried through the sampler
    scan (DeepCache: aux = (step_index, deep_feature))."""
    if has_aux:
        return model_fn
    return lambda x, sigma, aux: (model_fn(x, sigma), aux)


def _make_aux_denoised_fn(aux_model_fn, schedule: NoiseSchedule):
    if schedule.prediction_type == "epsilon":
        def denoised(x, sigma, aux):
            f, aux = aux_model_fn(x, sigma, aux)
            return x - sigma * f, aux
        return denoised

    def denoised(x, sigma, aux):
        c_skip, c_out, c_in = karras_scalings(sigma, schedule.sigma_data)
        f, aux = aux_model_fn(c_in * x, sigma, aux)
        return c_skip * x + c_out * f, aux
    return denoised

def sample_ztsnr(model_fn, key: jax.Array, latent_shape: Tuple[int, ...],
                 schedule: NoiseSchedule, num_steps: int = 28,
                 init: Optional[jnp.ndarray] = None,
                 strength: float = 1.0,
                 denoising_start: Optional[float] = None,
                 denoising_end: Optional[float] = None,
                 aux0=None) -> jnp.ndarray:
    """Karras-Euler sampler, dispatched on the schedule's prediction type.

    v_prediction (the NovelAI-V3 recipe): reference semantics
    (``novelai_v3.py:72-99``) — the first step treats the starting sigma as
    infinite — ``x = sigmas[0]*n - sigma_data*model(n, inf)``
    (``ztsnr_first_step`` with ``sigmas[0]``) — then Euler steps walk EVERY
    adjacent sigma pair ``(sigmas[i-1], sigmas[i])``, so the sampler makes
    exactly ``num_steps`` model calls and the sigma_max level is visited by
    the Euler loop too.  ``model_fn(x, sigma)`` is the raw network in sigma
    space (a closure binding params + conditioning); the ramp uses the
    schedule's own rho so inference matches training.

    epsilon: the reference's sampler surface covers only the v/ZTSNR recipe,
    but its training path (and BASELINE config #1) also trains
    ``prediction_type: epsilon`` — ``F(x0 + sigma*eps, t) -> eps`` with NO
    input scaling (``ddpm_trainer.py:302-333``, our ``ddpm_loss``).  The
    consistent inverse is plain Karras-Euler on the denoiser
    ``D(x, sigma) = x - sigma*F(x, sigma)``, whose Euler direction is
    ``d = (x - D)/sigma = F`` (the predicted noise), walked down an
    N-sigma ramp extended to sigma=0 so the final state lands on the data
    manifold — again exactly ``num_steps`` model calls.  The infinite-sigma
    first step is v-specific (it relies on c_skip->0, c_out->-sigma_data)
    and is not applied here.

    img2img (``init`` + ``strength``): ``init`` is a clean latent tensor of
    ``latent_shape``; the walk starts partway down the ramp at
    ``sigmas[i0]``, ``i0 = round((1-strength)*num_steps)``, from the
    training forward process ``x = init + sigma_start*noise`` — strength 1
    is full generation (``init`` ignored), strength→0 returns the init
    nearly unchanged.  The diffusers img2img timestep convention.

    Ensemble-of-expert-denoisers handoff (SDXL base->refiner, the diffusers
    ``denoising_end``/``denoising_start`` contract): ``denoising_end=e``
    stops the walk at ramp index round(e*(num_steps-1)) and returns the
    still-NOISY latents at that sigma; ``denoising_start=s`` takes ``init``
    as ALREADY-NOISY latents at ramp index round(s*(num_steps-1)) (no noise
    is added) and walks the rest.  Both stages must sample the same ramp
    (same num_steps / sigma range / rho) for the sigma levels to line up.

    ``aux0``: opt-in per-step state carried through the sampler's scan —
    when given, ``model_fn(x, sigma, aux) -> (out, aux)`` (the DeepCache
    carry in ``ValidationSampler``); when None, ``model_fn(x, sigma)`` as
    before.
    """
    if not 0.0 < strength <= 1.0:
        raise ValueError(f"strength must be in (0, 1], got {strength}")
    if denoising_start is not None and init is None:
        raise ValueError("denoising_start requires init (the noisy latents "
                         "handed off by the denoising_end stage)")
    sigmas = karras_sigmas(
        num_steps,
        float(schedule.sigmas[-1]),
        ZTSNR_SIGMA_MAX if schedule.use_ztsnr else float(schedule.sigmas[0]),
        rho=schedule.rho,
    )
    i0 = 0
    noisy_init = False
    if denoising_start is not None:
        if not 0.0 <= denoising_start < 1.0:
            raise ValueError(f"denoising_start in [0,1): {denoising_start}")
        i0 = min(int(round(denoising_start * (num_steps - 1))),
                 num_steps - 1)
        noisy_init = True
    elif init is not None and strength < 1.0:
        i0 = min(int(round((1.0 - strength) * num_steps)), num_steps - 1)
    i_end = num_steps  # exclusive pair-walk bound (index of the last sigma)
    if denoising_end is not None:
        if not 0.0 < denoising_end <= 1.0:
            raise ValueError(f"denoising_end in (0,1]: {denoising_end}")
        i_end = max(i0 + 1, int(round(denoising_end * (num_steps - 1))) + 1)
    n = jax.random.normal(key, latent_shape, dtype=jnp.float32)
    fn = _wrap_aux(model_fn, aux0 is not None)
    aux = aux0

    if schedule.prediction_type == "epsilon":
        ramp = jnp.append(sigmas, 0.0)
        if init is None:
            x = ramp[0] * n
        elif noisy_init:
            x = init.astype(jnp.float32)
        else:
            x = init.astype(jnp.float32) + ramp[i0] * n

        def euler_step_eps(carry, sigma_pair):
            x, aux = carry
            sigma_i, sigma_next = sigma_pair
            d, aux = fn(x, sigma_i, aux)  # d = eps_hat = (x - D)/sigma
            return (x + (sigma_next - sigma_i) * d, aux), None

        hi = (len(ramp) if denoising_end is None or denoising_end >= 1.0
              else i_end)
        pairs = jnp.stack([ramp[i0:hi - 1], ramp[i0 + 1:hi]], axis=1)
        (x, _), _ = jax.lax.scan(euler_step_eps, (x, aux), pairs)
        return x

    if init is None:
        # pure generation: the ZTSNR infinite-sigma first step
        f0, aux = fn(n, jnp.float32(jnp.inf), aux)
        x = sigmas[0] * n - schedule.sigma_data * f0
    elif noisy_init:
        x = init.astype(jnp.float32)
    else:
        # partial denoise: enter the ramp via the training forward process
        x = init.astype(jnp.float32) + sigmas[i0] * n
        if schedule.use_ztsnr:
            x = jnp.clip(x, -ZTSNR_SIGMA_MAX, ZTSNR_SIGMA_MAX)

    def euler_step(carry, sigma_pair):
        x, aux = carry
        sigma_i, sigma_next = sigma_pair
        c_skip, c_out, c_in = karras_scalings(sigma_i, schedule.sigma_data)
        f, aux = fn(c_in * x, sigma_i, aux)
        denoised = c_skip * x + c_out * f
        d = (x - denoised) / sigma_i
        return (x + (sigma_next - sigma_i) * d, aux), None

    pairs = jnp.stack([sigmas[i0:i_end - 1], sigmas[i0 + 1:i_end]], axis=1)
    (x, _), _ = jax.lax.scan(euler_step, (x, aux), pairs)
    return x


def sample_dpmpp_2m(model_fn, key: jax.Array, latent_shape: Tuple[int, ...],
                    schedule: NoiseSchedule, num_steps: int = 14,
                    init: Optional[jnp.ndarray] = None,
                    strength: float = 1.0,
                    denoising_start: Optional[float] = None,
                    denoising_end: Optional[float] = None,
                    aux0=None) -> jnp.ndarray:
    """DPM-Solver++(2M): second-order multistep sampler in log-sigma space
    (Lu et al., arXiv 2211.01095; the k-diffusion ``sample_dpmpp_2m``
    update rule).  Produces Euler-28-step quality in ~12-15 steps — a ~2x
    serving speedup per image at the same model — because the data-space
    parameterisation integrates the probability-flow ODE exactly for a
    constant denoised estimate and the 2M correction cancels the local
    curvature using the previous step's estimate (no extra model calls).

    Same surface as :func:`sample_ztsnr` (init/strength img2img entry,
    denoising_start/end ensemble handoff, prediction-type dispatch via
    :func:`make_denoised_fn`); the reference ships only the Euler/ZTSNR
    walk (``novelai_v3.py:72-99``) — this is an addition its users got
    from diffusers' scheduler zoo.

    Update rule per step i (lambda = -ln sigma, h = lambda_{i+1} -
    lambda_i):  ``x <- (sigma_{i+1}/sigma_i) x - expm1(-h) * D~`` with
    ``D~ = (1 + 1/2r) D_i - (1/2r) D_{i-1}``, ``r = h_{i-1}/h_i`` (plain
    ``D_i`` on the first step and on a terminal sigma=0 step).
    """
    if not 0.0 < strength <= 1.0:
        raise ValueError(f"strength must be in (0, 1], got {strength}")
    if denoising_start is not None and init is None:
        raise ValueError("denoising_start requires init (the noisy latents "
                         "handed off by the denoising_end stage)")
    sigmas = karras_sigmas(
        num_steps,
        float(schedule.sigmas[-1]),
        ZTSNR_SIGMA_MAX if schedule.use_ztsnr else float(schedule.sigmas[0]),
        rho=schedule.rho,
    )
    eps_mode = schedule.prediction_type == "epsilon"
    ramp = jnp.append(sigmas, 0.0) if eps_mode else sigmas

    i0 = 0
    noisy_init = False
    if denoising_start is not None:
        if not 0.0 <= denoising_start < 1.0:
            raise ValueError(f"denoising_start in [0,1): {denoising_start}")
        i0 = min(int(round(denoising_start * (num_steps - 1))),
                 num_steps - 1)
        noisy_init = True
    elif init is not None and strength < 1.0:
        i0 = min(int(round((1.0 - strength) * num_steps)), num_steps - 1)
    i_end = len(ramp)  # exclusive bound on sigma indices walked
    if denoising_end is not None:
        if not 0.0 < denoising_end <= 1.0:
            raise ValueError(f"denoising_end in (0,1]: {denoising_end}")
        if denoising_end < 1.0:
            i_end = max(i0 + 2,
                        int(round(denoising_end * (num_steps - 1))) + 1)

    n = jax.random.normal(key, latent_shape, dtype=jnp.float32)
    fn = _wrap_aux(model_fn, aux0 is not None)
    aux = aux0
    if init is None:
        if eps_mode:
            x = ramp[0] * n
        else:
            # ZTSNR infinite-sigma first step, exactly as the Euler sampler
            f0, aux = fn(n, jnp.float32(jnp.inf), aux)
            x = sigmas[0] * n - schedule.sigma_data * f0
    elif noisy_init:
        x = init.astype(jnp.float32)
    else:
        x = init.astype(jnp.float32) + ramp[i0] * n
        if schedule.use_ztsnr and not eps_mode:
            x = jnp.clip(x, -ZTSNR_SIGMA_MAX, ZTSNR_SIGMA_MAX)

    denoise = _make_aux_denoised_fn(fn, schedule)

    def lam(sigma):  # lambda = -ln sigma, with a terminal-0 guard
        return -jnp.log(jnp.maximum(sigma, 1e-20))

    def step(carry, sigma_pair):
        x, aux, old_d, h_prev, first = carry
        sigma_i, sigma_next = sigma_pair
        d, aux = denoise(x, sigma_i, aux)
        h = lam(sigma_next) - lam(sigma_i)
        # first step and terminal sigma=0 step fall back to first order
        # (h -> inf there, so the 2M correction is undefined)
        use_first = jnp.logical_or(first, sigma_next <= 0.0)
        safe_r = jnp.where(first, 1.0, h_prev / jnp.where(h == 0, 1.0, h))
        d2 = (1.0 + 1.0 / (2.0 * safe_r)) * d \
            - (1.0 / (2.0 * safe_r)) * jnp.where(first, d, old_d)
        dt = jnp.where(use_first, d, d2)
        ratio = jnp.where(sigma_next <= 0.0, 0.0, sigma_next / sigma_i)
        x = ratio * x - jnp.expm1(-h) * dt
        return (x, aux, d, h, jnp.zeros_like(first)), None

    pairs = jnp.stack([ramp[i0:i_end - 1], ramp[i0 + 1:i_end]], axis=1)
    first = jnp.asarray(True)
    (x, _, _, _, _), _ = jax.lax.scan(
        step, (x, aux, jnp.zeros_like(x), jnp.float32(1.0), first), pairs)
    return x


def sample_flow(model_fn, key: jax.Array, latent_shape: Tuple[int, ...],
                num_steps: int = 28, init: Optional[jnp.ndarray] = None,
                strength: float = 1.0) -> jnp.ndarray:
    """Euler ODE sampler for flow-matching-trained models.

    Integrates the optimal-transport probability-flow ODE ``dx/dt = v(x, t)``
    from t=0 (pure noise) to t=1 (data), matching the training convention of
    ``flow_matching_loss``: ``x_t = (1-t)x0 + t*x1``, ``v = x1 - x0``, the
    UNet called with t in [0,1] directly (reference
    ``flow_matching_trainer.py:392-405``; its own sampler surface was
    import-dead, so this is the working inverse of that training path).

    ``model_fn(x, t)`` takes a scalar t and returns the (CFG-combined)
    velocity.  Fixed grid over the integrated interval — N model calls for
    full generation, the same budget as the ZTSNR sampler's.

    img2img (``init`` + ``strength``): start at ``t0 = 1 - strength`` on the
    training path ``x = (1-t0)*noise + t0*init`` and integrate the remaining
    interval [t0, 1] in ``round(strength*num_steps)`` steps (the diffusers
    step-budget convention: weaker edits cost fewer model calls).
    """
    if not 0.0 < strength <= 1.0:
        raise ValueError(f"strength must be in (0, 1], got {strength}")
    noise = jax.random.normal(key, latent_shape, dtype=jnp.float32)
    if init is None or strength >= 1.0:
        t0, x = 0.0, noise
        n_run = num_steps
    else:
        t0 = 1.0 - strength
        x = (1.0 - t0) * noise + t0 * init.astype(jnp.float32)
        n_run = max(1, int(round(strength * num_steps)))
    dt = (1.0 - t0) / n_run
    ts = t0 + jnp.arange(n_run, dtype=jnp.float32) * dt

    def euler_step(x, t):
        return x + dt * model_fn(x, t), None

    x, _ = jax.lax.scan(euler_step, x, ts)
    return x
