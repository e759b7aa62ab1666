"""Fused Pallas bf16-SR AdamW kernel numerics (interpret mode).

The kernel's deterministic parts (second moment, decay, the update chain's
structure) must match the XLA path exactly; the stochastically-rounded
parts differ only by their (independent, uniform) 16-bit noise stream, so
they are checked to within one bf16 ulp and for mean-preservation.
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from sdxl_training_improvements_tpu.ops.fused_adamw import (
    fused_adamw_update as _fused_raw)


def fused_adamw_update(*args, **kw):
    with pltpu.force_tpu_interpret_mode():
        return _fused_raw(*args, **kw)
from sdxl_training_improvements_tpu.ops.stochastic import (
    add_stochastic_bits, addcdiv_stochastic_bits)


def _xla_reference(p, g, m, v, shift, lr_eff, decay_amt, noise,
                   beta1=0.9, beta2=0.999, eps=1e-8):
    """The adamw_bf16 leaf_update chain with injected noise planes."""
    g32 = g.astype(jnp.float32)
    m_scaled = (m.astype(jnp.float32) * beta1).astype(jnp.bfloat16)
    m = add_stochastic_bits(m_scaled, g, noise[0], alpha=1.0 - beta1)
    v = (v.astype(jnp.float32) * beta2
         + (1.0 - beta2) * g32 * g32).astype(jnp.bfloat16)
    denom = jnp.sqrt(v.astype(jnp.float32)) + eps
    shift = addcdiv_stochastic_bits(shift, m, denom, noise[1], value=-lr_eff)
    p_new = add_stochastic_bits(p, shift, noise[2])
    shift = add_stochastic_bits(
        shift, p.astype(jnp.float32) - p_new.astype(jnp.float32), noise[3])
    shift = (shift.astype(jnp.float32)
             - decay_amt * p_new.astype(jnp.float32)).astype(jnp.bfloat16)
    return p_new, m, v, shift


def _setup(n=2048, seed=0):
    k = jax.random.split(jax.random.key(seed), 5)
    p = (0.05 * jax.random.normal(k[0], (n,))).astype(jnp.bfloat16)
    g = (0.01 * jax.random.normal(k[1], (n,))).astype(jnp.bfloat16)
    m = (0.01 * jax.random.normal(k[2], (n,))).astype(jnp.bfloat16)
    v = (1e-4 * jax.random.uniform(k[3], (n,))).astype(jnp.bfloat16)
    s = (1e-3 * jax.random.normal(k[4], (n,))).astype(jnp.bfloat16)
    return p, g, m, v, s


def test_bit_exact_vs_zero_noise_xla_chain():
    """The pallas interpreter stubs ``prng_random_bits`` to ZERO, which
    makes interpret mode exactly the zero-noise chain — so the whole
    m -> v -> shift -> p -> residual structure must match the XLA path with
    injected zero noise BIT FOR BIT.  (Real-RNG behaviour — seed
    sensitivity + mean preservation — is covered on hardware by
    tests/test_tpu_smoke.py; the SR primitive itself is
    distribution-tested in tests/test_optimizers.py.)"""
    p, g, m, v, s = _setup()
    lr = 1e-3
    pf, mf, vf, sf = fused_adamw_update(
        p, g, m, v, s, lr_eff=jnp.float32(lr), decay_amt=jnp.float32(0.0),
        seed=jnp.int32(3))
    zero_noise = [jnp.zeros(p.shape, jnp.uint32)] * 4
    pr, mr, vr, sr = _xla_reference(p, g, m, v, s, lr, 0.0, zero_noise)
    for name, got, ref in (("p", pf, pr), ("v", vf, vr), ("shift", sf, sr)):
        np.testing.assert_array_equal(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            err_msg=f"{name} diverges from the zero-noise XLA chain")
    # m: XLA:CPU freely contracts the (1-beta1)*g multiply-add into an fma
    # in one graph but not the other, so the fp32 pre-rounding sum can
    # differ by 1 ulp exactly at a truncation boundary — allow <=1% of
    # elements to sit one bf16 ulp apart, everything else bit-equal
    mg = np.asarray(mf, np.float32)
    mrf = np.asarray(mr, np.float32)
    diff = mg != mrf
    assert diff.mean() <= 0.01, f"{diff.sum()} m mismatches"
    ulp = np.maximum(np.abs(mrf) * 2.0 ** -7, 2.0 ** -133)
    assert (np.abs(mg - mrf) <= ulp + 1e-12).all()


def test_decay_bit_exact_too():
    p, g, m, v, s = _setup(seed=3)
    pf, mf, vf, sf = fused_adamw_update(
        p, g, m, v, s, lr_eff=jnp.float32(1e-3),
        decay_amt=jnp.float32(0.007), seed=jnp.int32(0))
    zero_noise = [jnp.zeros(p.shape, jnp.uint32)] * 4
    pr, mr, vr, sr = _xla_reference(p, g, m, v, s, 1e-3, 0.007, zero_noise)
    np.testing.assert_array_equal(np.asarray(sf, np.float32),
                                  np.asarray(sr, np.float32))


def test_decay_fires():
    p, g, m, v, s = _setup(seed=1)
    _, _, _, s_no = fused_adamw_update(
        p, g, m, v, s, lr_eff=jnp.float32(0.0), decay_amt=jnp.float32(0.0),
        seed=jnp.int32(0))
    _, _, _, s_yes = fused_adamw_update(
        p, g, m, v, s, lr_eff=jnp.float32(0.0), decay_amt=jnp.float32(0.01),
        seed=jnp.int32(0))
    d = np.asarray(s_no, np.float32) - np.asarray(s_yes, np.float32)
    # the difference is ~decay_amt * p_new
    assert np.abs(d).max() > 0


def test_exactly_representable_sums_round_deterministically():
    """SR(x) == x when x is exactly bf16-representable, for every seed
    (the 16 noise bits sit entirely below the kept mantissa, no carry)."""
    n = 512
    zeros = jnp.zeros((n,), jnp.bfloat16)
    v = jnp.full((n,), 1e-2, jnp.bfloat16)
    shift = jnp.full((n,), 0.5, jnp.bfloat16)  # exactly representable
    outs = []
    for seed in range(8):
        p_new, _, _, _ = fused_adamw_update(
            zeros, zeros, zeros, v, shift,
            lr_eff=jnp.float32(0.0), decay_amt=jnp.float32(0.0),
            seed=jnp.int32(seed))
        outs.append(np.asarray(p_new, np.float32))
    assert all((o == 0.5).all() for o in outs)


def test_shapes_and_padding():
    """Non-multiple-of-1024 sizes and 4-D shapes round-trip."""
    shape = (3, 5, 7, 11)
    k = jax.random.key(2)
    p = (0.1 * jax.random.normal(k, shape)).astype(jnp.bfloat16)
    z = jnp.zeros(shape, jnp.bfloat16)
    v = jnp.full(shape, 1e-4, jnp.bfloat16)
    p2, m2, v2, s2 = fused_adamw_update(
        p, z, z, v, z, lr_eff=jnp.float32(1e-3),
        decay_amt=jnp.float32(0.0), seed=jnp.int32(9))
    assert p2.shape == shape and m2.shape == shape
    assert np.isfinite(np.asarray(p2, np.float32)).all()
    # zero grad, zero moment -> p unchanged
    np.testing.assert_array_equal(np.asarray(p2, np.float32),
                                  np.asarray(p, np.float32))
