"""Optimizer registry — mirrors the reference's optimizer_type map
(``src/data/config.py:66-75`` / ``src/main.py:73-77``):

* ``adamw_bf16``                -> pure-bf16 AdamW with stochastic rounding
* ``adamw_schedule_free_kahan`` -> schedule-free AdamW with Kahan summation
* ``soap``                      -> SOAP (Shampoo-eigenbasis Adam)
* ``adamw``                     -> plain optax AdamW (fp32 state baseline)
"""
from __future__ import annotations

import optax

from sdxl_training_improvements_tpu.training.optimizers.adamw_bf16 import (
    AdamWBF16State, adamw_bf16)
from sdxl_training_improvements_tpu.training.optimizers.ema import (
    EMAState, ema_eval_params, unwrap_ema, with_ema)
from sdxl_training_improvements_tpu.training.optimizers.schedule_free import (
    ScheduleFreeKahanState, adamw_schedule_free_kahan,
    schedule_free_eval_params)
from sdxl_training_improvements_tpu.training.optimizers.soap import (
    SOAPState, soap)

__all__ = [
    "adamw_bf16", "adamw_schedule_free_kahan", "soap", "make_optimizer",
    "resolve_flat_state",
    "AdamWBF16State", "ScheduleFreeKahanState", "SOAPState", "EMAState",
    "schedule_free_eval_params", "with_ema", "ema_eval_params",
    "unwrap_ema",
]


def make_optimizer(config) -> optax.GradientTransformation:
    """Build the optimizer from an ``OptimizerConfig`` (same selection
    surface as reference ``main.py:73-86``).  When the root config sets
    ``training.ema_decay`` the optimizer is wrapped with the fp32 weight
    EMA (``ema.with_ema``)."""
    oc = config.optimizer if hasattr(config, "optimizer") else config
    ema_decay = getattr(getattr(config, "training", None), "ema_decay", None)
    if ema_decay and oc.optimizer_type.lower() == "adamw_schedule_free_kahan":
        raise ValueError(
            "training.ema_decay cannot be combined with the schedule-free "
            "optimizer: schedule-free training IS a weight-averaging scheme "
            "(its x sequence is the shipped model, recovered at export); an "
            "EMA of the y training iterate would shadow that recovery with "
            "ill-defined weights. Disable one of the two.")
    tpu = getattr(config, "tpu", None)
    # host-streamed optimizer state is a single-chip small-HBM feature; its
    # pinned-host placement/donation contract has only been validated
    # unsharded — combined with ZeRO/megatron param sharding it would force
    # implicit gathers or mis-place state (ADVICE round-4, medium): refuse
    # loudly instead of training wrong.
    if (getattr(oc, "shift_host", False)
            or getattr(oc, "moments_host", False)) and getattr(
            tpu, "shard_params", False):
        raise ValueError(
            "optimizer.shift_host/moments_host cannot be combined with "
            "tpu.shard_params: host-streamed state is a single-chip 16 GB "
            "memory plan; on a sharded mesh the optimizer state is already "
            "ZeRO-partitioned across chips. Disable one of the two.")
    base = _make_base(oc, flat_state=resolve_flat_state(tpu),
                      sr_noise=getattr(tpu, "sr_noise", None))
    return with_ema(base, decay=ema_decay) if ema_decay else base


def resolve_flat_state(tpu_cfg) -> bool:
    """Resolve ``tpu.flat_optimizer`` ("auto"|"on"|"off").

    "auto" resolves to OFF: flat packing was implemented and measured at
    full 2.567B-param scale and LOST — ~500 ms vs 141.5 ms per-leaf on v5e
    (tools/measure_r3.py, 2026-08-17; docs/performance.md) because ravelling TPU
    tiled layouts into 1-D buffers forces relayout copies that swamp the
    dispatch savings.  The option stays for A/B measurement ("on") and is
    rejected under model sharding either way (per-leaf state is what the
    sharding rules apply to)."""
    if tpu_cfg is None:
        return False
    choice = str(getattr(tpu_cfg, "flat_optimizer", "off")).lower()
    if choice not in ("on", "true"):
        return False  # "auto" and "off" both resolve to per-leaf
    mesh_shape = getattr(tpu_cfg, "mesh_shape", None)
    tensor_sharded = bool(mesh_shape) and len(mesh_shape) >= 3 \
        and mesh_shape[2] > 1
    if getattr(tpu_cfg, "shard_params", False) or tensor_sharded:
        raise ValueError(
            "tpu.flat_optimizer=on cannot be combined with model sharding "
            "(tpu.shard_params / a tensor mesh axis): the per-leaf sharding "
            "rules do not apply to flat buffers.")
    return True


def _make_base(oc, flat_state: bool = False,
               sr_noise=None) -> optax.GradientTransformation:
    kind = oc.optimizer_type.lower()
    common = dict(lr=oc.learning_rate, betas=(oc.beta1, oc.beta2),
                  eps=oc.epsilon, weight_decay=oc.weight_decay)
    if kind == "adamw_bf16":
        moments = "int8" if getattr(oc, "moments_8bit", False) else "bf16"
        return adamw_bf16(**common, flat_state=flat_state, noise=sr_noise,
                          moments=moments,
                          shift_host=getattr(oc, "shift_host", False),
                          moments_host=getattr(oc, "moments_host", False))
    if kind == "adamw_schedule_free_kahan":
        return adamw_schedule_free_kahan(
            **common, warmup_steps=oc.warmup_steps, kahan_sum=oc.kahan_sum,
            correct_bias=oc.correct_bias)
    if kind == "soap":
        return soap(**common, shampoo_beta=oc.shampoo_beta,
                    precondition_frequency=oc.precondition_frequency,
                    max_precond_dim=oc.max_precond_dim,
                    merge_dims=oc.merge_dims,
                    precondition_1d=oc.precondition_1d,
                    normalize_grads=oc.normalize_grads,
                    correct_bias=oc.correct_bias)
    if kind == "adamw":
        return optax.adamw(learning_rate=oc.learning_rate,
                           b1=oc.beta1, b2=oc.beta2, eps=oc.epsilon,
                           weight_decay=oc.weight_decay)
    raise ValueError(f"Unsupported optimizer type: {oc.optimizer_type}")
