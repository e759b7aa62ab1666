"""8-bit log-code quantization for optimizer moments.

The reference ships pure-bf16 moments (``src/training/optimizers/
adamw_bfloat16/__init__.py`` — 3x params of state).  This module provides
the storage-side compression for ``adamw_bf16(moments="int8")``: first and
second Adam moments held as one uint8 code per element plus one fp32 scale
per leaf, cutting the optimizer state from 6 to 4 bytes/param (15.4 GB ->
10.3 GB over the 2.567B-param UNet) and the HBM traffic of the update's
moment reads/writes by half.

Design: a **log-spaced code** (0, then N values log-uniform over
``_DECADES`` decades up to the leaf's absmax).  Unlike the linear int8
codes common on GPU (whose error is relative to the *blockwise absmax*, so
small elements in a block are crushed and fine-grained blocks are needed),
a log code's quantization error is a constant factor *relative to each
element's own value* across all 8 decades — which is what Adam's moments
need (``v`` spans many decades; the update consumes ``m / sqrt(v)``).  One
scale per leaf therefore suffices, and there is no block bookkeeping.

Both directions are **pure arithmetic** (exp2/log2 on the VPU): decode is
``code = sign * 2^(a*q + b)``, encode is a log2 + round.  No gather and no
searchsorted — the original 256-entry table-gather decode measured fine in
XLA fusions on CPU but **faulted the v5e dev chip's tunnel at 2.567B-scale
leaves** (UNAVAILABLE device error, BENCH_r04/r05 logs, 2026-08-20), and
the arithmetic form is the natural TPU shape for a log code anyway: the
elementwise exp2 fuses into the consuming update chain with zero extra HBM
traffic, where a table gather materialises an index load per element.

The unsigned map (for the non-negative ``v``) uses all 255 non-zero codes
for magnitude: log step 8/254 decades, half-step error ~3.7% of the
element's value.  The signed map (for ``m``) spends one bit on sign —
127/128 codes per side, log step 8/127 decades, half-step error ~7.5%.
``m``'s sign and decade dominate ``m/sqrt(v)``; the quality study
(tools/study_int8_moments.py, BASELINE.md "8-bit moments") measures the
combined effect against bf16 and fp32 moment arms.

Non-finite elements (an ``inf`` from an fp32 ``v`` overflow, or a NaN)
are **excluded from the absmax** and mapped to the top code of their sign
(NaN to the top positive code), so — like the bf16-moment baseline —
corruption stays confined to the offending element and dequantizes to a
bounded ``±absmax`` instead of poisoning the whole leaf through the
shared scale.

Code layout (the dequantized value for code ``q``, before the leaf scale):

* unsigned: ``q=0 -> 0``; ``q in 1..255 -> 10^(-D + D*(q-1)/254)``
* signed:   ``q in 0..126 -> -10^(-D*q/126)`` (q=0 is -1, the most
  negative); ``q=127 -> 0``; ``q in 128..255 -> 10^(-D + D*(q-128)/127)``
"""
from __future__ import annotations

import math
from typing import Dict

import jax.numpy as jnp
import numpy as np

# absmax-normalized values below 10^-_DECADES round to the 0 code; Adam
# moments at SDXL scale span ~6 decades within a leaf, so 8 leaves margin
_DECADES = 8.0
_LOG2_10 = math.log2(10.0)
# encode cutoff: half the smallest nonzero magnitude (the linear midpoint
# between the 0 code and 10^-D, matching the original table's
# nearest-in-value boundary at the zero end)
_ZERO_CUTOFF = 0.5 * 10.0 ** (-_DECADES)


def _decode_unsigned(qf: jnp.ndarray) -> jnp.ndarray:
    """fp32 code index -> fp32 magnitude (0 stays 0)."""
    w = jnp.exp2(_LOG2_10 * (-_DECADES + _DECADES * (qf - 1.0) / 254.0))
    return jnp.where(qf == 0.0, 0.0, w)


def _decode_signed(qf: jnp.ndarray) -> jnp.ndarray:
    neg = -jnp.exp2(_LOG2_10 * (-_DECADES * qf / 126.0))
    pos = jnp.exp2(_LOG2_10 * (-_DECADES + _DECADES * (qf - 128.0) / 127.0))
    return jnp.where(qf < 127.0, neg, jnp.where(qf == 127.0, 0.0, pos))


def quantize_8bit(x: jnp.ndarray, signed: bool = True) -> Dict[str, jnp.ndarray]:
    """Quantize to ``{"q": uint8 codes (x.shape), "s": fp32 scalar scale}``.

    Nearest-code rounding in log space after absmax normalization; an
    all-zero input gets scale 1 so dequantize returns exact zeros.
    Non-finite elements do not contribute to the scale and round to the
    top code of their sign (NaN to the top positive code) — see the module
    docstring.
    """
    x32 = x.astype(jnp.float32)
    finite = jnp.isfinite(x32)
    absmax = jnp.max(jnp.abs(jnp.where(finite, x32, 0.0)))
    scale = jnp.where(absmax > 0, absmax, 1.0)
    # +-inf -> +-1 (top code of its sign); NaN -> +1 (top positive code)
    y = jnp.where(finite, x32 / scale,
                  jnp.where(x32 < 0, -1.0, 1.0))
    ay = jnp.abs(y)
    # decades below 1: log10(ay), clamped away from log(0)
    l10 = jnp.log2(jnp.maximum(ay, jnp.float32(1e-38))) / _LOG2_10
    if signed:
        jneg = jnp.clip(jnp.round(-l10 * (126.0 / _DECADES)), 0.0, 126.0)
        kpos = 128.0 + jnp.clip(
            jnp.round((l10 + _DECADES) * (127.0 / _DECADES)), 0.0, 127.0)
        q = jnp.where(y < 0, jneg, kpos)
        q = jnp.where(ay < _ZERO_CUTOFF, 127.0, q)
    else:
        q = 1.0 + jnp.clip(
            jnp.round((l10 + _DECADES) * (254.0 / _DECADES)), 0.0, 254.0)
        q = jnp.where(ay < _ZERO_CUTOFF, 0.0, q)
    return {"q": q.astype(jnp.uint8), "s": scale}


def dequantize_8bit(qs: Dict[str, jnp.ndarray], signed: bool = True,
                    dtype=jnp.bfloat16) -> jnp.ndarray:
    qf = qs["q"].astype(jnp.float32)
    w = _decode_signed(qf) if signed else _decode_unsigned(qf)
    return (w * qs["s"]).astype(dtype)


def quantized_zeros(shape, signed: bool = True) -> Dict[str, jnp.ndarray]:
    """The quantized representation of an all-zeros tensor."""
    zero_idx = 127 if signed else 0
    return {"q": jnp.full(shape, zero_idx, jnp.uint8),
            "s": jnp.ones((), jnp.float32)}


def _code_np(signed: bool) -> np.ndarray:
    """The full 256-entry code table (numpy, for tests/inspection only —
    the jit paths above are arithmetic and never materialise it)."""
    qf = np.arange(256, dtype=np.float64)
    if signed:
        neg = -(10.0 ** (-_DECADES * qf / 126.0))
        pos = 10.0 ** (-_DECADES + _DECADES * (qf - 128.0) / 127.0)
        return np.where(qf < 127, neg,
                        np.where(qf == 127, 0.0, pos)).astype(np.float32)
    return np.where(qf == 0, 0.0,
                    10.0 ** (-_DECADES + _DECADES * (qf - 1.0) / 254.0)
                    ).astype(np.float32)
