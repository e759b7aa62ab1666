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
scale per leaf therefore suffices; there is no block bookkeeping, and the
dequantize is a 256-entry table gather that XLA fuses into the consuming
elementwise op.

Both directions are shape-preserving and jit-safe.  The unsigned map (for
the non-negative ``v``) uses all 255 non-zero codes for magnitude: log
step 8/254 decades, half-step error ~3.7% of the element's value.  The
signed map (for ``m``) spends one bit on sign — 127/128 codes per side,
log step 8/127 decades, half-step error ~7.5%.  ``m``'s sign and decade
dominate ``m/sqrt(v)``; the quality study (tools/study_int8_moments.py)
measures the combined effect against bf16 and fp32 moment arms.

Non-finite elements (an ``inf`` from an fp32 ``v`` overflow, or a NaN)
are **excluded from the absmax** and mapped to the top code of their sign
(NaN to the top positive code), so — like the bf16-moment baseline —
corruption stays confined to the offending element and dequantizes to a
bounded ``±absmax`` instead of poisoning the whole leaf through the
shared scale.
"""
from __future__ import annotations

from functools import lru_cache
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

# absmax-normalized values below 10^-_DECADES round to the 0 code; Adam
# moments at SDXL scale span ~6 decades within a leaf, so 8 leaves margin
_DECADES = 8.0


@lru_cache(maxsize=None)
def _code_np(signed: bool) -> np.ndarray:
    if signed:
        # all 256 codes distinct: 127 negative + 0 + 128 positive
        pos = np.logspace(-_DECADES, 0.0, 128)
        neg = -np.logspace(-_DECADES, 0.0, 127)[::-1]
        code = np.concatenate([neg, [0.0], pos])  # 256, sorted
    else:
        code = np.concatenate([[0.0], np.logspace(-_DECADES, 0.0, 255)])
    return np.sort(code).astype(np.float32)


def _code(signed: bool) -> jnp.ndarray:
    # NOT lru-cached: jnp.asarray inside a trace stages a device_put, so a
    # cached result would leak a tracer across traces.  Constant-duplication
    # pressure (one dense 256-float constant per call site; once ~3,400
    # copies = 45 MB of StableHLO over a 1,700-leaf optimizer update,
    # measured 2026-08-19) is instead bounded by adamw_bf16's nested-jit
    # leaf kernels: one call site per distinct leaf (shape, dtype).
    return jnp.asarray(_code_np(signed))


def quantize_8bit(x: jnp.ndarray, signed: bool = True) -> Dict[str, jnp.ndarray]:
    """Quantize to ``{"q": uint8 codes (x.shape), "s": fp32 scalar scale}``.

    Nearest-code rounding after absmax normalization; an all-zero input
    gets scale 1 so dequantize returns exact zeros.  Non-finite elements
    do not contribute to the scale and round to the top code of their
    sign (NaN to the top positive code) — see the module docstring.
    """
    code = _code(signed)
    x32 = x.astype(jnp.float32)
    finite = jnp.isfinite(x32)
    absmax = jnp.max(jnp.abs(jnp.where(finite, x32, 0.0)))
    scale = jnp.where(absmax > 0, absmax, 1.0)
    # +-inf -> +-1 (top code of its sign); NaN -> +1 (top positive code)
    y = jnp.where(finite, x32 / scale,
                  jnp.where(x32 < 0, -1.0, 1.0))
    idx = jnp.clip(jnp.searchsorted(code, y), 1, code.shape[0] - 1)
    lo = code[idx - 1]
    hi = code[idx]
    q = jnp.where(y - lo <= hi - y, idx - 1, idx).astype(jnp.uint8)
    return {"q": q, "s": scale}


def dequantize_8bit(qs: Dict[str, jnp.ndarray], signed: bool = True,
                    dtype=jnp.bfloat16) -> jnp.ndarray:
    code = _code(signed)
    return (code[qs["q"].astype(jnp.int32)] * qs["s"]).astype(dtype)


def quantized_zeros(shape, signed: bool = True) -> Dict[str, jnp.ndarray]:
    """The quantized representation of an all-zeros tensor."""
    zero_idx = int(np.searchsorted(_code_np(signed), 0.0))
    return {"q": jnp.full(shape, zero_idx, jnp.uint8),
            "s": jnp.ones((), jnp.float32)}
