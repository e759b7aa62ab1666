"""Startup auto-probe: does Mosaic (Pallas) run at native speed here?

The framework carries Pallas kernels for its hot ops (flash attention,
fused GroupNorm+SiLU, fused bf16-SR AdamW) — the TPU-native analogue of the
reference's xformers/CUDA kernels (``flow_matching_trainer.py:69-76``,
``adamw_bfloat16/__init__.py``).  Whether they are *faster* than the XLA
path depends on the execution environment: on real v5e/v5p hardware Mosaic
custom calls run natively; through this project's tunneled dev TPU they
execute on an emulated relay ~100x slower than XLA (docs/performance.md).

Rather than asking a human to flip env vars per machine, this module times
one tiny Mosaic kernel against its XLA equivalent at first use and caches
the verdict (in-process + a temp file keyed by device kind), so the first
training/bench run on native hardware picks up the Pallas kernels
automatically and a tunneled run keeps the XLA path — no intervention.

Per-kernel env overrides still win (``SDXL_TPU_FUSED_GN``: "1" forces on,
"0" forces off, unset defers to the probe), plus a global
``SDXL_TPU_MOSAIC`` = ``native`` | ``slow`` that pre-empts probing entirely
(also useful in CI).  Two kernels deliberately do NOT defer to the probe,
per the 2026-08-18 native-v5e measurements (docs/performance.md):
``SDXL_TPU_FLASH`` promotes "auto" attention only when explicitly "1"
(flash tied/lost to chunked XLA in training), and ``SDXL_TPU_FUSED_ADAMW``
is explicit opt-in (the kernel measured 2.1x slower than the XLA chain).
Probe-native alone flips only the fused GroupNorm, the one measured win.
"""
from __future__ import annotations

import functools
import json
import os
import tempfile
import time

import jax
import jax.numpy as jnp

# The probe array must be LARGE: per-dispatch overheads (tunnel RPC) hit
# both paths equally and would mask the emulation cost on a tiny kernel —
# measured here: a 1 MB probe declared the tunneled relay "native" while the
# real kernels ran ~100x slow and faulted the device.  At 64 MB (one HBM
# read+write ~160 us native) the emulated path costs tens of ms, so the
# ratio separates cleanly.  Declare Mosaic native when the Pallas timing is
# within 4x of XLA's plus a 2 ms allowance.
_PROBE_SHAPE = (4096, 4096)  # f32: 64 MB
# Block rows per grid step: 128 rows x 4096 cols f32 = 2 MB per buffer, so
# in+out double-buffered stays ~8 MB — under the v5e compile helper's 16 MB
# scoped-vmem stack limit (512-row blocks hit 32 MB and the AOT compile
# faults, 2026-08-20).  The ARRAY stays 64 MB so tunnel RPC overhead still
# cannot mask the emulation cost (see note above).
_PROBE_BLOCK_ROWS = 128
_RATIO_LIMIT = 4.0
_ABS_ALLOWANCE_S = 2e-3
_PROBE_ITERS = 10
_PROBE_VERSION = 3  # bump to invalidate cached verdicts from older probes


def _cache_path() -> str:
    return os.path.join(tempfile.gettempdir(), "sdxl_tpu_mosaic_probe.json")


def _device_key() -> str:
    d = jax.devices()[0]
    return f"v{_PROBE_VERSION}:{d.platform}:{getattr(d, 'device_kind', '?')}"


def _read_cache(key: str):
    try:
        with open(_cache_path()) as f:
            data = json.load(f)
        val = data.get(key)
        return val if isinstance(val, bool) else None
    except Exception:
        return None


def _write_cache(key: str, value: bool) -> None:
    path = _cache_path()
    try:
        data = {}
        if os.path.exists(path):
            with open(path) as f:
                data = json.load(f)
        data[key] = value
        tmp = f"{path}.{os.getpid()}.tmp"
        with open(tmp, "w") as f:
            json.dump(data, f)
        os.replace(tmp, path)
    except Exception:
        pass  # cache is best-effort; the probe result still holds in-process


def _time(fn, x, iters: int = _PROBE_ITERS) -> float:
    out = fn(x)
    jax.block_until_ready(out)  # warmup + compile
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(x)
    jax.block_until_ready(out)
    return (time.perf_counter() - start) / iters


def _run_probe() -> bool:
    from jax.experimental import pallas as pl

    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0 + 1.0

    rows, cols = _PROBE_SHAPE
    block = _PROBE_BLOCK_ROWS
    x = jnp.ones(_PROBE_SHAPE, jnp.float32)
    pallas_fn = jax.jit(lambda a: pl.pallas_call(
        kernel,
        grid=(rows // block,),
        in_specs=[pl.BlockSpec((block, cols), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((block, cols), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype))(a))
    xla_fn = jax.jit(lambda a: a * 2.0 + 1.0)
    t_xla = _time(xla_fn, x)
    t_pallas = _time(pallas_fn, x)
    return bool(t_pallas <= _RATIO_LIMIT * t_xla + _ABS_ALLOWANCE_S)


@functools.lru_cache(maxsize=1)
def mosaic_native() -> bool:
    """True iff Pallas kernels should be dispatched on this backend."""
    override = os.environ.get("SDXL_TPU_MOSAIC", "").lower()
    if override == "native":
        return True
    if override == "slow":
        return False
    if jax.default_backend() != "tpu":
        return False
    key = _device_key()
    cached = _read_cache(key)
    if cached is not None:
        return cached
    try:
        result = _run_probe()
    except Exception:
        result = False  # Pallas unavailable/broken => XLA path
        # A failed remote compile can be delivered asynchronously and would
        # otherwise re-raise at the NEXT unrelated dispatch (observed
        # 2026-08-20: the probe's vmem fault resurfaced inside UNet init).
        # Drain any pending error on a throwaway sync point so the caller's
        # subsequent XLA work starts clean.
        try:
            jax.block_until_ready(jnp.zeros((8,), jnp.float32) + 1.0)
        except Exception:
            pass
    _write_cache(key, result)
    return result


def kernel_enabled(env_var: str) -> bool:
    """Per-kernel gate: env "1" forces on, "0" forces off, unset -> probe."""
    flag = os.environ.get(env_var)
    if flag == "1":
        return True
    if flag == "0":
        return False
    return mosaic_native()
