"""Test harness: force the CPU backend with 8 virtual devices.

This replaces the reference's untestable torchrun path (SURVEY.md §4): mesh /
shard_map tests run against 8 fake CPU devices so the full multi-device
sharding story is exercised without a TPU pod.

The environment may pin JAX_PLATFORMS to a hardware plugin (e.g. a tunneled
TPU) — tests must override it *forcibly*, before any backend initializes, or
every tiny test compile would round-trip through the device tunnel.
"""
import os

# Opt-in real-hardware mode: SDXL_TPU_SMOKE=1 skips the CPU override so
# `SDXL_TPU_SMOKE=1 pytest tests/test_tpu_smoke.py` exercises the TPU-only
# branches (donation, device_memory_stats, profiler, Pallas dispatch).
# Run ONLY that file in this mode — the full suite on a tunneled TPU is a
# 100x slowdown.
TPU_SMOKE = os.environ.get("SDXL_TPU_SMOKE") == "1"

if not TPU_SMOKE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not TPU_SMOKE:
    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_num_cpu_devices", 8)
    except Exception:
        pass  # older jax: XLA_FLAGS above covers it

# Persistent compilation cache: the tiny-model train steps cost 30-150s of
# XLA CPU compile each; caching them makes repeat suite runs minutes faster.
#
# Guard: XLA:CPU AOT results embed the *compiling* machine's CPU features
# and are loaded on a feature-mismatched host with only a warning — observed
# to execute and return wrong numerics after this dev VM changed CPU types
# (a LoRA step silently became a no-op).  Fingerprint the host in the cache
# dir and wipe stale entries instead of trusting them.
_CACHE_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache"))


def _host_fingerprint() -> str:
    import hashlib
    try:
        with open("/proc/cpuinfo") as f:
            flags = sorted({ln.split(":", 1)[1].strip()
                            for ln in f if ln.startswith("flags")})
    except OSError:
        import platform
        flags = [platform.processor(), platform.machine()]
    return hashlib.sha256("|".join(flags).encode()).hexdigest()[:16]


def _validate_cache_host(cache_dir: str) -> None:
    import shutil
    fp_file = os.path.join(cache_dir, "HOST_FINGERPRINT")
    fp = _host_fingerprint()
    try:
        with open(fp_file) as f:
            if f.read().strip() == fp:
                return
        shutil.rmtree(cache_dir)
    except FileNotFoundError:
        if os.path.isdir(cache_dir) and os.listdir(cache_dir):
            shutil.rmtree(cache_dir)  # pre-fingerprint cache: provenance unknown
    os.makedirs(cache_dir, exist_ok=True)
    with open(fp_file, "w") as f:
        f.write(fp)


_validate_cache_host(_CACHE_DIR)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    if TPU_SMOKE:
        return
    # Fail fast if the override did not take: running the unit suite over a
    # remote-TPU tunnel is a silent 100x slowdown.
    assert jax.default_backend() == "cpu", (
        f"tests must run on CPU, got {jax.default_backend()}")
    assert jax.device_count() >= 8, "expected 8 virtual CPU devices"


@pytest.fixture
def rng():
    return np.random.default_rng(0)
