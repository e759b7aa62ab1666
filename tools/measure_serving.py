"""Measure the serving section of bench.py on the real chip (round-3
verdict item #9): CFG inference step at 1024^2, bf16, plus the DeepCache
shallow step — records images/s for Euler-28, DPM-Solver++(2M)-14 and
DeepCache k=2/3, and primes the shared persistent compile cache so
``SDXL_BENCH_SERVING=1 python bench.py`` skips the remote compiles.

Reference serving surface this measures against: the single-GPU diffusers
pipeline (``/root/reference/src/models/sdxl.py:188-198``).

Usage: python tools/measure_serving.py   (real chip; do NOT force CPU)
"""
import json
import time
from pathlib import Path

import jax

REPO = Path(__file__).resolve().parent.parent
OUT = REPO / "outputs" / "serving_r4.json"


def main():
    try:  # persistent compile cache shared with bench.py
        jax.config.update("jax_compilation_cache_dir",
                          str(REPO / ".jax_cache_tpu"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:
        pass
    import sys
    sys.path.insert(0, str(REPO))
    from bench import bench_serving
    from sdxl_training_improvements_tpu.models.unet import UNetConfig

    dev = jax.devices()[0]
    print(f"[serving] device: {dev.device_kind}", flush=True)
    mkcfg = UNetConfig.sdxl
    hw = 128  # 1024^2 -> 128^2 latents

    res = {"device": str(dev.device_kind), "hw_latent": hw,
           "ts": time.strftime("%Y-%m-%d %H:%M:%S")}
    t_full_1img = None
    for sname, sbatch in (("latency_1img_cfg2", 2),
                          ("throughput_4img_cfg8", 8)):
        t0 = time.perf_counter()
        print(f"[serving] {sname} (batch {sbatch}) ...", flush=True)
        t_s = bench_serving(mkcfg(remat=False, attn_impl="auto"), hw,
                            sbatch, steps=6, warmup=2)
        if sbatch == 2:
            t_full_1img = t_s
        res[sname] = {
            "unet_fwd_ms": round(t_s * 1e3, 1),
            "images_per_s_28step": round((sbatch / 2) / (28 * t_s), 3),
            "images_per_s_dpmpp2m_14step": round(
                (sbatch / 2) / (14 * t_s), 3),
            "wall_s": round(time.perf_counter() - t0, 1)}
        print(f"[serving] {sname}: {res[sname]}", flush=True)

    t0 = time.perf_counter()
    print("[serving] deepcache shallow (batch 2) ...", flush=True)
    t_sh = bench_serving(mkcfg(remat=False, attn_impl="auto"), hw, 2,
                         steps=6, warmup=2, deep_cache=True)
    entry = {"unet_shallow_ms": round(t_sh * 1e3, 1),
             "wall_s": round(time.perf_counter() - t0, 1)}
    if t_full_1img:
        for k in (2, 3):
            t_eff = (t_full_1img + (k - 1) * t_sh) / k
            entry[f"images_per_s_28step_k{k}"] = round(1.0 / (28 * t_eff), 3)
            entry[f"images_per_s_dpmpp2m_14step_k{k}"] = round(
                1.0 / (14 * t_eff), 3)
        entry["shallow_speedup_vs_full"] = round(t_full_1img / t_sh, 2)
    res["deepcache_1img_cfg2"] = entry
    print(f"[serving] deepcache: {entry}", flush=True)

    OUT.parent.mkdir(parents=True, exist_ok=True)
    OUT.write_text(json.dumps(res, indent=1))
    print(f"[serving] wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
