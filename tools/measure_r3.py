"""Round-3 measurement sweep on the real TPU chip.

Runs the A/B experiments behind the round-3 perf work and records each
result incrementally to ``outputs/measure_r3.json``:

* optimizer variants at full 2.567B-param scale (resident chunks):
  per-leaf/rbg (round-2 baseline), per-leaf/hash, flat/hash, flat/rbg —
  quantifies the PRNG-materialisation traffic and per-leaf fragmentation.
* fwd+bwd configurations: batch-4 with chunked attention (the measured
  round-2 OOM case) under remat off / dots_nobatch / full, batch-1
  baselines with xla and chunked attention.

Usage (TPU, from the repo root):
    python tools/measure_r3.py [phase...]
Phases default to all of: opt b4 b1 extra

Do NOT set PYTHONPATH=/root/repo for TPU runs: the var propagates into the
axon plugin's compile-relay helper subprocess and breaks its imports, which
surfaces as "Unable to initialize backend 'axon'" (round-5 finding,
2026-08-20).  This script puts the repo on sys.path itself.
"""
from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

try:  # persistent compile cache: repeat runs skip remote compiles
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
except Exception:
    pass

OUT = "/root/repo/outputs/measure_r3.json"


def log(msg):
    print(f"[measure {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def record(key, value):
    data = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            data = json.load(f)
    data[key] = value
    with open(OUT, "w") as f:
        json.dump(data, f, indent=1)
    log(f"recorded {key} = {value}")


def bench_fwd_bwd_cfg(batch, remat, remat_policy, attn_impl, steps=10,
                      warmup=3, hw=128, **cfg_kw):
    from bench import bench_fwd_bwd
    from sdxl_training_improvements_tpu.models.unet import UNetConfig
    cfg = UNetConfig.sdxl(remat=remat, remat_policy=remat_policy,
                          attn_impl=attn_impl, **cfg_kw)
    return bench_fwd_bwd(cfg, batch, hw, steps, warmup)


OPT_VARIANTS = {
    # round-3c (Mosaic NATIVE): the fused Pallas kernel auto-engages via the
    # probe; the _xla variant forces it off for the A/B.  One variant per
    # PROCESS (the kernel gate is lru_cached at first use).
    "perleaf_hash_fused": dict(layout="per_leaf", noise="hash",
                               env={"SDXL_TPU_FUSED_ADAMW": "1"}),
    "perleaf_hash_xla": dict(layout="per_leaf", noise="hash",
                             env={"SDXL_TPU_FUSED_ADAMW": "0"}),
    "flat_hash": dict(layout="flat", noise="hash"),
    "perleaf_hash": dict(layout="per_leaf", noise="hash"),
    "flat_rbg": dict(layout="flat", noise="rbg"),
    "perleaf_rbg": dict(layout="per_leaf", noise="rbg"),
    "stacked_hash": dict(layout="stacked", noise="hash"),
    "stacked_rbg": dict(layout="stacked", noise="rbg"),
    # small leaves (<1M elements; 984 of 1680 leaves, 1.85% of params)
    # packed into one flat buffer, big leaves per-leaf
    "hybrid_hash": dict(layout="hybrid", noise="hash"),
    # 8-bit log-code moments (ops/quantize.py): 4 instead of 6 state
    # bytes/param — less HBM traffic vs extra dequant/quant compute
    "perleaf_int8_hash": dict(layout="per_leaf", noise="hash",
                              moments="int8"),
}


def phase_opt(which=None):
    """Optimizer A/B at full scale (3 resident chunks)."""
    from bench import bench_optimizer_full_scale
    from sdxl_training_improvements_tpu.models.unet import UNetConfig
    from sdxl_training_improvements_tpu.training.optimizers import adamw_bf16

    cfg = UNetConfig.sdxl()
    names = [which] if which else list(OPT_VARIANTS)
    for vname in names:
        kw = dict(OPT_VARIANTS[vname])
        os.environ.update(kw.pop("env", {}))
        name = f"opt_{vname}_ms"
        try:
            log(f"optimizer variant {name} ...")
            t, n = bench_optimizer_full_scale(
                cfg, 128, n_chunks=3,
                make_opt=lambda: adamw_bf16(lr=4e-7, weight_decay=0.01, **kw))
            record(name, round(t * 1e3, 2))
            record("opt_params", n)
        except Exception as e:
            traceback.print_exc()
            record(name, f"FAILED: {e!r}")


FWD_CASES = {
    "b4_dotsnobatch_chunked_ms": dict(batch=4, remat=True,
                                      remat_policy="dots_nobatch",
                                      attn_impl="chunked", steps=6, warmup=2),
    "b4_nomat_chunked_ms": dict(batch=4, remat=False, remat_policy="full",
                                attn_impl="chunked", steps=6, warmup=2),
    "b1_nomat_xla_ms": dict(batch=1, remat=False, remat_policy="full",
                            attn_impl="xla", steps=10, warmup=3),
    "b1_nomat_chunked_ms": dict(batch=1, remat=False, remat_policy="full",
                                attn_impl="chunked", steps=10, warmup=3),
    "b4_full_remat_xla_ms": dict(batch=4, remat=True, remat_policy="full",
                                 attn_impl="xla", steps=6, warmup=2),
    # round-3b: the auto-fit policy (save small non-batched dots only) —
    # dots_nobatch OOM'd by 2.6G at b4, full remat pays ~18% recompute
    "b4_dotssmall_chunked_ms": dict(batch=4, remat=True,
                                    remat_policy="dots_small",
                                    attn_impl="chunked", steps=6, warmup=2),
    "b4_full_remat_chunked_ms": dict(batch=4, remat=True, remat_policy="full",
                                     attn_impl="chunked", steps=6, warmup=2),
    "b1_dotssmall_chunked_ms": dict(batch=1, remat=True,
                                    remat_policy="dots_small",
                                    attn_impl="chunked", steps=10, warmup=3),
    # auto with a 512MB threshold: chunked only at the 64^2 stage (2.5GB
    # scores), monolithic at 32^2 (336MB) — avoids the double recompute
    # (remat + chunked VJP) where the probs transient is affordable
    "b4_dotssmall_auto512_ms": dict(batch=4, remat=True,
                                    remat_policy="dots_small",
                                    attn_impl="auto", steps=6, warmup=2,
                                    env={"SDXL_TPU_ATTN_CHUNK_MB": "512"}),
    # the exact production HLOs bench.py runs (auto = chunked self-attn +
    # monolithic cross-attn at the default 64MB threshold) — the numbers
    # for the bench rows, and they prime the persistent compile cache so
    # the driver's bench run skips the slow remote compiles
    "b4_dotssmall_auto_ms": dict(batch=4, remat=True,
                                 remat_policy="dots_small",
                                 attn_impl="auto", steps=6, warmup=2),
    "b1_nomat_auto_ms": dict(batch=1, remat=False, remat_policy="full",
                             attn_impl="auto", steps=10, warmup=3),
    # q-chunk-size A/B for the chunked path (DEFAULT_CHUNK sweep): larger
    # chunks = fewer scan steps / larger per-step matmuls, same total
    # logits traffic
    "b1_nomat_chunked_q1024_ms": dict(
        batch=1, remat=False, remat_policy="full", attn_impl="chunked",
        steps=10, warmup=3, env={"SDXL_TPU_ATTN_QCHUNK": "1024"}),
    "b1_nomat_chunked_q2048_ms": dict(
        batch=1, remat=False, remat_policy="full", attn_impl="chunked",
        steps=10, warmup=3, env={"SDXL_TPU_ATTN_QCHUNK": "2048"}),
    # round-3c: the Mosaic auto-probe flipped NATIVE on this chip
    # (2026-08-18) — the Pallas layer is finally measurable.  Run ONE of
    # these per process: the kernel gates (SDXL_TPU_FLASH/_FUSED_GN/
    # _FUSED_ADAMW/_MOSAIC) are lru_cached at first use, so an in-process
    # env swap would leak the first case's verdict into the rest.
    "b1_nomat_native_ms": dict(  # the exact default HLO bench.py now runs
        batch=1, remat=False, remat_policy="full", attn_impl="auto",
        steps=10, warmup=3),
    "b1_nomat_flash_gnoff_ms": dict(  # isolate the fused-GN contribution
        batch=1, remat=False, remat_policy="full", attn_impl="auto",
        steps=10, warmup=3, env={"SDXL_TPU_FUSED_GN": "0"}),
    "b1_nomat_gn_noflash_ms": dict(  # isolate the flash contribution
        batch=1, remat=False, remat_policy="full", attn_impl="auto",
        steps=10, warmup=3, env={"SDXL_TPU_FLASH": "0"}),
    "b4_nomat_native_ms": dict(  # the reference workload, no remat at all
        batch=4, remat=False, remat_policy="full", attn_impl="auto",
        steps=6, warmup=2),
    # round-3c: the large bucket (1536^2 images = 192^2 latents, S=9216
    # at the 64-ch attention stage) — the shape class where monolithic
    # attention cannot run fwd+bwd at all (6.8 GB fp32 scores, round-2
    # measurement) and where the chunked-vs-flash choice carries memory
    # stakes.  One case per process (kernel gates lru_cached).
    "b1_1536_native_ms": dict(  # production auto: chunked + fused GN
        batch=1, remat=False, remat_policy="full", attn_impl="auto",
        steps=6, warmup=2, hw=192),
    "b1_1536_flash_ms": dict(  # explicit flash everywhere + fused GN
        batch=1, remat=False, remat_policy="full", attn_impl="flash",
        steps=6, warmup=2, hw=192),
    # round-4 (verdict #3): dots_small + saved attention-core outputs —
    # the remat backward skips every attention fwd recompute, so all big
    # sites run the bounded-memory chunked path (auto threshold drops back
    # to 64 MB under this policy, models/unet.py)
    "b4_dotssmallattn_auto_ms": dict(
        batch=4, remat=True, remat_policy="dots_small_attn",
        attn_impl="auto", steps=6, warmup=2),
    "b4_dotssmallattn_auto512_ms": dict(  # monolithic deep sites kept
        batch=4, remat=True, remat_policy="dots_small_attn",
        attn_impl="auto", steps=6, warmup=2,
        env={"SDXL_TPU_ATTN_CHUNK_MB": "512"}),
    "b1_dotssmallattn_auto_ms": dict(
        batch=1, remat=True, remat_policy="dots_small_attn",
        attn_impl="auto", steps=10, warmup=3),
    # round-4: dots_small + size-thresholded named saves (res_conv/gn_silu/
    # attn_core) — removes the deep-stage conv + normalization recompute
    # for ~400 MB of extra bf16 saves; attention dispatch unchanged vs the
    # dots_small baseline (512 MB remat threshold)
    "b4_dotssmallconv_auto_ms": dict(
        batch=4, remat=True, remat_policy="dots_small_conv",
        attn_impl="auto", steps=6, warmup=2),
    "b1_dotssmallconv_auto_ms": dict(
        batch=1, remat=True, remat_policy="dots_small_conv",
        attn_impl="auto", steps=10, warmup=3),
    "b4_dotssmallconvwide_auto_ms": dict(
        batch=4, remat=True, remat_policy="dots_small_conv_wide",
        attn_impl="auto", steps=6, warmup=2),
    "b4_dotssmallconvmid_auto_ms": dict(
        batch=4, remat=True, remat_policy="dots_small_conv_mid",
        attn_impl="auto", steps=6, warmup=2),
    # round-4 follow-ups on the literal-row policy: keep the 64^2-stage
    # attention cores too (no attention fwd recompute at all, chunk rule
    # applies), and a 10M dot threshold (64^2-stage projections join saves)
    "b4_dotssmallconvattnwide_auto_ms": dict(
        batch=4, remat=True, remat_policy="dots_small_conv_attnwide",
        attn_impl="auto", steps=6, warmup=2),
    "b4_dotssmallconv10_auto_ms": dict(
        batch=4, remat=True, remat_policy="dots_small_conv10",
        attn_impl="auto", steps=6, warmup=2),
    # compose the round-4 literal-row winner (conv10, 1351.7 ms) with the
    # 512 MB chunk threshold that helped dots_small_attn (1371.7 vs
    # 1413.6): deep attention sites run monolithic in the remat recompute
    "b4_dotssmallconv10_auto512_ms": dict(
        batch=4, remat=True, remat_policy="dots_small_conv10",
        attn_impl="auto", steps=6, warmup=2,
        env={"SDXL_TPU_ATTN_CHUNK_MB": "512"}),
    # round-5: conv10 + 128^2-stage res_conv/gn_silu saves (fits only with
    # the bf16 norm interior freeing the save budget)
    "b4_dotssmallconv10_128_auto_ms": dict(
        batch=4, remat=True, remat_policy="dots_small_conv10_128",
        attn_impl="auto", steps=6, warmup=2),
    # round-5: with the bf16 norm interior the XLA GN path's residuals
    # shrank — does the fused (fp32-interior) Pallas GN still win?
    "b4_dotssmallconv10_nofgn_ms": dict(
        batch=4, remat=True, remat_policy="dots_small_conv10",
        attn_impl="auto", steps=6, warmup=2,
        env={"SDXL_TPU_FUSED_GN": "0"}),
    # round-5: the bf16-interior A/B partner for back-to-back runs (the
    # chip drifts ~5% across the day — cross-window deltas are unusable,
    # measure_r5_c.log 2026-08-20)
    "b4_dotssmallconv10_fp32norm_ms": dict(
        batch=4, remat=True, remat_policy="dots_small_conv10",
        attn_impl="auto", steps=6, warmup=2, norm_bf16_arith=False),
}


def run_fwd_case(name):
    kw = dict(FWD_CASES[name])
    env = kw.pop("env", {})
    saved = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        log(f"fwd+bwd {name} ...")
        t = bench_fwd_bwd_cfg(**kw)
        record(name, round(t * 1e3, 1))
    except Exception as e:
        traceback.print_exc()
        record(name, f"FAILED: {type(e).__name__}: {str(e)[:300]}")
    finally:
        for k, v in saved.items():  # don't leak into the next case
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def phase_b4():
    """The verdict case: batch 4 @1024^2 without full remat."""
    run_fwd_case("b4_dotsnobatch_chunked_ms")
    run_fwd_case("b4_nomat_chunked_ms")


def phase_b1():
    run_fwd_case("b1_nomat_xla_ms")
    run_fwd_case("b1_nomat_chunked_ms")


def phase_extra():
    run_fwd_case("b4_full_remat_xla_ms")


def phase_noise():
    """Micro-bench of noise-source candidates for the SR optimizer over
    2^28 elements, consumed by an xor-reduce.  The seed/key is a TRACED
    argument so nothing constant-folds.  Separates TPU int-multiply cost
    (emulated on the VPU) from the rng-bit-generator HLO (rbg impl) and
    threefry (jax's default key impl, int-multiply heavy)."""
    from sdxl_training_improvements_tpu.ops.stochastic import counter_noise
    n = 1 << 28

    def reduce(x):
        return jax.lax.reduce(x, jnp.uint32(0), jax.lax.bitwise_xor, (0,))

    def lowbias(seed):
        return reduce(counter_noise(seed, n))

    def xorshift(seed):
        x = jax.lax.iota(jnp.uint32, n) ^ seed
        x ^= x << 13; x ^= x >> 17; x ^= x << 5
        x ^= x << 7; x ^= x >> 11; x ^= x << 3
        x ^= x >> 16
        return reduce(x)

    def mul4(seed):
        x = jax.lax.iota(jnp.uint32, n) ^ seed
        for c in (0x9E3779B9, 0x85EBCA6B, 0xC2B2AE35, 0x27D4EB2F):
            x = x * jnp.uint32(c)
        return reduce(x)

    def rbg_bits2(key):
        raw = jax.random.bits(key, (2, n), jnp.uint32)
        return reduce(raw[0] ^ raw[1])

    def rbg_bits1(key):
        return reduce(jax.random.bits(key, (n,), jnp.uint32))

    import time as _t
    seed = jnp.uint32(3)
    cases = [("lowbias", lowbias, seed), ("xorshift", xorshift, seed),
             ("mul4", mul4, seed),
             ("rbg2", rbg_bits2, jax.random.key(0, impl="rbg")),
             ("rbg1", rbg_bits1, jax.random.key(0, impl="rbg")),
             ("threefry2", rbg_bits2, jax.random.key(0)),
             ]
    for name, fn, arg in cases:
        try:
            jf = jax.jit(fn)
            out = jf(arg); jax.block_until_ready(out)
            t0 = _t.perf_counter()
            for _ in range(5):
                out = jf(arg)
            jax.block_until_ready(out)
            record(f"noise_{name}_ms_per_2e28",
                   round((_t.perf_counter() - t0) / 5 * 1e3, 2))
        except Exception as e:
            record(f"noise_{name}_ms_per_2e28", f"FAILED: {e!r}")


SERVING_CASES = {
    # CFG-stacked rows: 2 = one image (latency case), 8 = four images
    # (throughput case).  Forward-only, no remat, production auto
    # attention dispatch.
    "serving_b2_ms": dict(batch=2, steps=10, warmup=3),
    "serving_b8_ms": dict(batch=8, steps=6, warmup=2),
    # round-3c fwd-only kernel A/B — one case per PROCESS (kernel gates
    # lru_cached; see FWD_CASES note).  Under the round-3c auto policy
    # (ops/attention.py) "auto" = chunked + fused GN when Mosaic is
    # native; flash must be requested per-case via attn=.
    "serving_b2_flash_ms": dict(batch=2, steps=10, warmup=3, attn="flash"),
    "serving_b2_flash_gnoff_ms": dict(batch=2, steps=10, warmup=3,
                                      attn="flash",
                                      env={"SDXL_TPU_FUSED_GN": "0"}),
    "serving_b2_gnoff_ms": dict(batch=2, steps=10, warmup=3,
                                env={"SDXL_TPU_FUSED_GN": "0"}),
    "serving_b2_slow_ms": dict(batch=2, steps=10, warmup=3,
                               env={"SDXL_TPU_MOSAIC": "slow"}),
}


def run_serving_case(name):
    from bench import bench_serving
    from sdxl_training_improvements_tpu.models.unet import UNetConfig
    kw = dict(SERVING_CASES[name])
    os.environ.update(kw.pop("env", {}))
    cfg = UNetConfig.sdxl(remat=False, attn_impl=kw.pop("attn", "auto"))
    try:
        log(f"serving {name} ...")
        t = bench_serving(cfg, 128, **kw)
        record(name, round(t * 1e3, 1))
        imgs = kw["batch"] / 2
        record(name.replace("_ms", "_images_per_s_28step"),
               round(imgs / (28 * t), 3))
    except Exception as e:
        traceback.print_exc()
        record(name, f"FAILED: {type(e).__name__}: {str(e)[:300]}")


def phase_serving():
    """Inference (serving) step: UNet forward at CFG batch, bf16, @1024^2.
    Also primes the compile cache for bench.py's serving section."""
    for name in SERVING_CASES:
        run_serving_case(name)


def phase_soap():
    """SOAP at SDXL scale: full-tree compile time + chunked step/refresh
    (verdict #7)."""
    from bench import bench_soap_full_scale
    from sdxl_training_improvements_tpu.models.unet import UNetConfig
    try:
        out = bench_soap_full_scale(UNetConfig.sdxl(), 128)
        for k, v in out.items():
            record(k, v)
    except Exception as e:
        traceback.print_exc()
        record("soap_step_ms", f"FAILED: {type(e).__name__}: {str(e)[:300]}")


def main():
    assert jax.default_backend() != "cpu", "this sweep must run on the TPU"
    log(f"devices: {jax.devices()}")
    phases = sys.argv[1:] or ["opt", "b4", "b1", "extra"]
    for p in phases:
        log(f"=== phase {p} ===")
        if p.startswith("opt:"):
            phase_opt(p.split(":", 1)[1])
            continue
        if p.startswith("fwd:"):
            run_fwd_case(p.split(":", 1)[1])
            continue
        if p.startswith("serving:"):
            run_serving_case(p.split(":", 1)[1])
            continue
        {"opt": phase_opt, "b4": phase_b4, "b1": phase_b1,
         "extra": phase_extra, "noise": phase_noise,
         "soap": phase_soap, "serving": phase_serving}[p]()
    log("done")


if __name__ == "__main__":
    main()
