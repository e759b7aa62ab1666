"""Capture a jax.profiler trace of a training fwd+bwd step and print the
per-HLO-op time breakdown (top-k by self time).

The round-5 perf question (VERDICT #5): where do the literal-recipe
batch-4 @1024^2 milliseconds actually go?  The remat-policy surface is
measured flat around 1350 ms (docs/performance.md round-4 table), so
further blind knob-turning is noise — this tool gets the op-level truth
from the hardware so the next lever is chosen from data.

Usage (TPU):
    python tools/profile_step.py --batch 4 --remat dots_small_conv10
    python tools/profile_step.py --batch 1 --no-remat   # headline HLO

Writes the raw trace under outputs/profile_<case>/ and prints:
* total device time over the captured steps,
* top-30 HLO ops by self time with category, shape hint, and % of total,
* per-category rollup (fusion / convolution / dot / copy / all-reduce ...).

Analysis rides xprof / tensorboard_plugin_profile (both in the image);
the raw .xplane.pb stays on disk for tensorboard inspection.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def capture(case: str, batch: int, remat: bool, remat_policy: str,
            attn_impl: str, hw: int, steps: int) -> str:
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache_tpu")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:
        pass
    from bench import bench_fwd_bwd  # reuse the exact bench HLO
    from sdxl_training_improvements_tpu.models.unet import UNetConfig

    out_dir = f"/root/repo/outputs/profile_{case}"
    os.makedirs(out_dir, exist_ok=True)

    # bench_fwd_bwd warms up and times; wrap its timed region in a trace by
    # monkey-patching time_fn's loop is invasive — instead rebuild the same
    # closure here via bench internals: call once for warmup/compile, then
    # trace a few steps.
    cfg = UNetConfig.sdxl(remat=remat, remat_policy=remat_policy,
                          attn_impl=attn_impl)
    import bench as B

    # one timed call warms the executable (bench_fwd_bwd compiles + runs)
    t = B.bench_fwd_bwd(cfg, batch, hw, steps=2, warmup=1)
    print(f"[profile] warm step: {t*1e3:.1f} ms", flush=True)

    # re-run with the profiler around the steady-state loop
    import jax.profiler
    jax.profiler.start_trace(out_dir)
    t = B.bench_fwd_bwd(cfg, batch, hw, steps=steps, warmup=0)
    jax.profiler.stop_trace()
    print(f"[profile] traced {steps} steps at {t*1e3:.1f} ms/step "
          f"-> {out_dir}", flush=True)
    return out_dir


def find_xplane(out_dir: str) -> str:
    paths = sorted(glob.glob(
        os.path.join(out_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime)
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {out_dir}")
    return paths[-1]


def analyze(xplane: str, top: int = 30) -> dict:
    """Per-op rollup via the tensorboard profile plugin's converters."""
    tool_data = None
    errors = []
    for modname in ("xprof.convert.raw_to_tool_data",
                    "tensorboard_plugin_profile.convert.raw_to_tool_data"):
        try:
            import importlib
            m = importlib.import_module(modname)
            tool_data, _ = m.xspace_to_tool_data([xplane], "hlo_stats", {})
            break
        except Exception as e:  # try the next provider
            errors.append(f"{modname}: {e!r}")
    if tool_data is None:
        raise RuntimeError("no converter worked: " + "; ".join(errors))

    if isinstance(tool_data, bytes):
        tool_data = tool_data.decode("utf-8", "replace")
    # hlo_stats emits a JSON-ish gviz table or CSV depending on version
    rows = []
    try:
        data = json.loads(tool_data)
        cols = [c.get("label", c.get("id", "")) for c in data["cols"]]
        for r in data["rows"]:
            rows.append({cols[i]: (cell or {}).get("v")
                         for i, cell in enumerate(r["c"])})
    except Exception:
        import csv
        import io
        for r in csv.DictReader(io.StringIO(tool_data)):
            rows.append(dict(r))
    return {"rows": rows}


def summarize(rows, top=30):
    """Columns as emitted by xprof's hlo_stats (verified 2026-08-20):
    'HLO op category', 'HLO op name', 'HLO op text', '#Occurrences',
    'Total self time (us)', 'Bound by', 'Measured memory BW (GiB/s)',
    '%time stalled by DMA', 'Model GFLOP/s', 'Rematerialization'."""
    def f(r, key, default=0.0):
        try:
            return float(r.get(key) or default)
        except (TypeError, ValueError):
            return default

    for r in rows:
        r["_self_us"] = f(r, "Total self time (us)")
    total = sum(r["_self_us"] for r in rows) or 1.0
    rows.sort(key=lambda r: -r["_self_us"])
    cats = {}
    for r in rows:
        cat = str(r.get("HLO op category") or "?")
        c = cats.setdefault(cat, dict(us=0.0, bw=0.0, flops=0.0, n=0))
        c["us"] += r["_self_us"]
        c["bw"] += f(r, "Measured memory BW (GiB/s)") * r["_self_us"]
        c["flops"] += f(r, "Model GFLOP/s") * r["_self_us"]
        c["n"] += int(f(r, "#Occurrences"))
    print(f"\n== category rollup (total {total/1e3:.1f} ms of op time) ==")
    for cat, c in sorted(cats.items(), key=lambda kv: -kv[1]["us"]):
        print(f"  {cat:<30} {c['us']/1e3:9.2f} ms {100*c['us']/total:5.1f}%"
              f"  n={c['n']:<5} avgBW={c['bw']/max(c['us'],1e-9):7.1f} GiB/s"
              f"  avg={c['flops']/max(c['us'],1e-9):7.1f} GFLOP/s")
    print(f"\n== top {top} ops by self time ==")
    for r in rows[:top]:
        name = str(r.get("HLO op name") or "")[:80]
        cat = str(r.get("HLO op category") or "")
        text = str(r.get("HLO op text") or "")[:140]
        print(f"  {r['_self_us']/1e3:8.2f} ms {100*r['_self_us']/total:5.1f}%"
              f" [{cat}] {name} n={int(f(r, '#Occurrences'))}"
              f" bw={f(r, 'Measured memory BW (GiB/s)'):.0f}GiB/s"
              f" bound={r.get('Bound by')}"
              f" remat={r.get('Rematerialization')}\n      {text}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--remat", default="dots_small_conv10",
                    help="remat policy name, or 'off'")
    ap.add_argument("--attn", default="auto")
    ap.add_argument("--hw", type=int, default=128)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--analyze-only", default=None,
                    help="skip capture; analyze this profile dir")
    args = ap.parse_args()

    if args.analyze_only:
        out_dir = args.analyze_only
    else:
        case = f"b{args.batch}_{args.remat}_{args.attn}"
        out_dir = capture(case, args.batch, args.remat != "off",
                          "full" if args.remat == "off" else args.remat,
                          args.attn, args.hw, args.steps)
    xplane = find_xplane(out_dir)
    print(f"[profile] analyzing {xplane}")
    res = analyze(xplane, args.top)
    summarize(res["rows"], args.top)


if __name__ == "__main__":
    main()
