"""Latent-cache precompute throughput (the BASELINE "latent-cache imgs/sec"
metric; reference rate/ETA logging at ``cache_manager.py:265-279``).

Generates N synthetic images, runs ``AspectBucketDataset.precompute``
through jitted encoders, and reports imgs/sec for the true-serial baseline
(``serial=True`` — the reference's decode->encode->write loop shape,
``/root/reference/src/data/dataset.py:403-492``) vs the 3-stage pipeline.

    python tools/bench_precompute.py --images 64 --size 512 [--real-vae]
    python tools/bench_precompute.py --images 64 --device-ms 40

``--device-ms F`` emulates a TPU-resident VAE encode: the encode stage
sleeps F ms per batch *without holding the GIL or a CPU core* — exactly the
host-side profile of a dispatched device computation.  This is how the
pipeline's overlap is demonstrable even on a 1-core host: the serial loop
pays decode + device + write in sum, the pipeline pays ~max(decode+write,
device).  On a multi-core TPU VM the same mechanism also overlaps decodes
with each other (N workers); that part genuinely needs >1 core to show.

Default uses the tiny VAE (CPU-runnable); --real-vae loads the full SDXL
VAE architecture (random weights — speed is weight-independent).
"""
from __future__ import annotations

import argparse
import shutil
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def make_images(root: Path, n: int, size: int) -> None:
    from PIL import Image
    rng = np.random.default_rng(0)
    for i in range(n):
        w = size if i % 3 else max(64, size // 2)
        arr = rng.integers(0, 255, (size, w, 3), dtype=np.uint8)
        Image.fromarray(arr).save(root / f"img{i:04d}.jpg", quality=92)
        (root / f"img{i:04d}.txt").write_text(f"test caption {i}, quality")


def run(n_images: int, size: int, workers, real_vae: bool, batch: int,
        device_ms: float = 0.0) -> dict:
    import jax
    import jax.numpy as jnp
    from sdxl_training_improvements_tpu.config import Config
    from sdxl_training_improvements_tpu.data.buckets import (
        supported_dims_buckets)
    from sdxl_training_improvements_tpu.data.cache import CacheManager
    from sdxl_training_improvements_tpu.data.dataset import (
        AspectBucketDataset)
    from sdxl_training_improvements_tpu.data.paths import (
        load_data_from_directory)
    from sdxl_training_improvements_tpu.models.vae import (
        AutoencoderKL, VAEConfig)

    img_dir = Path(tempfile.mkdtemp(prefix="precompute_bench_img_"))
    make_images(img_dir, n_images, size)

    cfg = Config()
    cfg.data.train_data_dir = [str(img_dir)]
    cfg.global_config.image.supported_dims = [
        [size, size], [size // 2, size], [size, size // 2]]
    cfg.global_config.image.min_size = [64, 64]
    cfg.global_config.image.max_size = [size, size]
    cfg.global_config.image.target_size = [size, size]

    # 4-stage config -> SDXL's 8x spatial reduction, so mid-block attention
    # stays small at real image sizes (the 2-stage tiny config would put
    # 64k tokens through attention at 512^2)
    vcfg = VAEConfig.sdxl() if real_vae else VAEConfig(
        block_out_channels=(16, 16, 32, 32), layers_per_block=1,
        norm_num_groups=8)
    vae = AutoencoderKL(vcfg)
    f = vcfg.downscale_factor
    vparams = vae.init(jax.random.key(0),
                       jnp.zeros((1, 3, f * 8, f * 8)), jax.random.key(1))
    encode = jax.jit(lambda px, key: vae.apply(vparams, px, key,
                                               method=vae.encode))
    key_holder = {"k": jax.random.key(0)}

    if device_ms:
        # Pure emulated device encode: main thread blocks device_ms per
        # batch (the host-side profile of waiting on a dispatched device
        # computation) and returns shape-correct zeros.  The real tiny
        # VAE is useless for the overlap A/B on a 1-core host: its jitted
        # encode is CPU-bound on XLA's own threads and jax's async
        # dispatch already hides any main-thread wait in BOTH arms.
        def enc_i(px):
            time.sleep(device_ms / 1e3)
            b, _, h, w = px.shape
            return np.zeros((b, 4, h // 8, w // 8), np.float32)
    else:
        def enc_i(px):
            key_holder["k"], k = jax.random.split(key_holder["k"])
            return encode(jnp.asarray(px, jnp.float32), k)

    def enc_p(caps):
        return {"prompt_embeds": np.zeros((len(caps), 77, 64), np.float32),
                "pooled_prompt_embeds": np.zeros((len(caps), 32), np.float32)}

    results = {}
    paths, captions = load_data_from_directory(cfg.data.train_data_dir)
    # warm the per-bucket-shape executables so neither timed run pays
    # XLA compilation
    warm_dir = Path(tempfile.mkdtemp(prefix="precompute_bench_warm_"))
    ds = AspectBucketDataset(cfg, paths, captions, CacheManager(warm_dir),
                             buckets=supported_dims_buckets(cfg))
    ds.precompute(enc_i, enc_p, batch_size=batch, num_workers=2)
    shutil.rmtree(warm_dir, ignore_errors=True)
    for label, kw in (("serial", dict(serial=True)),
                      ("parallel", dict(num_workers=workers))):
        cache_dir = Path(tempfile.mkdtemp(prefix=f"precompute_bench_{label}_"))
        cm = CacheManager(cache_dir)
        ds = AspectBucketDataset(cfg, paths, captions, cm,
                                 buckets=supported_dims_buckets(cfg))
        ds.precompute(enc_i, enc_p, batch_size=batch, **kw)
        results[label] = ds.last_precompute_stats
        shutil.rmtree(cache_dir, ignore_errors=True)
    shutil.rmtree(img_dir, ignore_errors=True)
    return results


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--images", type=int, default=64)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--workers", type=int, default=None)
    p.add_argument("--real-vae", action="store_true")
    p.add_argument("--device-ms", type=float, default=0.0,
                   help="emulate a device-resident encode: sleep this many "
                        "ms per batch in the encode stage (host CPU free)")
    args = p.parse_args()
    import os
    workers = args.workers or min(16, os.cpu_count() or 4)
    res = run(args.images, args.size, workers, args.real_vae, args.batch,
              device_ms=args.device_ms)
    import json
    speedup = (res["parallel"]["images_per_sec"]
               / max(res["serial"]["images_per_sec"], 1e-9))
    print(json.dumps({
        "images": args.images, "size": args.size, "workers": workers,
        "device_ms": args.device_ms,
        "serial_imgs_per_sec": round(res["serial"]["images_per_sec"], 2),
        "parallel_imgs_per_sec": round(res["parallel"]["images_per_sec"], 2),
        "speedup": round(speedup, 2),
        # stage seconds of the parallel arm: the single-core bound is
        # decode-dominated when stage_decode_cpu_s >> stage_encode_device_s
        "stages": {k: v for k, v in res["parallel"].items()
                   if k.startswith("stage_")},
        "stages_serial": {k: v for k, v in res["serial"].items()
                          if k.startswith("stage_")}}))


if __name__ == "__main__":
    main()
