"""Text-to-image CLI over ``SDXLPipeline``.

The reference only exposes inference programmatically
(``create_pipeline``, ``src/models/sdxl.py:188-198``); this gives the
trained checkpoint a direct command-line surface:

    python -m sdxl_training_improvements_tpu.generate \
        --model outputs/final_checkpoint \
        --prompt "a photograph of an astronaut riding a horse" \
        --steps 28 --guidance 5.0 --out samples/
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="sdxl-tpu-generate",
        description="Sample images from a diffusers-layout SDXL checkpoint")
    p.add_argument("--model", required=True,
                   help="diffusers-layout checkpoint directory")
    p.add_argument("--prompt", action="append", required=True,
                   help="prompt (repeatable for a batch)")
    p.add_argument("--negative", action="append", default=None,
                   help="negative prompt (repeat to match --prompt count)")
    p.add_argument("--height", type=int, default=1024)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--steps", type=int, default=28)
    p.add_argument("--guidance", type=float, default=5.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--method", choices=["auto", "ddpm", "flow_matching"],
                   default="auto",
                   help="sampler family; auto reads training.method from "
                        "the checkpoint's config.json")
    p.add_argument("--out", default="samples")
    p.add_argument("--tiny", action="store_true",
                   help="tiny test topology (CI smoke)")
    p.add_argument("--mesh", default=None, metavar="DATA,FSDP,TENSOR",
                   help="serve over a device mesh, e.g. 4,1,2: the UNet is "
                        "megatron-TP-split over the tensor axis and the "
                        "CFG batch sharded over data x fsdp")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from PIL import Image
    from sdxl_training_improvements_tpu.pipelines import SDXLPipeline

    method = None if args.method == "auto" else args.method
    mesh = None
    if args.mesh:
        from sdxl_training_improvements_tpu.parallel import mesh as M
        try:
            shape = [int(s) for s in args.mesh.split(",")]
        except ValueError:
            shape = []
        if len(shape) != 3:
            raise SystemExit(f"--mesh wants 3 comma-separated sizes "
                             f"(data,fsdp,tensor), got {args.mesh!r}")
        mesh = M.create_mesh(shape)
    pipe = SDXLPipeline.from_pretrained(args.model, tiny=args.tiny,
                                        method=method, mesh=mesh)
    print(f"sampler method: {pipe.method}")
    images = pipe(args.prompt, height=args.height, width=args.width,
                  num_inference_steps=args.steps,
                  guidance_scale=args.guidance, seed=args.seed,
                  negative_prompts=args.negative)
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    for i, img in enumerate(images):
        path = out_dir / f"{i:03d}.png"
        Image.fromarray(img).save(path)
        print(path)
    return 0


def cli() -> None:
    sys.exit(main())


if __name__ == "__main__":
    cli()
