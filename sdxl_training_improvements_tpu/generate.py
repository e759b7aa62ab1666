"""Image-generation CLI over ``SDXLPipeline``.

The reference only exposes inference programmatically
(``create_pipeline``, ``src/models/sdxl.py:188-198``); this gives the
trained checkpoint a direct command-line surface:

    # text -> image
    python -m sdxl_training_improvements_tpu.generate \
        --model outputs/final_checkpoint \
        --prompt "a photograph of an astronaut riding a horse" \
        --steps 28 --guidance 5.0 --out samples/

    # img2img (edit an existing image)
    ... --init photo.png --strength 0.35

    # inpainting (9-channel inpainting checkpoint)
    ... --init photo.png --mask mask.png

    # two-stage base -> refiner ensemble
    ... --refiner /path/to/refiner_checkpoint --denoising-frac 0.8

    # serialize the text2img program for deployment (jax.export), then
    # serve it without retracing (see aot.py)
    ... --export-aot artifacts/sdxl_28step
    ... --aot artifacts/sdxl_28step
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
    p.add_argument("--init", action="append", default=None, metavar="IMAGE",
                   help="img2img init image (repeat to match --prompt "
                        "count; resized to --height x --width)")
    p.add_argument("--strength", type=float, default=None,
                   help="edit strength in (0, 1]; defaults to 0.35 for "
                        "img2img, 1.0 (full repaint) for inpainting")
    p.add_argument("--mask", action="append", default=None, metavar="IMAGE",
                   help="inpainting mask (white = repaint); requires --init "
                        "and a 9-channel inpainting checkpoint")
    p.add_argument("--refiner", default=None, metavar="DIR",
                   help="refiner checkpoint for the two-stage "
                        "base->refiner ensemble")
    p.add_argument("--denoising-frac", type=float, default=0.8,
                   help="fraction of the sigma walk done by the base model "
                        "before the refiner takes over")
    p.add_argument("--aesthetic-score", type=float, default=6.0)
    p.add_argument("--sampler", choices=["euler", "dpmpp_2m"],
                   default="euler",
                   help="sigma-space integration rule: euler (reference "
                        "ZTSNR walk) or dpmpp_2m (2nd-order multistep — "
                        "same quality in ~half the steps; try --steps 14)")
    p.add_argument("--deep-cache", type=int, default=1, metavar="K",
                   help="DeepCache interval: refresh the deep UNet feature "
                        "every K steps and run only the shallow stages "
                        "between (skips ~90%% of SDXL FLOPs on cached "
                        "steps; 1 = off, 2-3 = typical)")
    p.add_argument("--export-aot", default=None, metavar="DIR",
                   help="instead of sampling, serialize the text2img "
                        "program (jax.export) to DIR as a deployment "
                        "artifact: batch = number of --prompt flags, "
                        "resolution/steps/sampler from the other flags "
                        "(see aot.py)")
    p.add_argument("--aot-platforms", default="tpu,cpu",
                   help="comma-separated lowering targets for --export-aot")
    p.add_argument("--aot", default=None, metavar="DIR",
                   help="run text2img through a previously exported AOT "
                        "artifact (with --model supplying the weights); "
                        "incompatible with img2img/inpaint/refiner/--mesh")
    return p


def _load_images(paths, height, width):
    import numpy as np
    from PIL import Image
    out = []
    for path in paths:
        img = Image.open(path).convert("RGB")
        if img.size != (width, height):
            img = img.resize((width, height), Image.LANCZOS)
        out.append(np.asarray(img, dtype=np.uint8))
    return out


def _load_masks(paths, height, width):
    import numpy as np
    from PIL import Image
    out = []
    for path in paths:
        img = Image.open(path).convert("L")
        if img.size != (width, height):
            img = img.resize((width, height), Image.NEAREST)
        out.append((np.asarray(img) > 127).astype(np.uint8))
    return out


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
    if args.mask and not args.init:
        raise SystemExit("--mask requires --init (the image to repaint)")
    if args.aot:
        if args.init or args.mask or args.refiner or args.mesh:
            raise SystemExit("--aot serves the exported text2img program "
                             "only (no img2img/inpaint/refiner/--mesh)")
        from sdxl_training_improvements_tpu.aot import AOTPipeline
        aot = AOTPipeline.from_pretrained(args.aot, args.model,
                                          tiny=args.tiny)
        # steps/resolution/sampler/deep-cache are STATIC in an AOT artifact;
        # refuse an explicitly-passed flag that disagrees with the artifact
        # rather than silently dropping it (round-3 advisor finding).
        # "Explicitly passed" is detected by re-parsing argv with SUPPRESS
        # defaults (absent flags then simply don't appear), NOT by comparing
        # against parser defaults — a user who explicitly passes the default
        # value against an artifact baked with a different one must get the
        # conflict error too (ADVICE round-4).
        import argparse as _argparse
        sentinel = build_parser()
        for action in sentinel._actions:
            action.default = _argparse.SUPPRESS
            action.required = False
        explicitly_passed = vars(sentinel.parse_args(argv))
        static = {"steps": "num_inference_steps", "height": "height",
                  "width": "width", "sampler": "sampler",
                  "deep_cache": "deep_cache"}
        for flag, meta_key in static.items():
            passed = getattr(args, flag)
            baked = aot.meta.get(meta_key)
            if flag in explicitly_passed and passed != baked:
                raise SystemExit(
                    f"--{flag.replace('_', '-')}={passed} conflicts with the "
                    f"AOT artifact ({meta_key}={baked} is static in the "
                    "exported program); drop the flag or re-export")
        images = aot(args.prompt, negative_prompts=args.negative,
                     seed=args.seed, guidance_scale=args.guidance)
        out_dir = Path(args.out)
        out_dir.mkdir(parents=True, exist_ok=True)
        for i, img in enumerate(images):
            path = out_dir / f"{i:03d}.png"
            Image.fromarray(img).save(path)
            print(path)
        return 0
    pipe = SDXLPipeline.from_pretrained(args.model, tiny=args.tiny,
                                        method=method, mesh=mesh,
                                        sampler=args.sampler,
                                        deep_cache=args.deep_cache)
    print(f"sampler method: {pipe.method} ({args.sampler}"
          + (f", deep-cache {args.deep_cache}" if args.deep_cache > 1
             else "") + ")")
    if args.export_aot:
        from sdxl_training_improvements_tpu.aot import export_text2img
        art = export_text2img(
            pipe, args.export_aot, batch=len(args.prompt),
            height=args.height, width=args.width,
            num_inference_steps=args.steps, guidance_scale=args.guidance,
            aesthetic_score=args.aesthetic_score,
            platforms=tuple(s for s in args.aot_platforms.split(",") if s))
        print(f"AOT artifact written to {art}")
        return 0
    if args.mask:
        inits = _load_images(args.init, args.height, args.width)
        masks = _load_masks(args.mask, args.height, args.width)
        images = pipe.inpaint(args.prompt, inits, masks,
                              strength=(1.0 if args.strength is None
                                        else args.strength),
                              num_inference_steps=args.steps,
                              guidance_scale=args.guidance, seed=args.seed,
                              negative_prompts=args.negative)
    elif args.init:
        inits = _load_images(args.init, args.height, args.width)
        images = pipe.img2img(args.prompt, images=inits,
                              strength=(0.35 if args.strength is None
                                        else args.strength),
                              num_inference_steps=args.steps,
                              guidance_scale=args.guidance, seed=args.seed,
                              negative_prompts=args.negative,
                              aesthetic_score=args.aesthetic_score)
    elif args.refiner:
        noisy = pipe(args.prompt, height=args.height, width=args.width,
                     num_inference_steps=args.steps,
                     guidance_scale=args.guidance, seed=args.seed,
                     negative_prompts=args.negative,
                     denoising_end=args.denoising_frac)
        refiner = SDXLPipeline.from_pretrained(args.refiner, tiny=args.tiny,
                                               mesh=mesh,
                                               sampler=args.sampler,
                                               deep_cache=args.deep_cache)
        print(f"refining from denoising fraction {args.denoising_frac}")
        images = refiner.refine(args.prompt, noisy,
                                denoising_start=args.denoising_frac,
                                num_inference_steps=args.steps,
                                guidance_scale=args.guidance, seed=args.seed,
                                negative_prompts=args.negative,
                                aesthetic_score=args.aesthetic_score)
    else:
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
