"""Verify a diffusers-layout SDXL checkpoint maps cleanly onto this
framework's models BEFORE committing to a training run.

    python tools/verify_checkpoint.py /path/to/stable-diffusion-xl-base-1.0

For every component directory present (unet/, vae/, text_encoder/,
text_encoder_2/) this loads the safetensors state dict and runs the
bijective key/shape audit (``models.weights.check_bijective``): any
checkpoint key that would be silently ignored, any model param that would
stay at random init, or any shape mismatch is reported and exits non-zero.
This is the operational version of ``tests/test_weight_parity.py``'s
manifest tests, against a real checkpoint on disk.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def verify(model_dir: Path, tiny: bool = False) -> int:
    import jax
    import jax.numpy as jnp
    from sdxl_training_improvements_tpu.models import weights as W
    from sdxl_training_improvements_tpu.models.sdxl import SDXLModel

    model = SDXLModel.create(tiny=tiny)
    failures = 0

    def report(name, template, state):
        nonlocal failures
        try:
            missing, unused = W.check_bijective(template, state)
        except ValueError as e:  # shape mismatch
            print(f"[{name}] FAIL: {e}")
            failures += 1
            return
        if missing or unused:
            failures += 1
            print(f"[{name}] FAIL: {len(missing)} model params unfilled, "
                  f"{len(unused)} checkpoint keys ignored")
            for k in missing[:5]:
                print(f"    missing: {k}")
            for k in unused[:5]:
                print(f"    unused:  {k}")
        else:
            n = len(jax.tree_util.tree_leaves(template))
            print(f"[{name}] OK: {n} tensors map bijectively")

    checks = []
    if (model_dir / "unet").exists():
        ucfg = model.unet.config
        tmpl = jax.eval_shape(lambda: model.unet.init(
            jax.random.key(0), jnp.zeros((1, ucfg.in_channels, 16, 16)),
            jnp.zeros((1,)), jnp.zeros((1, 77, ucfg.cross_attention_dim)),
            jnp.zeros((1, ucfg.pooled_embed_dim)), jnp.zeros((1, 6))))
        checks.append(("unet", tmpl,
                       W.load_safetensors_dir(model_dir / "unet")))
    if (model_dir / "vae").exists():
        tmpl = jax.eval_shape(lambda: model.vae.init(
            jax.random.key(0), jnp.zeros((1, 3, 64, 64)), jax.random.key(0)))
        checks.append(("vae", tmpl,
                       W.load_safetensors_dir(model_dir / "vae")))
    for sub, mod, name in (("text_encoder", model.clip_l, "clip_l"),
                           ("text_encoder_2", model.clip_g, "clip_g")):
        if (model_dir / sub).exists():
            tmpl = jax.eval_shape(lambda m=mod: m.init(
                jax.random.key(0), jnp.zeros((1, 77), jnp.int32)))
            state = W._clip_hf_to_local(
                W.load_safetensors_dir(model_dir / sub))
            state.pop("position_ids", None)
            checks.append((name, tmpl, state))

    if not checks:
        print(f"no component directories found under {model_dir}")
        return 2
    for name, tmpl, state in checks:
        report(name, tmpl, state)
    return 1 if failures else 0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("model_dir", type=Path)
    p.add_argument("--tiny", action="store_true",
                   help="check against the tiny test topology instead")
    args = p.parse_args()
    sys.exit(verify(args.model_dir, tiny=args.tiny))


if __name__ == "__main__":
    main()
