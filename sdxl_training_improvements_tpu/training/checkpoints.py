"""Checkpointing: Orbax training state + diffusers-layout safetensors export.

Capability surface of the reference ``save_checkpoint``
(``sdxl_trainer.py:162-210`` + ``sdxl.py:246-288``) — diffusers-format model
export, optimizer state, config.json — plus the resume path the reference
lacks entirely (SURVEY.md §5.4: "Save-only; there is no resume path"):
Orbax checkpoints carry {params, opt_state, step, rng} and ``--resume``
restores them exactly.

Layout of a checkpoint directory::

    checkpoint-0010/
      state/            # Orbax (params, opt_state, step, rng)
      unet/diffusion_pytorch_model.safetensors   # diffusers interchange
      vae/..., text_encoder/..., text_encoder_2/...   (when params present)
      config.json       # full framework config
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from sdxl_training_improvements_tpu.models import weights as W


# --------------------------------------------------------------- orbax state
# Long-lived async machinery.  ``ocp.StandardCheckpointer`` IS an
# AsyncCheckpointer: ``save`` returns once device arrays are snapshotted to
# host memory and commits (tmp-dir rename) on a background thread — training
# continues while the bytes hit disk.  The reference's torch.save blocked the
# step loop for the full write (``sdxl_trainer.py:162-210``).  One module
# singleton (orbax serializes one save at a time per checkpointer) plus a
# 1-thread pool for the host-side diffusers/safetensors writes.
_ASYNC_CKPTR: Optional[ocp.StandardCheckpointer] = None
_EXPORT_POOL = None
_PENDING_EXPORTS: list = []


def _async_checkpointer() -> ocp.StandardCheckpointer:
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.StandardCheckpointer()
    return _ASYNC_CKPTR


def _export_pool():
    global _EXPORT_POOL
    if _EXPORT_POOL is None:
        from concurrent.futures import ThreadPoolExecutor
        _EXPORT_POOL = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="ckpt-export")
    return _EXPORT_POOL


def wait_for_saves() -> None:
    """Block until every in-flight async save is durable: the Orbax state
    commit (tmp-dir rename) and any background diffusers-export writes.
    Re-raises background failures loudly.  Safe with nothing pending."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()
    global _PENDING_EXPORTS
    pending, _PENDING_EXPORTS = _PENDING_EXPORTS, []
    for fut in pending:
        fut.result()


def save_train_state(ckpt_dir, state, config=None, blocking=True) -> None:
    """Save TrainState (params/opt_state/step/rng) with Orbax.

    ``blocking=False`` (``tpu.async_checkpointing``): returns as soon as the
    state is snapshotted to host memory; the disk commit runs on Orbax's
    background thread (multi-host: finalization barriers ride the
    coordination service on that thread).  Mutating/donating the device
    state after return is safe.  The ``state/`` directory only appears on
    commit (tmp-dir rename), so ``latest_checkpoint`` never sees a torn
    save.  Call :func:`wait_for_saves` before reading the checkpoint back
    or exiting the process."""
    ckpt_dir = Path(ckpt_dir).absolute()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    if blocking:
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(ckpt_dir / "state", _jax_state(state), force=True)
    else:
        ckptr = _async_checkpointer()
        ckptr.wait_until_finished()  # at most one state save in flight
        ckptr.save(ckpt_dir / "state", _jax_state(state), force=True)
    if config is not None:
        (ckpt_dir / "config.json").write_text(
            json.dumps(config.to_dict(), indent=2, default=str))


def restore_train_state(ckpt_dir, template_state):
    """Restore into the shapes/dtypes/shardings of ``template_state``."""
    wait_for_saves()  # a just-issued async save of this dir must commit first
    ckpt_dir = Path(ckpt_dir).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(ckpt_dir / "state",
                                 _jax_state(template_state))
    return template_state._replace(**restored) if hasattr(
        template_state, "_replace") else restored


def _jax_state(state) -> dict:
    """TrainState -> plain dict for Orbax (keys stable across versions)."""
    if hasattr(state, "_asdict"):
        return dict(state._asdict())
    return dict(state)


def latest_checkpoint(output_dir) -> Optional[Path]:
    """Most recently WRITTEN checkpoint under output_dir (--resume auto).

    Selected by state-dir mtime, not by name: a fixed name-based preference
    (e.g. final_checkpoint last) can silently roll a resumed run back to a
    stale state when newer numbered checkpoints exist from a later,
    extended run."""
    output_dir = Path(output_dir)
    if not output_dir.exists():
        return None
    candidates = list(output_dir.glob("checkpoint-*"))
    for name in ("final_checkpoint", "best_checkpoint"):
        if (output_dir / name).exists():
            candidates.append(output_dir / name)
    with_state = [c for c in candidates if (c / "state").exists()]
    if not with_state:
        return None
    return max(with_state, key=lambda c: (c / "state").stat().st_mtime)


def _tree_to_host(tree):
    """Device trees -> host numpy, collective-safe: non-fully-addressable
    leaves (multi-host sharded OR replicated arrays) are gathered with a
    process_allgather, which every process must enter."""
    def gather(x):
        if hasattr(x, "is_fully_addressable") and not x.is_fully_addressable:
            from jax.experimental import multihost_utils
            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
        return np.asarray(x)
    return jax.tree.map(gather, tree)


# ------------------------------------------------------- diffusers interchange
def export_diffusers(ckpt_dir, model_params: dict, config=None,
                     scheduler_config: Optional[dict] = None,
                     unet_config=None, blocking=True) -> None:
    """Write diffusers-layout safetensors for every component present in
    ``model_params`` ({unet, vae, clip_l, clip_g}) — reference
    ``save_pretrained`` (``sdxl.py:246-288``).

    ``unet_config`` (a ``UNetConfig``) additionally writes
    ``unet/config.json`` (``UNetConfig.to_diffusers_config``) so diffusers
    can load the export directly and our own loaders rebuild variant
    topologies (refiner / inpainting) from the checkpoint alone.

    Collective-safe: on multi-host runs CALL THIS ON EVERY PROCESS — the
    shard gather below is a collective; only rank 0 writes files.

    ``blocking=False``: the gather (collective, and the point where device
    arrays become immutable host copies) still runs inline; only the rank-0
    safetensors writes move to a background thread.  :func:`wait_for_saves`
    joins them and re-raises failures."""
    ckpt_dir = Path(ckpt_dir)
    hosted = {k: _tree_to_host(v) for k, v in model_params.items()}
    if jax.process_index() != 0:
        return  # gather done; writing is rank-0's job
    if blocking:
        _write_diffusers(ckpt_dir, hosted, config, scheduler_config,
                         unet_config)
    else:
        _PENDING_EXPORTS.append(_export_pool().submit(
            _write_diffusers, ckpt_dir, hosted, config, scheduler_config,
            unet_config))


def _write_diffusers(ckpt_dir, model_params, config, scheduler_config,
                     unet_config) -> None:
    """Host-side file writes for :func:`export_diffusers` (rank 0 only;
    ``model_params`` is already gathered numpy)."""
    if "unet" in model_params:
        W.save_unet(model_params["unet"],
                    ckpt_dir / "unet" / "diffusion_pytorch_model.safetensors")
        if unet_config is not None:
            (ckpt_dir / "unet" / "config.json").write_text(
                json.dumps(unet_config.to_diffusers_config(), indent=2))
    if "vae" in model_params:
        W.save_vae(model_params["vae"],
                   ckpt_dir / "vae" / "diffusion_pytorch_model.safetensors")
    if "clip_l" in model_params:
        W.save_clip(model_params["clip_l"],
                    ckpt_dir / "text_encoder" / "model.safetensors")
    if "clip_g" in model_params:
        W.save_clip(model_params["clip_g"],
                    ckpt_dir / "text_encoder_2" / "model.safetensors",
                    with_projection=True)
    if scheduler_config is not None:
        sdir = ckpt_dir / "scheduler"
        sdir.mkdir(parents=True, exist_ok=True)
        (sdir / "scheduler_config.json").write_text(
            json.dumps(scheduler_config, indent=2))
    if config is not None:
        (ckpt_dir / "config.json").write_text(
            json.dumps(config.to_dict(), indent=2, default=str))


def export_lora(ckpt_dir, lora_tree: dict, rank: int, alpha: float,
                prefix: str = "unet") -> Path:
    """Write the LoRA tree as ``pytorch_lora_weights.safetensors`` in the
    diffusers/peft key layout: ``unet.<module>.lora_A.weight`` [r, in] /
    ``lora_B.weight`` [out, r] (torch Linear layout), plus a
    ``lora_config.json`` sidecar.

    Scaling convention: this framework's delta is ``alpha * down @ up``;
    peft consumers compute ``(lora_alpha / r) * B @ A`` and, absent a
    config, assume scaling 1.0.  For interoperability alpha is FOLDED into
    the exported ``lora_B`` and the sidecar declares ``lora_alpha == r``
    (scaling exactly 1.0) — every consumer then reproduces the trained
    delta regardless of its alpha handling, and the adapter matches the
    merged ``unet/`` exported alongside it.

    Tree keys are flax param paths ("params/<mods>/kernel" with down [in,r],
    up [r,out]) as produced by ``models.lora.lora_init``.  Conv adapters
    (down [kh,kw,in,r]) use the peft Conv2d layout: ``lora_A.weight``
    [r,in,kh,kw] (an r-filter conv) and ``lora_B.weight`` [out,r,1,1]
    (the 1x1 mixing conv).
    """
    ckpt_dir = Path(ckpt_dir)
    lora_tree = _tree_to_host(lora_tree)  # collective on multi-host
    out = ckpt_dir / "pytorch_lora_weights.safetensors"
    if jax.process_index() != 0:
        return out
    state = {}
    for path, pair in lora_tree.items():
        mods = [p for p in path.split("/") if p not in ("params", "kernel")]
        hf = ".".join(W._flax_seg_to_hf(m) for m in mods)
        down = np.asarray(pair["down"])
        up = np.asarray(pair["up"], np.float32) * alpha
        if down.ndim == 4:  # conv: HWIr -> torch rIHW / up -> [out,r,1,1]
            state[f"{prefix}.{hf}.lora_A.weight"] = down.transpose(3, 2, 0, 1)
            state[f"{prefix}.{hf}.lora_B.weight"] = up.T[:, :, None, None]
        else:
            state[f"{prefix}.{hf}.lora_A.weight"] = down.T
            state[f"{prefix}.{hf}.lora_B.weight"] = up.T
    W.save_safetensors(state, out)
    (ckpt_dir / "lora_config.json").write_text(json.dumps(
        {"r": rank, "lora_alpha": rank, "base": prefix,
         "note": "alpha folded into lora_B; apply with scaling 1.0"},
        indent=2))
    return out


def import_lora(path, base_params, prefix: str = "unet") -> dict:
    """Inverse of ``export_lora``: safetensors -> flax LoRA tree.

    The returned pairs carry the fold-in from export (alpha baked into
    ``up``), so apply them with ``alpha=1.0``.

    ``base_params`` (the UNet param tree) supplies the flax path for each
    exported module — hf dots don't encode flax segment boundaries, so the
    mapping is template-driven like ``hf_to_flax_params``.
    """
    from safetensors.numpy import load_file
    from sdxl_training_improvements_tpu.models.lora import _flat
    state = load_file(str(path))
    # hf module string -> flax kernel path, for every kernel in the model
    reverse = {}
    for flax_path in _flat(base_params):
        if not flax_path.endswith("/kernel"):
            continue
        mods = [p for p in flax_path.split("/")
                if p not in ("params", "kernel")]
        reverse[".".join(W._flax_seg_to_hf(m) for m in mods)] = flax_path
    tree: dict = {}
    skipped = []
    for k, v in state.items():
        if not k.endswith((".lora_A.weight", ".lora_B.weight")):
            continue
        mods, which = k.rsplit(".lora_", 1)
        if not mods.startswith(prefix + "."):
            # standard diffusers LoRA files can also carry text_encoder.*
            # adapters — skip foreign prefixes, report once below
            skipped.append(k)
            continue
        mods = mods[len(prefix) + 1:]
        flax_path = reverse.get(mods)
        if flax_path is None:
            raise KeyError(f"LoRA key {k!r} matches no kernel in the model")
        pair = tree.setdefault(flax_path, {})
        if which.startswith("A"):
            # conv lora_A [r,in,kh,kw] -> down [kh,kw,in,r]
            pair["down"] = v.transpose(2, 3, 1, 0) if v.ndim == 4 else v.T
        else:
            # conv lora_B [out,r,1,1] -> up [r,out].  Only a 1x1 up kernel
            # maps onto this adapter's factorization (spatial taps live in
            # lora_A) — a third-party adapter with a wider lora_B would be
            # silently truncated otherwise (ADVICE round-4)
            if v.ndim == 4 and v.shape[2:] != (1, 1):
                raise ValueError(
                    f"LoRA key {k!r} has a {v.shape[2]}x{v.shape[3]} "
                    "lora_B kernel; only 1x1 up-projections are supported "
                    "(spatial taps belong in lora_A)")
            pair["up"] = v[:, :, 0, 0].T if v.ndim == 4 else v.T
    if skipped:
        import logging
        logging.getLogger(__name__).warning(
            "import_lora: skipped %d non-%r adapter keys (e.g. %s)",
            len(skipped), prefix, skipped[0])
    # a file carrying only one half of a pair would otherwise surface as an
    # opaque KeyError at merge/apply time — validate completeness here
    incomplete = sorted(p for p, pair in tree.items()
                        if set(pair) != {"down", "up"})
    if incomplete:
        raise ValueError(
            f"LoRA file {path} is missing lora_A or lora_B for "
            f"{len(incomplete)} module(s): {incomplete[:5]}"
            + (" ..." if len(incomplete) > 5 else ""))
    return tree


def import_diffusers(model, model_dir, dtype=None) -> dict:
    """Load component params from a diffusers-layout directory into the
    SDXLModel's param dict (components present on disk only)."""
    model_dir = Path(model_dir)
    params: dict = {}

    import jax.numpy as jnp
    if (model_dir / "unet").exists():
        ucfg = model.unet.config
        tmpl = jax.eval_shape(
            lambda: model.unet.init(
                jax.random.key(0),
                jnp.zeros((1, ucfg.in_channels, 16, 16)), jnp.zeros((1,)),
                jnp.zeros((1, 77, ucfg.cross_attention_dim)),
                jnp.zeros((1, ucfg.pooled_embed_dim)),
                jnp.zeros((1, ucfg.num_time_ids))))
        params["unet"] = W.load_unet_params(tmpl, model_dir / "unet",
                                            dtype=dtype)
    if (model_dir / "vae").exists():
        tmpl = jax.eval_shape(
            lambda: model.vae.init(jax.random.key(0),
                                   jnp.zeros((1, 3, 64, 64)),
                                   jax.random.key(0)))
        params["vae"] = W.load_vae_params(tmpl, model_dir / "vae")
    if (model_dir / "text_encoder").exists() and model.clip_l is not None:
        tmpl = jax.eval_shape(
            lambda: model.clip_l.init(jax.random.key(0),
                                      jnp.zeros((1, 77), jnp.int32)))
        params["clip_l"] = W.load_clip_params(tmpl, model_dir / "text_encoder")
    if (model_dir / "text_encoder_2").exists():
        tmpl = jax.eval_shape(
            lambda: model.clip_g.init(jax.random.key(0),
                                      jnp.zeros((1, 77), jnp.int32)))
        params["clip_g"] = W.load_clip_params(tmpl,
                                              model_dir / "text_encoder_2")
    return params
