"""LoRA adapters as functional param-tree transforms.

Counterpart of the reference ``LoRAModuleWrapper`` (``src/models/adapters/
lora.py:11-56``): per-layer low-rank residual ``out = base(x) +
alpha * up(down(x))`` with down ~ N(0, 1/rank) and up = 0 — expressed the
JAX way: a *LoRA tree* (one {down, up} pair per targeted kernel) merged into
the base params before the jitted forward.  Merging is a rank-r matmul per
layer, fused by XLA into the step; training optimizes only the LoRA tree.

The reference never wires its LoRA into the trainer (defect ledger); here
``lora_train_wrappers`` produces (trainable_lora, apply_fn) that drop
straight into ``make_train_step``.

``extend_token_embedding`` covers the reference's
``AdditionalEmbeddingWrapper`` (``lora.py:58-98``): extra trainable token
rows appended to a frozen CLIP token embedding (textual inversion).
"""
from __future__ import annotations

import re
from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

DEFAULT_TARGETS = (r"attn\d/(to_q|to_k|to_v|to_out_0)",)


def _flat(params):
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return {"/".join(str(getattr(k, "key", k)) for k in path): v
            for path, v in flat}


def lora_init(params, rng: jax.Array, rank: int = 4,
              targets: Sequence[str] = DEFAULT_TARGETS,
              dtype=jnp.float32) -> Dict[str, Dict[str, jnp.ndarray]]:
    """LoRA tree for every 2-D kernel whose path matches a target regex.

    down ~ N(0, 1/rank) [in, r]; up = 0 [r, out] (reference init,
    ``lora.py:26-33``) — so the initial delta is exactly zero.
    """
    patterns = [re.compile(t) for t in targets]
    tree: Dict[str, Dict[str, jnp.ndarray]] = {}
    for path, v in _flat(params).items():
        if not path.endswith("/kernel") or v.ndim != 2:
            continue
        if not any(p.search(path) for p in patterns):
            continue
        rng, k = jax.random.split(rng)
        d_in, d_out = v.shape
        tree[path] = {
            "down": (jax.random.normal(k, (d_in, rank), dtype)
                     / jnp.sqrt(jnp.asarray(rank, dtype))),
            "up": jnp.zeros((rank, d_out), dtype),
        }
    if not tree:
        raise ValueError(f"no kernels matched LoRA targets {list(targets)}")
    return tree


def lora_merge(params, lora_tree: Dict[str, Dict[str, jnp.ndarray]],
               alpha: float = 1.0):
    """Base params + alpha * down@up, per targeted kernel."""
    flat_paths = lora_tree.keys()

    def walk(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            path = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                out[k] = walk(v, path)
            elif path in flat_paths:
                lp = lora_tree[path]
                delta = (lp["down"].astype(jnp.float32)
                         @ lp["up"].astype(jnp.float32)) * alpha
                out[k] = (v.astype(jnp.float32) + delta).astype(v.dtype)
            else:
                out[k] = v
        return out

    return walk(params)


def lora_train_wrappers(base_params, unet_apply: Callable, rng: jax.Array,
                        rank: int = 4, alpha: float = 1.0,
                        targets: Sequence[str] = DEFAULT_TARGETS
                        ) -> Tuple[dict, Callable]:
    """(lora_params, apply_fn) where apply_fn(lora_params, *args) runs the
    UNet with merged weights — the trainable tree is the LoRA tree only."""
    lora_params = lora_init(base_params, rng, rank=rank, targets=targets)

    def apply_fn(lora_tree, *args, **kwargs):
        merged = lora_merge(base_params, lora_tree, alpha=alpha)
        return unet_apply(merged, *args, **kwargs)

    return lora_params, apply_fn


# ------------------------------------------------------------- embeddings

def extend_token_embedding(clip_params, rng: jax.Array, num_new_tokens: int):
    """Append trainable rows to the (frozen) token embedding; returns
    (new_params, first_new_token_id).  New rows are initialised from the
    embedding distribution (reference ``AdditionalEmbeddingWrapper``)."""
    def walk(tree):
        out = {}
        for k, v in tree.items():
            if k == "token_embedding" and isinstance(v, dict) \
                    and "embedding" in v:
                emb = v["embedding"]
                std = jnp.std(emb.astype(jnp.float32))
                new = jax.random.normal(
                    rng, (num_new_tokens, emb.shape[1]),
                    jnp.float32) * std
                out[k] = {"embedding": jnp.concatenate(
                    [emb, new.astype(emb.dtype)], axis=0)}
            elif isinstance(v, dict):
                out[k] = walk(v)
            else:
                out[k] = v
        return out

    def find_vocab(tree):
        for k, v in tree.items():
            if k == "token_embedding" and isinstance(v, dict):
                return v["embedding"].shape[0]
            if isinstance(v, dict):
                n = find_vocab(v)
                if n:
                    return n
        return None

    vocab = find_vocab(clip_params)
    return walk(clip_params), vocab
