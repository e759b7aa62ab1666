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
    """LoRA tree for every Dense/Conv kernel whose path matches a target
    regex — the reference wraps both ``nn.Linear`` and ``nn.Conv2d``
    (``lora.py:11-23``).

    Dense kernels [in, out]: down ~ N(0, 1/rank) [in, r]; up = 0 [r, out]
    (reference init, ``lora.py:26-33``) — so the initial delta is exactly
    zero.  Conv kernels [kh, kw, in, out] keep the spatial taps on the down
    factor: down [kh, kw, in, r] (a rank-r conv), up [r, out] (the 1x1
    mixing conv peft uses for Conv2d adapters).
    """
    patterns = [re.compile(t) for t in targets]
    tree: Dict[str, Dict[str, jnp.ndarray]] = {}
    for path, v in _flat(params).items():
        if not path.endswith("/kernel") or v.ndim not in (2, 4):
            continue
        if not any(p.search(path) for p in patterns):
            continue
        rng, k = jax.random.split(rng)
        d_out = v.shape[-1]
        down_shape = v.shape[:-1] + (rank,)
        tree[path] = {
            "down": (jax.random.normal(k, down_shape, dtype)
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
                # Dense: [in,r]@[r,out]; Conv: [kh,kw,in,r]x[r,out] over the
                # rank axis -> a full [kh,kw,in,out] kernel delta
                delta = jnp.tensordot(
                    lp["down"].astype(jnp.float32),
                    lp["up"].astype(jnp.float32), axes=[[-1], [0]]) * alpha
                out[k] = (v.astype(jnp.float32) + delta).astype(v.dtype)
            else:
                out[k] = v
        return out

    return walk(params)


def _dropout_interceptor(lora_tree, alpha: float, dropout: float,
                         rng: jax.Array, matched: set):
    """flax method interceptor adding the LoRA branch with real input
    dropout to every targeted Dense: ``out = base(x) +
    alpha * (dropout(x) @ down) @ up`` — the reference branch semantics
    (``lora.py:24,49-52``), impossible to express by weight merging."""
    from flax import linen as nn
    import zlib
    keep = 1.0 - dropout

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if (type(mod) not in (nn.Dense, nn.Conv)
                or context.method_name != "__call__"):
            return next_fun(*args, **kwargs)
        path = "params/" + "/".join(mod.path) + "/kernel"
        pair = lora_tree.get(path)
        if pair is None:
            return next_fun(*args, **kwargs)
        matched.add(path)
        x = args[0]
        key = jax.random.fold_in(rng, zlib.crc32(path.encode()))
        mask = jax.random.bernoulli(key, keep, x.shape)
        xd = jnp.where(mask, x.astype(jnp.float32) / keep, 0.0)
        down = pair["down"].astype(jnp.float32)
        if down.ndim == 2:
            h = xd @ down
        else:
            # conv adapter: rank-r conv with the module's own geometry
            # (NHWC inputs, HWIO kernels), then the 1x1 `up` mix below
            nd = down.ndim - 2

            def _tup(v, default=1):
                if v is None:
                    v = default
                return (v,) * nd if isinstance(v, int) else tuple(v)

            pad = mod.padding
            if isinstance(pad, int):
                pad = [(pad, pad)] * nd
            elif (isinstance(pad, (list, tuple)) and pad
                  and isinstance(pad[0], int)):
                pad = [(p, p) for p in pad]
            h = jax.lax.conv_general_dilated(
                xd, down,
                window_strides=_tup(mod.strides),
                padding=pad,
                rhs_dilation=_tup(mod.kernel_dilation),
                feature_group_count=mod.feature_group_count,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        delta = h @ pair["up"].astype(jnp.float32) * alpha
        out = next_fun(*args, **kwargs)
        return out + delta.astype(out.dtype)

    return interceptor


def lora_train_wrappers(base_params, unet_apply: Callable, rng: jax.Array,
                        rank: int = 4, alpha: float = 1.0,
                        targets: Sequence[str] = DEFAULT_TARGETS,
                        dropout: float = 0.0, module=None
                        ) -> Tuple[dict, Callable]:
    """(lora_params, apply_fn) where apply_fn(lora_params, *args) runs the
    UNet with the LoRA adaptation — the trainable tree is the LoRA tree only.

    Two execution paths:
    * merge path (dropout off, or no step rng supplied -> eval): base +
      alpha*down@up folded into the kernels, one rank-r matmul per layer,
      fused by XLA into the step;
    * branch path (``dropout > 0`` and ``rng=`` passed): flax method
      interception adds ``alpha * up(down(dropout(x)))`` at each targeted
      Dense — requires ``module`` (the flax UNet) to apply against.

    Threading note: ``apply_fn`` accepts ``base_params=`` to override the
    closed-over frozen tree.  The train step MUST use it (``make_train_step
    (..., const_params=base)`` threads the base tree as a real jit argument)
    — a closure-captured 2.567B tree is embedded into the lowered module as
    5.14 GB of constants (observed 2026-08-20: the full-scale compile
    payload never finished through the remote-compile relay), and constants
    also cannot ride ``tpu.shard_params``'s ZeRO sharding.  The closure
    default remains for eval/sampling convenience paths.
    """
    lora_params = lora_init(base_params, rng, rank=rank, targets=targets)
    if dropout > 0.0 and module is None:
        raise ValueError("LoRA dropout needs module= (the flax UNet) for "
                         "branch-mode application")

    def apply_fn(lora_tree, *args, rng=None, base_params=None, **kwargs):
        base = base_params if base_params is not None else _closure_base
        if dropout > 0.0 and rng is not None:
            from flax import linen as nn
            matched: set = set()
            with nn.intercept_methods(_dropout_interceptor(
                    lora_tree, alpha, dropout, rng, matched)):
                out = module.apply(base, *args, **kwargs)
            missing = set(lora_tree) - matched
            if missing:
                raise ValueError(
                    f"{len(missing)} LoRA pairs never reached a Dense during "
                    f"apply (path mismatch), e.g. {sorted(missing)[:3]}")
            return out
        merged = lora_merge(base, lora_tree, alpha=alpha)
        return unet_apply(merged, *args, **kwargs)

    _closure_base = base_params

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
