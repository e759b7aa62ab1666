"""CLIP text encoders (CLIP-L and CLIP-G) as flax.linen modules.

Replaces the reference's transformers-backed dual encoding
(``src/models/encoders/clip.py``).  The encoding contract is preserved
exactly (``clip.py:61-91``):

* per-encoder: tokenize to max_length=77 (pad+truncate), run with hidden
  states, take the **penultimate layer hidden state** (``prompt_embeds[-1][-2]``)
  — note: *not* final-layer-normed;
* pooled embeds come from encoder-2's projected EOS pooled output
  (``pooled_prompt_embeds = prompt_embeds[0]`` of the second encoder);
* concat penultimate states on the feature dim → [B, 77, 2048].

Architecture (standard CLIP text transformer): token+position embeddings,
pre-LN residual blocks with causal self-attention, final LN; CLIP-L uses
quick-gelu, CLIP-G gelu with a linear text projection for the pooled output.
Param names mirror HF (text_model/encoder/layers_i/...) for weight mapping.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from sdxl_training_improvements_tpu.models.layers import LayerNormF32


@dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    max_position_embeddings: int = 77
    intermediate_size: Optional[int] = None  # default 4*hidden
    hidden_act: str = "quick_gelu"  # quick_gelu | gelu
    projection_dim: Optional[int] = None  # set for CLIPTextModelWithProjection
    eos_token_id: int = 49407

    @classmethod
    def clip_l(cls) -> "CLIPTextConfig":
        """openai/clip-vit-large-patch14 text tower (SDXL text_encoder)."""
        return cls()

    @classmethod
    def clip_g(cls) -> "CLIPTextConfig":
        """laion OpenCLIP bigG text tower (SDXL text_encoder_2, w/ projection)."""
        return cls(hidden_size=1280, num_layers=32, num_heads=20,
                   hidden_act="gelu", projection_dim=1280)

    @classmethod
    def tiny(cls, projection: bool = False) -> "CLIPTextConfig":
        return cls(vocab_size=1000, hidden_size=32, num_layers=3, num_heads=4,
                   hidden_act="gelu", projection_dim=32 if projection else None)

    @property
    def mlp_dim(self) -> int:
        return self.intermediate_size or 4 * self.hidden_size


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name == "gelu":
        # HF "gelu" is the exact erf GELU (transformers GELUActivation),
        # not flax's default tanh approximation
        return lambda x: nn.gelu(x, approximate=False)
    raise ValueError(f"Unknown activation: {name}")


class CLIPAttention(nn.Module):
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        d = x.shape[-1]
        hd = d // self.num_heads
        dense = lambda n: nn.Dense(d, dtype=self.dtype,
                                   param_dtype=self.param_dtype, name=n)
        b, s, _ = x.shape
        q = dense("q_proj")(x).reshape(b, s, self.num_heads, hd)
        k = dense("k_proj")(x).reshape(b, s, self.num_heads, hd)
        v = dense("v_proj")(x).reshape(b, s, self.num_heads, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * (hd ** -0.5)
        logits = jnp.where(mask, logits, jnp.float32(-1e9))
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        return dense("out_proj")(out.reshape(b, s, d).astype(x.dtype))


class CLIPEncoderLayer(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        h = LayerNormF32(name="layer_norm1")(x)
        x = x + CLIPAttention(self.cfg.num_heads, self.dtype, self.param_dtype,
                              name="self_attn")(h, mask)
        h = LayerNormF32(name="layer_norm2")(x)
        h = nn.Dense(self.cfg.mlp_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="mlp_fc1")(h)
        h = _act(self.cfg.hidden_act)(h)
        h = nn.Dense(self.cfg.hidden_size, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="mlp_fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    """Returns (hidden_states per layer, last LN'd state, pooled output)."""

    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids):
        cfg = self.cfg
        b, s = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       name="token_embedding")(input_ids)
        pos = self.param("position_embedding",
                         nn.initializers.normal(0.01),
                         (cfg.max_position_embeddings, cfg.hidden_size),
                         self.param_dtype)
        x = tok + pos[None, :s, :].astype(tok.dtype)

        causal = jnp.tril(jnp.ones((s, s), dtype=bool))[None, None, :, :]
        hidden_states = [x]
        for i in range(cfg.num_layers):
            x = CLIPEncoderLayer(cfg, self.dtype, self.param_dtype,
                                 name=f"layers_{i}")(x, causal)
            hidden_states.append(x)

        last = LayerNormF32(name="final_layer_norm")(x)

        # EOS pooling: position of the eos token (highest id in CLIP vocab,
        # same argmax trick HF uses so padding doesn't matter).
        eos_pos = jnp.argmax(input_ids, axis=-1)
        pooled = last[jnp.arange(b), eos_pos]
        if cfg.projection_dim is not None:
            pooled = nn.Dense(cfg.projection_dim, use_bias=False,
                              dtype=self.dtype, param_dtype=self.param_dtype,
                              name="text_projection")(pooled)
        return {"hidden_states": hidden_states, "last_hidden_state": last,
                "pooled_output": pooled}


def encode_dual(clip_l: CLIPTextModel, params_l, clip_g: CLIPTextModel,
                params_g, input_ids_l: jnp.ndarray, input_ids_g: jnp.ndarray,
                clip_skip: int = 1):
    """The reference's dual-encoder contract (``clip.py:61-91``): concat
    penultimate hidden states [B,77,768+1280=2048]; pooled from encoder 2.

    ``clip_skip=1`` selects ``hidden_states[-2]`` (penultimate); larger values
    skip more layers (capability surface of ``models/base.py:129-143``).
    """
    out_l = clip_l.apply(params_l, input_ids_l)
    out_g = clip_g.apply(params_g, input_ids_g)
    idx = -(1 + clip_skip)
    prompt_embeds = jnp.concatenate(
        [out_l["hidden_states"][idx], out_g["hidden_states"][idx]], axis=-1)
    return {"prompt_embeds": prompt_embeds,
            "pooled_prompt_embeds": out_g["pooled_output"]}


def encode_g(clip_g: CLIPTextModel, params_g, input_ids_g: jnp.ndarray,
             clip_skip: int = 1):
    """Single-encoder (CLIP-G) conditioning — the SDXL *refiner* contract:
    prompt embeds are the penultimate hidden states of text_encoder_2 alone
    [B,77,1280]; pooled is its projected EOS embedding.  (The refiner
    checkpoint ships no text_encoder/ or tokenizer/ for CLIP-L.)"""
    out_g = clip_g.apply(params_g, input_ids_g)
    idx = -(1 + clip_skip)
    return {"prompt_embeds": out_g["hidden_states"][idx],
            "pooled_prompt_embeds": out_g["pooled_output"]}
