"""Dtype policy for the framework (JAX analogue of reference ``src/core/types.py``).

The reference maps string dtype names to torch dtypes via a ``DataType`` enum
and carries a per-component ``ModelWeightDtypes`` record (``types.py:7-118``).
Here the same surface maps onto ``jnp`` dtypes, and the mixed-precision policy
is expressed the JAX way: a ``Policy`` describing param / compute / output
dtypes that the model modules consult.
"""
from __future__ import annotations

import enum
from dataclasses import dataclass

import jax.numpy as jnp


class DataType(enum.Enum):
    FLOAT_32 = "float32"
    FLOAT_16 = "float16"
    BFLOAT_16 = "bfloat16"

    @classmethod
    def from_str(cls, name: str) -> "DataType":
        key = name.strip().lower()
        aliases = {
            "fp32": cls.FLOAT_32, "float32": cls.FLOAT_32, "float": cls.FLOAT_32,
            "no": cls.FLOAT_32, "none": cls.FLOAT_32,
            "fp16": cls.FLOAT_16, "float16": cls.FLOAT_16, "half": cls.FLOAT_16,
            "bf16": cls.BFLOAT_16, "bfloat16": cls.BFLOAT_16,
        }
        if key not in aliases:
            raise ValueError(f"Unknown dtype name: {name!r}")
        return aliases[key]

    def to_jnp(self):
        return {
            DataType.FLOAT_32: jnp.float32,
            DataType.FLOAT_16: jnp.float16,
            DataType.BFLOAT_16: jnp.bfloat16,
        }[self]


@dataclass(frozen=True)
class Policy:
    """Mixed-precision policy threaded through model modules."""

    param_dtype: object = jnp.float32
    compute_dtype: object = jnp.bfloat16
    output_dtype: object = jnp.bfloat16

    @classmethod
    def from_mixed_precision(cls, mixed_precision: str) -> "Policy":
        """Map the reference ``training.mixed_precision`` string to a policy.

        ``bf16`` reproduces the reference's pure-bf16 regime (params converted
        to bf16 before training, ``sdxl_trainer.py:42-55``): bf16 params +
        bf16 compute, with the stochastic-rounding optimizer recovering the
        lost precision.
        """
        ct = DataType.from_str(mixed_precision).to_jnp()
        if ct == jnp.float32:
            return cls(jnp.float32, jnp.float32, jnp.float32)
        return cls(param_dtype=ct, compute_dtype=ct, output_dtype=ct)


@dataclass(frozen=True)
class ModelWeightDtypes:
    """Per-component weight dtypes (reference ``types.py:40-118``)."""

    unet: DataType = DataType.BFLOAT_16
    text_encoder: DataType = DataType.BFLOAT_16
    text_encoder_2: DataType = DataType.BFLOAT_16
    vae: DataType = DataType.FLOAT_32  # reference forces VAE fp32 (vae.py:23)
    lora: DataType = DataType.FLOAT_32
    embedding: DataType = DataType.FLOAT_32

    @classmethod
    def from_single_dtype(cls, dtype: DataType) -> "ModelWeightDtypes":
        return cls(unet=dtype, text_encoder=dtype, text_encoder_2=dtype,
                   vae=DataType.FLOAT_32, lora=dtype, embedding=dtype)
