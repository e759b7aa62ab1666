"""Typed configuration tree for the TPU-native SDXL training framework.

The YAML schema is kept byte-compatible with the reference framework's
``src/config.yaml`` (see reference ``src/data/config.py:10-311``) so existing
configs load unchanged: ``model`` / ``optimizer`` / ``training`` (with nested
``method_config.scheduler``) / ``data`` / ``global_config.{cache,logging,image}``
/ ``tag_weighting``.  On top of that schema this rebuild adds:

* ``model.rho`` — the Karras rho the reference *reads* but never defines
  (reference defect, ``novelai_v3.py:107,204``), defaulting to 7.0.
* a ``tpu`` section controlling the device mesh / sharding / pallas toggles,
  all defaulted so reference configs need no edits.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field, asdict
from pathlib import Path
from typing import Any, Dict, List, Optional, Union

import yaml


@dataclass
class ModelConfig:
    """Mirrors reference ``ModelConfig`` (``src/data/config.py:10-39``)."""

    pretrained_model_name: str = "stabilityai/stable-diffusion-xl-base-1.0"
    model_type: str = "sdxl"
    prediction_type: str = "v_prediction"  # epsilon | v_prediction
    num_timesteps: int = 1000
    sigma_min: float = 0.002
    sigma_max: float = 20000.0
    use_ztsnr: bool = True
    timestep_bias_strategy: str = "none"  # none | earlier | later | range
    # for "range": fraction bounds of the biased window
    timestep_bias_min: float = 0.0
    timestep_bias_max: float = 1.0
    # rebuild additions: the portion/multiplier knobs the reference's
    # generate_timestep_weights takes but never exposes in config
    timestep_bias_portion: float = 0.25
    timestep_bias_multiplier: float = 2.0
    min_snr_gamma: Optional[float] = 5.0
    # Reference reads config.model.rho but never defines it (defect ledger);
    # we define it with the reference function default (novelai_v3.py:164).
    rho: float = 7.0
    # rebuild addition: constant aesthetic-score conditioning used when
    # fine-tuning a 5-time-id (refiner) UNet — the cache's canonical 6-wide
    # time_ids are adapted at batch time (data/pipeline.py::
    # adapt_batch_time_ids); 6.0 is SDXL-refiner's "good image" score.
    aesthetic_score: float = 6.0


@dataclass
class OptimizerConfig:
    """Mirrors reference ``OptimizerConfig`` (``src/data/config.py:41-114``)."""

    learning_rate: float = 1e-6
    weight_decay: float = 0.01
    beta1: float = 0.9
    beta2: float = 0.999
    epsilon: float = 1e-8
    optimizer_type: str = "adamw_bf16"  # adamw_bf16 | adamw_schedule_free_kahan | soap
    # adamw_bf16 only: hold Adam moments as 8-bit log codes + one fp32
    # scale per leaf (4 instead of 6 state bytes/param; ops/quantize.py)
    moments_8bit: bool = False
    # adamw_bf16 only: keep the SR shift tree in pinned host memory,
    # streamed leaf-by-leaf through HBM inside the update (removes 5.1 GB
    # resident at SDXL scale; single-device small-HBM escape hatch)
    shift_host: bool = False
    # adamw_bf16 only: keep the m/v trees in pinned host memory too,
    # streamed in ~33.5M-param groups (pairs with moments_8bit: 1 byte/param
    # each way over DMA).  With shift_host this leaves only params+grads
    # resident — what lets fwd+bwd+clip+update run as ONE program on a
    # 16 GB chip (bench.py single_program_full_step)
    moments_host: bool = False

    # Schedule-free specific
    warmup_steps: int = 0
    kahan_sum: bool = True
    correct_bias: bool = True

    # SOAP specific
    precondition_frequency: int = 10
    shampoo_beta: float = 0.95
    max_precond_dim: int = 10000
    precondition_1d: bool = False
    # default True (reference default is False, ``src/data/config.py:61``):
    # without merging, a conv kernel [3,3,in,out] gets useless 3x3 axis
    # preconditioners; merged [9*in, out] is the shape SOAP's math wants.
    # Explicit YAML values still win.
    merge_dims: bool = True
    normalize_grads: bool = False
    data_format: str = "channels_first"

    @property
    def betas(self) -> tuple:
        return (self.beta1, self.beta2)


@dataclass
class SchedulerConfig:
    """Mirrors reference ``SchedulerConfig`` (``src/data/config.py:116-146``)."""

    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    clip_sample: bool = False
    steps_offset: int = 0
    timestep_spacing: str = "leading"
    thresholding: bool = False
    dynamic_thresholding_ratio: float = 0.995
    sample_max_value: float = 1.0
    rescale_betas_zero_snr: bool = True


@dataclass
class MethodConfig:
    scheduler: SchedulerConfig = field(default_factory=SchedulerConfig)


@dataclass
class LoRAConfig:
    """LoRA fine-tuning (reference ``src/models/adapters/lora.py:11-56``,
    never wired into the reference trainer — first-class here).

    ``targets`` are regexes over flax param paths; the default covers every
    attention projection in the UNet.  ``dropout`` matches the reference's
    branch dropout (``lora.py:24``): applied to the LoRA branch input at
    train time.
    """

    enabled: bool = False
    rank: int = 4
    alpha: float = 1.0
    dropout: float = 0.0
    targets: Optional[List[str]] = None  # None -> lora.DEFAULT_TARGETS


@dataclass
class TrainingConfig:
    """Mirrors reference ``TrainingConfig`` (``src/data/config.py:153-181``)."""

    method: str = "ddpm"  # ddpm | flow_matching (registry-extensible)
    num_epochs: int = 10
    batch_size: int = 4
    gradient_accumulation_steps: int = 1
    mixed_precision: str = "bf16"  # fp16 | bf16 | no
    enable_xformers: bool = True  # accepted for config parity; TPU path always
    # uses the fused attention kernels, so this is a no-op toggle.
    num_workers: int = 4
    prediction_type: str = "v_prediction"
    method_config: MethodConfig = field(default_factory=MethodConfig)
    save_every: int = 1
    pin_memory: bool = True
    clip_grad_norm: float = 1.0
    num_inference_steps: int = 50
    debug_mode: bool = False
    save_final_model: bool = True
    # Rebuild addition: the reference exports a best-loss checkpoint every
    # epoch the loss improves (``ddpm_trainer.py:232-238``) — correct for
    # long epochs, pathological for few-batch epochs where loss improves
    # every time (a full diffusers export per epoch). False keeps best-loss
    # TRACKING but skips the per-improvement export.
    save_best: bool = True
    # Rebuild additions (absent in reference):
    max_steps: Optional[int] = None  # hard step cap (overrides epochs if set)
    resume_from: Optional[str] = None  # checkpoint dir to resume from
    seed: int = 42
    proportion_empty_prompts: float = 0.0  # CFG caption dropout at batch time
    lora: LoRAConfig = field(default_factory=LoRAConfig)
    # fp32 weight EMA (None = off). Not in the reference; standard for SDXL
    # fine-tunes (the published SDXL base weights are EMA'd).
    ema_decay: Optional[float] = None


@dataclass
class ImageConfig:
    """Mirrors reference ``ImageConfig`` (``src/data/config.py:183-202``)."""

    supported_dims: List[List[int]] = field(
        default_factory=lambda: [
            [640, 1536],
            [768, 1344],
            [832, 1216],
            [896, 1152],
            [1024, 1024],
            [1152, 896],
            [1216, 832],
            [1344, 768],
            [1536, 640],
        ]
    )
    max_aspect_ratio: float = 2.4
    target_size: List[int] = field(default_factory=lambda: [1024, 1024])
    max_size: List[int] = field(default_factory=lambda: [1536, 1536])
    min_size: List[int] = field(default_factory=lambda: [384, 384])
    bucket_step: int = 64


@dataclass
class CacheConfig:
    """Mirrors reference ``CacheConfig`` (``src/data/config.py:204-221``)."""

    cache_dir: Union[str, Path] = "cache"
    max_cache_size: int = 10000
    use_cache: bool = True
    cache_latents: bool = True
    cache_text_embeddings: bool = True
    # multi-host cache layout: False (default) = one cache shared by every
    # host (shared filesystem); True = each host precomputes and reads its
    # own static partition under <cache_dir>/host-NNN (host-local disks) —
    # the dataset is dealt per-bucket round-robin so per-host batch counts
    # stay exactly equal (data/dataset.py::partition_for_host).
    partitioned: bool = False

    @property
    def persistent(self) -> bool:
        """Whether the precompute cache persists on disk across runs.

        The reference's ``cache_latents=false`` means "encode inside
        __getitem__ every epoch" (``src/data/dataset.py:166-195``) — putting
        VAE/CLIP dispatches in the per-step input path, a TPU anti-pattern
        this framework deliberately does not carry.  Here the staged
        precompute ALWAYS runs (encode-then-cache before the first batch
        touch); these knobs control persistence instead: any of them false
        -> the cache lives in a per-run temp directory deleted at exit, so
        nothing persists — the closest TPU-native semantics to the
        reference's cache-less mode (crops/flips are fixed per run, not
        re-rolled per epoch; data/dataset.py documents the difference)."""
        return bool(self.use_cache and self.cache_latents
                    and self.cache_text_embeddings)


@dataclass
class LoggingConfig:
    """Mirrors reference ``LoggingConfig`` (``src/data/config.py:223-249``)."""

    use_wandb: bool = False
    wandb_project: str = "sdxl-training"
    wandb_entity: Optional[str] = None
    log_dir: str = "logs"
    filename: str = "training.log"
    console_level: str = "INFO"
    file_level: str = "DEBUG"
    capture_warnings: bool = True
    log_every: int = 10


@dataclass
class DataConfig:
    """Mirrors reference ``DataConfig`` (``src/data/config.py:251-270``)."""

    train_data_dir: Union[str, List[str]] = field(default_factory=lambda: ["data/train"])
    validation_data_dir: Optional[Union[str, List[str]]] = None
    image_size: int = 1024
    center_crop: bool = True
    random_flip: bool = True
    tokenizer_max_length: int = 77
    # Rebuild addition: prompts sampled at checkpoint epochs (wandb imaging)
    validation_prompts: List[str] = field(default_factory=list)


@dataclass
class GlobalConfig:
    cache: CacheConfig = field(default_factory=CacheConfig)
    logging: LoggingConfig = field(default_factory=LoggingConfig)
    image: ImageConfig = field(default_factory=ImageConfig)


@dataclass
class TagWeightingConfig:
    """Mirrors reference ``TagWeightingConfig`` (``src/data/config.py:279-301``)."""

    enable_tag_weighting: bool = False
    use_cache: bool = True
    required: bool = False
    min_weight: float = 0.1
    max_weight: float = 3.0
    default_weight: float = 1.0
    smoothing_factor: float = 0.05


@dataclass
class TPUConfig:
    """TPU/mesh settings — rebuild-only section, fully defaulted.

    The mesh is (data, fsdp, tensor).  The reference's sole parallelism
    strategy is DDP over NCCL (``src/core/distributed.py``); here data
    parallelism is the ``data`` axis of a ``jax.sharding.Mesh`` with gradient
    averaging compiled into the train step, and optional param/optimizer
    sharding rides the ``fsdp`` axis (ZeRO-style), ``tensor`` the megatron
    axis.  Defaults reproduce plain DP over all devices.
    """

    mesh_shape: Optional[List[int]] = None  # None -> (n_devices, 1, 1)
    axis_names: List[str] = field(default_factory=lambda: ["data", "fsdp", "tensor"])
    shard_params: bool = False  # shard params+opt state over fsdp axis
    remat: bool = True  # gradient rematerialisation in the UNet
    # full | dots_nobatch | dots | dots_small | dots_small_attn — selective
    # remat; "dots_nobatch" (dots_with_no_batch_dims_saveable) saves
    # projection/conv matmuls and recomputes the S^2 attention logits;
    # plain "dots" keeps the logits too and OOMs 16GB chips at 1024^2;
    # "dots_small" thresholds the dot saves so batch 4 @1024^2 auto-fits;
    # "dots_small_attn" additionally saves the named attention-core outputs
    # so the remat backward never re-runs an attention forward
    # (models/unet.py, docs/performance.md)
    remat_policy: str = "full"
    # attention implementation (ops/attention.py): "auto" = Pallas flash
    # when the Mosaic probe reports native execution, bounded-memory chunked
    # XLA when the fp32 score tensor is huge, monolithic XLA otherwise;
    # or pin one of "xla" | "chunked" | "flash".
    attention_impl: str = "auto"
    # "auto" chunk-threshold override in MB (None = remat-aware default:
    # 512 under remat, 64 otherwise — ops/attention.py docstring)
    attn_chunk_mb: Optional[int] = None
    # micro-batch size for the accumulation scan.  None = training.batch_size
    # (one micro-batch per accumulation step, the reference's composition).
    # Setting it re-tiles the SAME global batch
    # (batch_size * gradient_accumulation_steps) into micro-batches of this
    # size — gradients are identical (mean over the same samples), but a
    # smaller micro-batch can run without rematerialisation on small-HBM
    # chips: the reference's batch 4 x accum 4 @1024^2 executed as
    # micro 1 x accum 16 measured 273.5 ms/sample (no remat) vs 370
    # ms/sample for batch-4 full-remat on a 16 GB v5e
    # (tools/measure_r3.py, 2026-08-17).  Must divide the global batch; each
    # micro-batch is sharded over the data/fsdp mesh axes.
    micro_batch_size: Optional[int] = None
    # gradient-accumulator dtype: "float32" (exact micro-batch mean, the
    # default) or "bfloat16" (halves the resident accumulator — 5.1 vs
    # 10.3 GB at SDXL scale; the per-micro-batch grads are already bf16, so
    # the delta is bf16 rounding of the running sum and the clip rescale).
    # "bfloat16" + gradient_accumulation_steps 1 + optimizer.moments_8bit
    # is what fits the whole fwd+bwd+clip+update as ONE program on a 16 GB
    # chip (bench.py single_program_full_step).
    grad_accum_dtype: str = "float32"
    # flat optimizer state (adamw_bf16 only): pack bf16 leaves into a few
    # contiguous buffers so the update runs as large fused passes.
    # "auto" resolves to OFF — flat packing measured ~500ms vs 127ms
    # per-leaf on TPU (ravel of tiled layouts forces relayout copies,
    # docs/performance.md); "on" forces it for A/B measurement.
    flat_optimizer: str = "auto"
    # stochastic-rounding noise source for adamw_bf16: "hash" (fused
    # counter hash, zero HBM traffic — measured 127ms vs 141.5ms for "rbg"
    # over the full 2.567B params) or "rbg" (materialised jax.random.bits
    # planes, the stream the bit-parity suite pins).
    sr_noise: str = "hash"
    donate_state: bool = True
    # non-blocking checkpointing (training/checkpoints.py): Orbax state
    # saves snapshot to host and commit on a background thread; diffusers
    # exports gather inline (the multi-host collective) and write
    # safetensors on a background thread.  The loop serializes saves
    # (wait-before-next) and joins everything before train() returns.
    # The reference's torch.save blocked the step loop for the full write.
    async_checkpointing: bool = True
    profile_dir: Optional[str] = None

    def __post_init__(self):
        if self.attention_impl not in ("auto", "xla", "chunked", "flash"):
            raise ValueError(
                f"tpu.attention_impl must be one of auto|xla|chunked|flash, "
                f"got {self.attention_impl!r}")
        if str(self.flat_optimizer).lower() not in ("auto", "on", "off",
                                                    "true", "false"):
            raise ValueError(
                f"tpu.flat_optimizer must be one of auto|on|off, "
                f"got {self.flat_optimizer!r}")
        if self.sr_noise not in ("hash", "rbg"):
            raise ValueError(
                f"tpu.sr_noise must be hash|rbg, got {self.sr_noise!r}")
        if self.grad_accum_dtype not in ("float32", "bfloat16"):
            raise ValueError(
                f"tpu.grad_accum_dtype must be float32|bfloat16, "
                f"got {self.grad_accum_dtype!r}")
        if self.micro_batch_size is not None and self.micro_batch_size < 1:
            raise ValueError(
                f"tpu.micro_batch_size must be >= 1 or null, "
                f"got {self.micro_batch_size}")
        if self.attn_chunk_mb is not None and self.attn_chunk_mb < 1:
            raise ValueError(
                f"tpu.attn_chunk_mb must be >= 1 or null, "
                f"got {self.attn_chunk_mb}")


@dataclass
class Config:
    """Root config. ``from_yaml`` applies YAML over dataclass defaults
    recursively, preserving defaults for absent keys (same merge semantics as
    reference ``Config.from_yaml``, ``src/data/config.py:327-420``)."""

    model: ModelConfig = field(default_factory=ModelConfig)
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    training: TrainingConfig = field(default_factory=TrainingConfig)
    data: DataConfig = field(default_factory=DataConfig)
    global_config: GlobalConfig = field(default_factory=GlobalConfig)
    tag_weighting: TagWeightingConfig = field(default_factory=TagWeightingConfig)
    tpu: TPUConfig = field(default_factory=TPUConfig)

    # ------------------------------------------------------------------ io
    def to_dict(self) -> Dict[str, Any]:
        return asdict(self)

    @classmethod
    def from_dict(cls, raw: Dict[str, Any]) -> "Config":
        raw = dict(raw or {})
        # round-2 compat: tpu.use_pallas_attention (bool) predates the
        # four-way tpu.attention_impl knob — translate instead of silently
        # ignoring a knob that used to do something
        tpu_raw = raw.get("tpu")
        if isinstance(tpu_raw, dict) and "use_pallas_attention" in tpu_raw:
            tpu_raw = dict(tpu_raw)
            legacy = tpu_raw.pop("use_pallas_attention")
            tpu_raw.setdefault("attention_impl",
                               "auto" if legacy else "xla")
            raw["tpu"] = tpu_raw
        cfg = cls()
        _merge_into_dataclass(cfg, raw or {})
        TPUConfig.__post_init__(cfg.tpu)  # re-validate merged values
        return cfg

    @classmethod
    def from_yaml(cls, path: Union[str, Path]) -> "Config":
        path = Path(path)
        if not path.exists():
            return cls()
        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        return cls.from_dict(raw)

    def save_yaml(self, path: Union[str, Path]) -> None:
        with open(path, "w") as f:
            yaml.safe_dump(self.to_dict(), f, sort_keys=False)


def _merge_into_dataclass(obj: Any, data: Dict[str, Any]) -> Any:
    """Recursively overlay ``data`` onto dataclass ``obj`` in place.

    Unknown keys are ignored (forward/backward compat, matching the
    reference's tolerant merge).  Dict values merge into nested dataclasses;
    everything else replaces the default.
    """
    if not dataclasses.is_dataclass(obj):
        return data
    names = {f.name for f in dataclasses.fields(obj)}
    for key, value in (data or {}).items():
        if key not in names:
            continue
        current = getattr(obj, key)
        if dataclasses.is_dataclass(current):
            if not isinstance(value, dict):
                raise ValueError(
                    f"Config section {key!r} must be a mapping, got "
                    f"{type(value).__name__}: {value!r}")
            _merge_into_dataclass(current, value)
        else:
            setattr(obj, key, value)
    return obj
