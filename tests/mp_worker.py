"""Worker process for the two-process jax.distributed tests.

Launched by tests/test_multiprocess.py as ``python mp_worker.py <scenario>
<pid> <nprocs> <port> <workdir>``.  Each worker pins the CPU backend with ONE
local device, joins the cluster through the framework's own
``initialize_multihost`` (explicit COORDINATOR_ADDRESS/SDXL_NUM_PROCESSES/
SDXL_PROCESS_ID triple), and writes its result JSON to the shared workdir.

This executes for real the surfaces round 2 only reasoned about: cross-host
allgather in ``check_shard_integrity``, the sharded train step's gradient
all-reduce over two processes, the collective Orbax save/restore, and the
partitioned per-host cache layout.
"""
import json
import os
import sys
import traceback


def _setup_env(pid: int, nprocs: int, port: str) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    os.environ["COORDINATOR_ADDRESS"] = f"localhost:{port}"
    os.environ["SDXL_NUM_PROCESSES"] = str(nprocs)
    os.environ["SDXL_PROCESS_ID"] = str(pid)


def _config(workdir: str, pid: int):
    from sdxl_training_improvements_tpu.config import Config
    cfg = Config()
    cfg.data.train_data_dir = [os.path.join(workdir, "imgs")]
    cfg.training.batch_size = 2  # global batch: one row per host
    cfg.training.gradient_accumulation_steps = 1
    cfg.training.num_epochs = 1
    cfg.training.mixed_precision = "no"
    cfg.training.save_every = 0
    cfg.training.seed = 0
    cfg.optimizer.optimizer_type = "adamw"
    cfg.optimizer.learning_rate = 1e-4
    cfg.global_config.cache.cache_dir = os.path.join(workdir, "cache")
    cfg.global_config.cache.partitioned = True
    cfg.global_config.image.supported_dims = [[64, 64]]
    cfg.global_config.image.min_size = [32, 32]
    cfg.global_config.image.max_size = [96, 96]
    cfg.global_config.logging.log_dir = os.path.join(workdir, f"logs{pid}")
    cfg.global_config.logging.log_every = 1
    cfg.tpu.mesh_shape = [2, 1, 1]
    return cfg


def _trainer(workdir: str, pid: int, resume=None):
    import jax
    import jax.numpy as jnp
    from sdxl_training_improvements_tpu.models.sdxl import SDXLModel
    from sdxl_training_improvements_tpu.training.loop import SDXLTrainer
    cfg = _config(workdir, pid)
    if resume is not None:
        cfg.training.resume_from = resume
    # identical deterministic init on every process (replicated params)
    model = SDXLModel.create(
        tiny=True, dtype=jnp.float32, init_rng=jax.random.key(0),
        init_components=("unet", "vae", "clip_l", "clip_g"))
    trainer = SDXLTrainer(cfg, model=model,
                          output_dir=os.path.join(workdir, "out"),
                          use_mesh=True)
    return cfg, trainer


def scenario_train(pid, nprocs, workdir):
    """End-to-end: multihost init -> partitioned precompute -> 2-device
    sharded train step -> collective Orbax save -> resume."""
    from sdxl_training_improvements_tpu.parallel import mesh as M
    M.initialize_multihost()
    import jax
    assert jax.process_count() == nprocs, jax.process_count()
    assert jax.device_count() == nprocs and jax.local_device_count() == 1
    cfg, trainer = _trainer(workdir, pid)
    trainer.prepare_data()
    ds = trainer.dataset
    local_cached = sum(
        1 for idxs in ds.bucket_indices.values()
        for i in idxs if ds.cache.is_cached(ds.image_paths[i]))
    local_images = sum(len(v) for v in ds.bucket_indices.values())
    metrics = trainer.train(num_epochs=1)
    step = int(trainer.state.step)
    # resume path: a fresh trainer on the saved collective checkpoint
    _, t2 = _trainer(workdir, pid, resume="auto")
    resumed_step = int(t2.state.step)
    return {
        "loss": float(metrics["loss"]),
        "step": step,
        "resumed_step": resumed_step,
        "best_loss": trainer.best_loss,
        "local_images": local_images,
        "local_cached": local_cached,
        "cache_dir": str(ds.cache.cache_dir),
        "host_dirs": sorted(os.listdir(os.path.join(workdir, "cache"))),
    }


def scenario_integrity(pid, nprocs, workdir):
    """Failure injection: one host's cache loses an entry after precompute;
    the pre-epoch gate must raise on EVERY process (never hang)."""
    from sdxl_training_improvements_tpu.parallel import mesh as M
    M.initialize_multihost()
    cfg, trainer = _trainer(workdir, pid)
    trainer.prepare_data()
    ds = trainer.dataset
    if pid == 1:  # drop one locally cached entry on host 1 only
        for idxs in ds.bucket_indices.values():
            key = ds.cache.get_cache_key(ds.image_paths[idxs[0]])
            ds.cache.index.pop(key)
            break
    try:
        trainer.train(num_epochs=1)
        return {"raised": False}
    except RuntimeError as e:
        return {"raised": True, "message": str(e)[:200]}


def scenario_valloss(pid, nprocs, workdir):
    """Cross-host validation-loss agreement (loop.run_validation_loss):
    a per-host failure must yield None on EVERY host (the value gates the
    collective best-checkpoint save), and per-host val values must reduce
    to one replicated mean."""
    from sdxl_training_improvements_tpu.parallel import mesh as M
    M.initialize_multihost()
    cfg, trainer = _trainer(workdir, pid)
    from sdxl_training_improvements_tpu.training import validation as V

    calls = {"n": 0}

    def fake_loss(*a, **k):
        calls["n"] += 1
        if calls["n"] == 1 and pid == 1:
            raise RuntimeError("injected per-host validation failure")
        return 0.5 + 0.1 * pid  # per-host shards -> different local values

    orig = V.validation_loss
    V.validation_loss = fake_loss
    try:
        first = trainer.run_validation_loss(object())   # host 1 fails
        second = trainer.run_validation_loss(object())  # both succeed
    finally:
        V.validation_loss = orig
    return {"first_is_none": first is None,
            "second": None if second is None else float(second)}


SCENARIOS = {"train": scenario_train, "integrity": scenario_integrity,
             "valloss": scenario_valloss}


def main():
    scenario = sys.argv[1]
    pid, nprocs = int(sys.argv[2]), int(sys.argv[3])
    port, workdir = sys.argv[4], sys.argv[5]
    _setup_env(pid, nprocs, port)
    import jax
    jax.config.update("jax_platforms", "cpu")
    cache_dir = os.path.join(os.path.dirname(__file__), os.pardir,
                             ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    result = {"ok": False, "pid": pid}
    try:
        result.update(SCENARIOS[scenario](pid, nprocs, workdir))
        result["ok"] = True
    except Exception as e:
        result["error"] = f"{type(e).__name__}: {e}"
        result["traceback"] = traceback.format_exc()
    out = os.path.join(workdir, f"result_{scenario}_{pid}.json")
    with open(out + ".tmp", "w") as f:
        json.dump(result, f, indent=1)
    os.replace(out + ".tmp", out)
    print(f"[mp_worker {pid}] wrote {out} ok={result['ok']}", flush=True)


if __name__ == "__main__":
    main()
