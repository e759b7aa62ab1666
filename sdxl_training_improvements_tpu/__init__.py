"""TPU-native SDXL training framework.

Public API surface (see docs/architecture.md):

    from sdxl_training_improvements_tpu import Config, SDXLTrainer
    trainer = SDXLTrainer(Config.from_yaml("config.yaml"))
    trainer.prepare_data()
    trainer.train()
"""
from sdxl_training_improvements_tpu.config import Config

__version__ = "0.1.0"

__all__ = [
    "Config",
    "SDXLTrainer",
    "SDXLModel",
    "NoiseSchedule",
    "make_optimizer",
    "__version__",
]


def __getattr__(name):  # lazy imports keep `import sdxl_...` light
    if name == "SDXLTrainer":
        from sdxl_training_improvements_tpu.training.loop import SDXLTrainer
        return SDXLTrainer
    if name == "SDXLModel":
        from sdxl_training_improvements_tpu.models.sdxl import SDXLModel
        return SDXLModel
    if name == "NoiseSchedule":
        from sdxl_training_improvements_tpu.training.schedules import (
            NoiseSchedule)
        return NoiseSchedule
    if name == "make_optimizer":
        from sdxl_training_improvements_tpu.training.optimizers import (
            make_optimizer)
        return make_optimizer
    raise AttributeError(name)
