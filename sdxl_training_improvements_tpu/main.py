"""CLI entry point.

Reference counterpart: ``src/main.py`` — with the ledger fixes: a real
``--config`` flag (the reference hardcodes ``src/config.yaml`` despite
documenting ``--config``, ``main.py:37`` vs ``README.md:168-176``), plus
``--resume`` and ``--output-dir``.
"""
from __future__ import annotations

import argparse
import sys

from sdxl_training_improvements_tpu.config import Config


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="sdxl-tpu-train",
        description="TPU-native SDXL fine-tuning (ddpm / flow_matching)")
    p.add_argument("--config", default="config.yaml",
                   help="YAML config path (reference schema)")
    p.add_argument("--output-dir", default="outputs")
    p.add_argument("--resume", nargs="?", const="auto", default=None,
                   help="checkpoint dir to resume from; bare flag = latest")
    p.add_argument("--max-steps", type=int, default=None,
                   help="hard step cap (overrides epochs)")
    p.add_argument("--method", default=None,
                   help="override training.method (ddpm | flow_matching)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    config = Config.from_yaml(args.config)
    if args.resume is not None:
        config.training.resume_from = args.resume
    if args.max_steps is not None:
        config.training.max_steps = args.max_steps
    if args.method is not None:
        config.training.method = args.method

    from sdxl_training_improvements_tpu.training.loop import SDXLTrainer

    trainer = SDXLTrainer(config, output_dir=args.output_dir)
    trainer.prepare_data()
    trainer.train()
    return 0


def cli() -> None:
    sys.exit(main())


if __name__ == "__main__":
    cli()
