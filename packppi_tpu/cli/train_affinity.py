"""packppi-train-affinity: PackPPI-AP training CLI.

Usage: packppi-train-affinity [--config configs/train_affinity.yaml]
       pre_checkpoint_path=... [section.key=value ...]
"""
from __future__ import annotations

import argparse
from pathlib import Path


def main():
    p = argparse.ArgumentParser(description="Train the ddG affinity model")
    p.add_argument("--config", default=None, help="task config YAML")
    p.add_argument("--platform", default=None)
    p.add_argument("overrides", nargs="*", help="dotlist overrides: a.b=c or group=name")
    args = p.parse_args()

    from packppi_tpu.utils.platform import configure_platform
    configure_platform(args.platform)

    from packppi_tpu.train.loop import train_affinity
    from packppi_tpu.utils.config import load_config

    default_cfg = Path(__file__).resolve().parents[2] / "configs/train_affinity.yaml"
    cfg = load_config(args.config or str(default_cfg), args.overrides)
    result = train_affinity(cfg)
    print(result)


if __name__ == "__main__":
    main()
