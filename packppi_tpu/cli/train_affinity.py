"""packppi-train-affinity: PackPPI-AP training CLI.

Usage: packppi-train-affinity [--config configs/train_affinity.yaml]
       [-m] pre_checkpoint_path=... [section.key=value ...]

Supports the same Hydra-style run directories and ``-m`` sweeps as
packppi-train-diffusion (reference: src/train_affinity.py, Hydra main).
"""
from __future__ import annotations

from packppi_tpu.cli._runner import run_training


def _loader():
    from packppi_tpu.train.loop import train_affinity
    return train_affinity


def main():
    run_training(_loader, "train_affinity.yaml",
                 "Train the ddG affinity model")


if __name__ == "__main__":
    main()
