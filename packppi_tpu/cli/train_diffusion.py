"""packppi-train-diffusion: PackPPI-MSC training CLI.

Usage: packppi-train-diffusion [--config configs/train_diffusion.yaml]
       [-m] [section.key=value ...]
       (e.g. trainer=debug data.batch_size=2, or a sweep:
       -m model.lr=1e-4,3e-4 seed=0,1)

Each run writes into a fresh ``<output_dir>/runs/<timestamp>`` directory
(``multiruns/<timestamp>/<job>`` under ``-m``); ``optimized_metric`` in the
config selects which returned metric a sweep minimizes (reference:
src/train_diffusion.py:100-117).
"""
from __future__ import annotations

from packppi_tpu.cli._runner import run_training


def _loader():
    from packppi_tpu.train.loop import train_diffusion
    return train_diffusion


def main():
    run_training(_loader, "train_diffusion.yaml",
                 "Train the torsional diffusion model")


if __name__ == "__main__":
    main()
