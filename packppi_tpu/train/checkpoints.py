"""Checkpoint I/O (orbax).

Parameters-only helpers here; full train state (params + opt state + PRNG +
step) checkpointing with top-k retention lives in packppi_tpu.train.loop.
(reference uses Lightning ModelCheckpoint; reference:
configs/callbacks/default.yaml:8-15)
"""
from __future__ import annotations

from pathlib import Path

import orbax.checkpoint as ocp


def save_params(path: str, params) -> None:
    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()


def load_params(path: str, template=None):
    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(path, template)
    return ckptr.restore(path)


def load_model_params(path: str, template) -> dict:
    """Load model params from either a params-only checkpoint
    (tools/convert_checkpoint.py output) or a full training TrainState
    checkpoint (params + opt_state + step + key), unwrapping the latter.

    Restores WITHOUT a template first — restoring a TrainState directory
    against a params-only template fails inside orbax before any unwrap
    check could run — then validates leaf shapes against ``template``.
    (reference analog: AffinityPrediction loads a TDiffusionModule .ckpt,
    reference: src/models/AffinityPrediction.py:39-47)
    """
    import jax
    import numpy as np

    raw = load_params(path)
    if isinstance(raw, dict) and "params" in raw and "step" in raw:
        raw = raw["params"]  # full TrainState checkpoint -> backbone params

    t_shapes = jax.tree.map(lambda x: tuple(x.shape), template)
    r_shapes = jax.tree.map(lambda x: tuple(np.shape(x)), raw)
    if t_shapes != r_shapes:
        raise ValueError(
            f"checkpoint at {path} does not match the expected parameter "
            "tree (checkpoint for a different model/config?)")
    return raw
