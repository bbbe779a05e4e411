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


def _restore_as_numpy(path):
    """Topology-independent restore: every leaf comes back as a host numpy
    array regardless of the device mesh the checkpoint was saved on (a
    TPU-trained checkpoint must load on a CPU eval host and vice versa)."""
    import jax
    import numpy as np

    ckptr = ocp.PyTreeCheckpointer()
    tree = ckptr.metadata(path).item_metadata.tree
    restore_args = jax.tree.map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree)
    return ckptr.restore(path, restore_args=restore_args)


def load_params(path: str, template=None):
    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    try:
        if template is not None:
            return ckptr.restore(path, template)
        return ckptr.restore(path)
    except ValueError:
        # saved-sharding devices absent in this process (cross-topology)
        restored = _restore_as_numpy(path)
        if template is not None:
            import jax

            return jax.tree.map(lambda t, r: r, template, restored)
        return restored


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
