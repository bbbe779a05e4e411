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
