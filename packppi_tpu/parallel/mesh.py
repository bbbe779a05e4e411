"""Device mesh + sharding rules (SPMD over ICI).

The reference's only distribution is single-node DDP over NCCL (reference:
configs/trainer/ddp.yaml:4-9). Here distribution is jax-native SPMD: a 2D
``(data, model)`` mesh; batches shard over ``data`` (gradient all-reduce
rides ICI via XLA-inserted psums), and large parameter matrices shard over
``model`` (FSDP-style), all-gathered on use by XLA. The same jitted step runs
on 1 chip or a pod slice — only the mesh changes.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, model_parallel: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """(data, model) mesh. ``model_parallel`` divides the device count."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading batch axis over 'data'; everything else replicated."""
    return NamedSharding(mesh, P("data"))


def seq_batch_shardings(mesh: Mesh, batch, seq_axis: str = "model"):
    """Sequence-parallel layout: batch over 'data' AND the residue axis over
    ``seq_axis`` — for complexes too long for one chip's activation memory.
    GSPMD inserts the all-gathers the kNN/pairwise stages need; results are
    bit-identical to single-device execution (tested).
    """
    L = batch.residue_mask.shape[1]

    def rule(x):
        if x.ndim >= 2 and x.shape[1] == L:
            return NamedSharding(mesh, P("data", seq_axis))
        return NamedSharding(mesh, P("data"))

    import jax

    return jax.tree.map(rule, batch)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_shardings(mesh: Mesh, params, min_size: int = 16384):
    """FSDP-style rule: shard each large kernel's largest divisible axis over
    'model'; small tensors replicate. Returns a pytree of NamedShardings."""
    m = mesh.shape["model"]

    def rule(p):
        if m > 1 and hasattr(p, "shape") and p.size >= min_size:
            # largest axis divisible by the model-parallel degree
            order = sorted(range(p.ndim), key=lambda i: -p.shape[i])
            for axis in order:
                if p.shape[axis] % m == 0:
                    spec = [None] * p.ndim
                    spec[axis] = "model"
                    return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, params)
