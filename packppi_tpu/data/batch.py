"""The canonical padded batch: a flat pytree the whole framework shares.

Dense ``[B, L, ...]`` arrays with explicit masks — the schema every model
consumes (mirrors the reference collate output; reference:
src/datamodules/complex_datamodule.py:196-226). Being a NamedTuple it is a
jax pytree: it jits, vmaps, shards (batch axis -> 'data' mesh axis) and
donates without adapters.

Padding discipline: ``L`` is rounded up to a bucket size so XLA compiles a
small number of shapes instead of one per protein length.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np


class ProteinBatch(NamedTuple):
    X: jnp.ndarray                      # [B, L, 14, 3]
    atom_mask: jnp.ndarray              # [B, L, 14]
    residue_type: jnp.ndarray           # [B, L] int32
    residue_mask: jnp.ndarray           # [B, L]
    residue_index: jnp.ndarray          # [B, L] int32
    chain_indices: jnp.ndarray          # [B, L] int32
    BB_D: jnp.ndarray                   # [B, L, 3]
    BB_D_sincos: jnp.ndarray            # [B, L, 3, 2]
    BB_D_mask: jnp.ndarray              # [B, L, 3]
    SC_D: jnp.ndarray                   # [B, L, 4]
    SC_D_sincos: jnp.ndarray            # [B, L, 4, 2]
    SC_D_mask: jnp.ndarray              # [B, L, 4]
    chi_1pi_periodic_mask: jnp.ndarray  # [B, L, 4] bool
    chi_2pi_periodic_mask: jnp.ndarray  # [B, L, 4] bool

    @property
    def num_proteins(self) -> int:
        return self.X.shape[0]

    @property
    def max_size(self) -> int:
        return self.X.shape[1]


# power-of-sqrt(2)-ish residue-count buckets for shape-stable compilation
LENGTH_BUCKETS = (64, 96, 128, 192, 256, 384, 512, 768, 1024, 1536, 2048, 3072, 4096)


def bucket_length(length: int) -> int:
    for b in LENGTH_BUCKETS:
        if length <= b:
            return b
    return int(np.ceil(length / 1024) * 1024)


def pad_features(feats: dict[str, np.ndarray], target_len: Optional[int] = None) -> dict[str, np.ndarray]:
    """Pad one protein's feature dict along the residue axis."""
    L = len(feats["residue_type"])
    target = target_len if target_len is not None else bucket_length(L)
    out = {}
    for k, v in feats.items():
        pad = [(0, target - L)] + [(0, 0)] * (v.ndim - 1)
        out[k] = np.pad(v, pad)
    return out


def stack_batch(protein_feats: list[dict[str, np.ndarray]],
                target_len: Optional[int] = None) -> ProteinBatch:
    """Pad each protein to the common bucketed length and stack to [B, L, ...]."""
    max_len = max(len(f["residue_type"]) for f in protein_feats)
    target = target_len if target_len is not None else bucket_length(max_len)
    padded = [pad_features(f, target) for f in protein_feats]
    fields = {}
    for name in ProteinBatch._fields:
        arr = np.stack([p[name] for p in padded])
        if arr.dtype == np.int64:
            arr = arr.astype(np.int32)
        elif arr.dtype == np.float64:
            arr = arr.astype(np.float32)
        fields[name] = arr
    return ProteinBatch(**fields)
