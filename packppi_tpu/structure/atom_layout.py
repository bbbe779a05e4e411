"""atom14 <-> atom37 layout conversion.

The framework computes in the compact atom14 layout; atom37 (fixed
AlphaFold-style atom ordering) is provided for interoperability with
external tools and datasets (reference: src/utils/features.py:8-87).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from packppi_tpu.chem import CHEM


def atom14_masks(residue_type):
    """Per-residue layout maps for a [*, L] residue-type array.

    Returns dict with ``atom14_to_atom37`` [*, L, 14], ``atom37_to_atom14``
    [*, L, 37], ``atom14_mask`` [*, L, 14], ``atom37_mask`` [*, L, 37].
    """
    rt = np.asarray(residue_type)
    return {
        "atom14_to_atom37": CHEM.atom14_to_atom37[rt],
        "atom37_to_atom14": CHEM.atom37_to_atom14[rt],
        "atom14_mask": CHEM.atom14_mask[rt],
        "atom37_mask": CHEM.atom37_mask[rt],
    }


def atom14_to_atom37(atom14_data, residue_type):
    """[*, L, 14, C] -> [*, L, 37, C] (zeros at non-existent atoms)."""
    rt = jnp.asarray(residue_type)
    gather = jnp.asarray(CHEM.atom37_to_atom14)[rt]       # [*, L, 37]
    mask = jnp.asarray(CHEM.atom37_mask)[rt]              # [*, L, 37]
    data = jnp.asarray(atom14_data)
    idx = jnp.broadcast_to(gather[..., None], (*gather.shape, data.shape[-1]))
    out = jnp.take_along_axis(data, idx, axis=-2)
    return out * mask[..., None]


def atom37_to_atom14(atom37_data, residue_type):
    """[*, L, 37, C] -> [*, L, 14, C]."""
    rt = jnp.asarray(residue_type)
    gather = jnp.asarray(CHEM.atom14_to_atom37)[rt]       # [*, L, 14]
    mask = jnp.asarray(CHEM.atom14_mask)[rt]
    data = jnp.asarray(atom37_data)
    idx = jnp.broadcast_to(gather[..., None], (*gather.shape, data.shape[-1]))
    out = jnp.take_along_axis(data, idx, axis=-2)
    return out * mask[..., None]
