"""Packing-quality metrics.

The chi accuracy/AE definitions replicate the reference bit-for-bit
(reference: src/utils/protein_analysis.py:36-101), including quirks that
must NOT be 'fixed' for comparability: accuracy requires ``chi_diff > 0``
(exact matches are excluded), AE is the raw |diff| folded over 2pi (and
over pi for pi-periodic chis), and 'atom_rmsd' is actually a mean squared
deviation (no square root).

``approx_clashscore`` is a fast on-device stand-in for MolProbity's
clashscore (serious clashes per 1000 atoms); the exact external binary is
wrapped in packppi_tpu.utils.analysis when available.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from packppi_tpu.chem import CHEM


def chi_metrics(sc_true, sc_pred, sc_mask, pi_periodic_mask,
                interface_mask=None, prefix: str = "chi"):
    """Per-chi accuracy (<20 deg) and absolute error.

    Args: all [*, L, 4] except interface_mask [*, L].
    Returns dict of scalars (+ total_acc / interface_acc).
    """
    sc_true = np.asarray(sc_true, np.float64)
    sc_pred = np.asarray(sc_pred, np.float64)
    sc_mask = np.asarray(sc_mask)
    pi_mask = np.asarray(pi_periodic_mask).astype(bool)

    out = {}
    total_acc = 0.0
    interface_acc = 0.0
    for i in range(4):
        diff = np.abs(sc_pred[..., i] - sc_true[..., i])
        n = sc_mask[..., i].sum()
        n = 1.0 if n == 0 else n

        acc = ((diff * 180 / np.pi < 20) & (diff > 0)).astype(np.float64)
        ae = np.minimum(diff, 2 * np.pi - diff)
        ae_folded = np.minimum(ae, np.pi - ae)
        ae = np.where(pi_mask[..., i], ae_folded, ae)

        out[f"{prefix}_{i}_ae_rad"] = ae.sum() / n
        out[f"{prefix}_{i}_ae_deg"] = ae.sum() / n * 180 / np.pi
        out[f"{prefix}_{i}_acc"] = acc.sum() / n
        total_acc += acc.sum() / n

        if interface_mask is not None:
            im = np.asarray(interface_mask)
            ni = (sc_mask[..., i] * im).sum()
            ni = 1.0 if ni == 0 else ni
            interface_acc += (acc * im).sum() / ni

    out["total_acc"] = total_acc / 4
    if interface_mask is not None:
        out["interface_acc"] = interface_acc / 4
    return out


def mean_squared_atom_deviation(true_coords, pred_coords, atom_mask, residue_mask,
                                eps: float = 1e-6):
    """The reference's 'atom_rmsd': mean squared deviation over real atoms
    (note: no square root — kept for comparability)."""
    m = np.asarray(atom_mask) * np.asarray(residue_mask)[..., None]
    sq = ((np.asarray(true_coords) - np.asarray(pred_coords)) ** 2).sum(-1) * m
    return sq.sum() / (m + eps).sum()


def approx_clashscore(positions, atom_exists, residue_type, residue_index,
                      overlap: float = 0.4, block: int = 128) -> float:
    """Serious steric overlaps (>= ``overlap`` A vdW interpenetration) per
    1000 atoms — a heavy-atom approximation of the MolProbity clashscore,
    computable on-device with the row-blocked pair machinery."""
    from packppi_tpu.ops.clash import _pair_block_loss

    positions = jnp.asarray(positions)
    atom_exists = jnp.asarray(atom_exists)
    residue_type = jnp.asarray(residue_type)
    residue_index = jnp.asarray(residue_index)

    radius = jnp.asarray(CHEM.vdw_radius_atom14)[residue_type] * atom_exists
    B, L = positions.shape[:2]
    count = 0.0
    for start in range(0, L, block):
        sl = slice(start, min(start + block, L))
        err, mask = _pair_block_loss(
            positions[:, sl], atom_exists[:, sl], radius[:, sl], residue_index[:, sl],
            positions, atom_exists, radius, residue_index, tol_soft=overlap)
        count += float((err > 0).sum())
    n_atoms = float(atom_exists.sum())
    return 1000.0 * count / max(n_atoms, 1.0)
