"""Torsion angles -> rigid frames -> atom14 coordinates.

The differentiable chain used by sampling, the clash loss, and the proximal
optimizer: given backbone coordinates and (phi, psi, pre-omega, chi1..4)
angles, place every side-chain atom. Follows the AF2 8-rigid-group frame
algebra with the reference's conventions (reference: src/utils/features.py:95-194,
src/models/components/__init__.py:76-120), but as pure jnp with gathers
instead of one-hot masked sums, so XLA fuses the whole chain.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from packppi_tpu.chem import CHEM
from packppi_tpu.geometry.rigid import (
    Rigid,
    bb_frames_from_atom14,
    compose,
    from_4x4,
    rigid_apply,
)


def _take_frames(r: Rigid, idx: jnp.ndarray, axis: int) -> Rigid:
    """Gather frames along a batch axis. ``idx`` broadcasts against r's batch
    shape with the gathered axis replaced by idx's size."""
    rot_idx = jnp.broadcast_to(idx[..., None, None], (*idx.shape, 3, 3))
    trans_idx = jnp.broadcast_to(idx[..., None], (*idx.shape, 3))
    return Rigid(
        jnp.take_along_axis(r.rot, rot_idx, axis=axis - 2),
        jnp.take_along_axis(r.trans, trans_idx, axis=axis - 1),
    )


def torsion_angles_to_frames(bb: Rigid, sincos: jnp.ndarray,
                             aatype: jnp.ndarray) -> Rigid:
    """Compose per-group frames into global frames.

    Args:
        bb: backbone-to-global frames, batch shape [..., L].
        sincos: [..., L, 7, 2] (sin, cos) of (pre-omega, phi, psi, chi1..4).
        aatype: [..., L] residue types.

    Returns:
        [..., L, 8] frames mapping each rigid group to global coordinates.
    """
    default = from_4x4(jnp.asarray(CHEM.rigid_group_default_frame)[aatype])  # [..., L, 8]

    sin = sincos[..., 0]
    cos = sincos[..., 1]
    # prepend the identity rotation for the backbone group
    sin8 = jnp.concatenate([jnp.zeros_like(sin[..., :1]), sin], -1)
    cos8 = jnp.concatenate([jnp.ones_like(cos[..., :1]), cos], -1)
    zero = jnp.zeros_like(sin8)
    one = jnp.ones_like(sin8)
    # rotation about the group x-axis by the torsion angle
    rot = jnp.stack([
        jnp.stack([one, zero, zero], -1),
        jnp.stack([zero, cos8, -sin8], -1),
        jnp.stack([zero, sin8, cos8], -1),
    ], -2)  # [..., L, 8, 3, 3]

    frames = compose(default, Rigid(rot, jnp.zeros((*sin8.shape, 3), sin8.dtype)))

    # chain chi frames: chi_k is defined relative to chi_{k-1}
    chi1 = frames[..., 4]
    chi2 = compose(chi1, frames[..., 5])
    chi3 = compose(chi2, frames[..., 6])
    chi4 = compose(chi3, frames[..., 7])

    def cat(field, parts):
        return jnp.concatenate(parts, axis=-(3 if field == "rot" else 2))

    rot_all = cat("rot", [frames.rot[..., :5, :, :],
                          chi2.rot[..., None, :, :],
                          chi3.rot[..., None, :, :],
                          chi4.rot[..., None, :, :]])
    trans_all = cat("trans", [frames.trans[..., :5, :],
                              chi2.trans[..., None, :],
                              chi3.trans[..., None, :],
                              chi4.trans[..., None, :]])
    to_bb = Rigid(rot_all, trans_all)

    bb_exp = Rigid(bb.rot[..., None, :, :], bb.trans[..., None, :])
    return compose(bb_exp, to_bb)


def frames_to_atom14_positions(frames: Rigid, aatype: jnp.ndarray) -> jnp.ndarray:
    """Place literature atom positions through their group frames.

    The per-atom frame selection is a ONE-HOT contraction over the 8 rigid
    groups rather than a gather: a take_along_axis here moves 9-wide [3, 3]
    elements (lane-starved on TPU) and its transpose is a scatter-add —
    the r4 proximal profile charged ~1.8 ms/Adam-step to exactly these two.
    The einsum's forward AND backward are dense sum-over-8 contractions
    (full lanes, no scatter); selection is exact (one-hot weights are 1.0).

    Args:
        frames: [..., L, 8] group-to-global frames.
        aatype: [..., L].

    Returns:
        [..., L, 14, 3] atom positions (masked to existing atoms).
    """
    group = jnp.asarray(CHEM.atom14_to_rigid_group)[aatype]          # [..., L, 14]
    oh = (group[..., None] == jnp.arange(8)).astype(frames.rot.dtype)  # [..., L, 14, 8]
    # HIGHEST: the default MXU pass would round the f32 frames to bf16
    # (global translations are O(100 A) -> ~0.4 A coordinate error,
    # measured on-chip for the analogous geometry einsum); exact under
    # bf16x3 decomposition
    hp = jax.lax.Precision.HIGHEST
    rot = jnp.einsum("...ag,...gij->...aij", oh, frames.rot,
                     precision=hp)                                   # [..., L, 14, 3, 3]
    trans = jnp.einsum("...ag,...gi->...ai", oh, frames.trans,
                       precision=hp)                                 # [..., L, 14, 3]
    atom_frames = Rigid(rot, trans)
    lit = jnp.asarray(CHEM.atom14_local_positions)[aatype]           # [..., L, 14, 3]
    mask = jnp.asarray(CHEM.atom14_mask)[aatype]                     # [..., L, 14]
    return rigid_apply(atom_frames, lit) * mask[..., None]


def atom14_coords_from_torsions(X: jnp.ndarray, aatype: jnp.ndarray,
                                bb_d: jnp.ndarray, sc_d: jnp.ndarray) -> jnp.ndarray:
    """Differentiable (backbone dihedrals, chi angles) -> atom14 coordinates.

    Backbone atoms (N, CA, C, O) are copied from the input coordinates; only
    side-chain atoms are rebuilt from the torsions.
    (reference: src/models/components/__init__.py:76-120)

    Args:
        X: [..., L, 14, 3] input coordinates (backbone used as anchor).
        aatype: [..., L] residue types.
        bb_d: [..., L, 3] (pre-omega, phi, psi).
        sc_d: [..., L, 4] chi angles.
    """
    angles = jnp.concatenate([bb_d, sc_d], -1)                        # [..., L, 7]
    sincos = jnp.stack([jnp.sin(angles), jnp.cos(angles)], -1)
    norm = jnp.sqrt(jnp.clip(jnp.sum(sincos ** 2, -1, keepdims=True), 1e-12))
    sincos = sincos / norm

    bb = bb_frames_from_atom14(X)
    frames = torsion_angles_to_frames(bb, sincos, aatype)
    pred = frames_to_atom14_positions(frames, aatype)
    return jnp.concatenate([X[..., :4, :], pred[..., 4:, :]], axis=-2)
