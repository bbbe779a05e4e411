"""Rigid transforms as a flat pytree of (rotation, translation) arrays.

Unlike the reference's class hierarchy (reference: src/utils/rigid_utils.py:283,791)
this is a plain NamedTuple of jnp arrays with free functions — it composes with
jit/vmap/grad without any wrapper machinery, and XLA sees straight einsums.

Rotation matrices are stored with basis vectors in COLUMNS: ``rot @ p_local +
trans`` maps local to global coordinates.

Frame-from-3-points uses the reference's *legacy* axis convention
(reference: src/utils/rigid_utils.py:1127-1180, ``fixed=True``): for backbone
atoms (N, CA, C) the x-axis points CA->C and the y-axis is the Gram-Schmidt
remainder of CA->N. Trained checkpoints and the metric pipeline depend on this
convention, so it is deliberately NOT the AlphaFold2 supplement's.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Rigid(NamedTuple):
    rot: jnp.ndarray    # [..., 3, 3]
    trans: jnp.ndarray  # [..., 3]

    @property
    def shape(self):
        return self.trans.shape[:-1]

    def __getitem__(self, idx):  # index the batch dims only
        if not isinstance(idx, tuple):
            idx = (idx,)
        # anchor Ellipsis-relative indexing to the batch dims, not the 3x3/3
        return Rigid(self.rot[(*idx, slice(None), slice(None))],
                     self.trans[(*idx, slice(None))])


def identity(batch_shape, dtype=jnp.float32) -> Rigid:
    rot = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (*batch_shape, 3, 3))
    trans = jnp.zeros((*batch_shape, 3), dtype)
    return Rigid(rot, trans)


def compose(a: Rigid, b: Rigid) -> Rigid:
    """a then b in a's frame: x -> a(b(x))."""
    rot = a.rot @ b.rot
    trans = jnp.einsum("...ij,...j->...i", a.rot, b.trans) + a.trans
    return Rigid(rot, trans)


def rigid_apply(r: Rigid, points: jnp.ndarray) -> jnp.ndarray:
    """Map local points [..., 3] into the global frame."""
    return jnp.einsum("...ij,...j->...i", r.rot, points) + r.trans


def invert_apply(r: Rigid, points: jnp.ndarray) -> jnp.ndarray:
    """Map global points into the local frame (rotation transpose)."""
    return jnp.einsum("...ji,...j->...i", r.rot, points - r.trans)


def invert(r: Rigid) -> Rigid:
    rot_t = jnp.swapaxes(r.rot, -1, -2)
    return Rigid(rot_t, -jnp.einsum("...ij,...j->...i", rot_t, r.trans))


def scale_translation(r: Rigid, factor) -> Rigid:
    return Rigid(r.rot, r.trans * factor)


def from_4x4(m: jnp.ndarray) -> Rigid:
    return Rigid(m[..., :3, :3], m[..., :3, 3])


def to_4x4(r: Rigid) -> jnp.ndarray:
    batch = r.trans.shape[:-1]
    m = jnp.zeros((*batch, 4, 4), r.trans.dtype)
    m = m.at[..., :3, :3].set(r.rot)
    m = m.at[..., :3, 3].set(r.trans)
    m = m.at[..., 3, 3].set(1.0)
    return m


def rigid_from_3_points(p_a: jnp.ndarray, origin: jnp.ndarray, p_b: jnp.ndarray,
                        eps: float = 1e-8) -> Rigid:
    """Frame from three points, legacy convention (see module docstring).

    x-axis: origin->p_b (normalized); y-axis: origin->p_a orthogonalized
    against x; z = x × y. Origin is the translation.
    """
    e0 = p_b - origin
    e1 = p_a - origin
    e0 = e0 / jnp.sqrt(jnp.sum(e0 * e0, -1, keepdims=True) + eps)
    e1 = e1 - e0 * jnp.sum(e0 * e1, -1, keepdims=True)
    e1 = e1 / jnp.sqrt(jnp.sum(e1 * e1, -1, keepdims=True) + eps)
    e2 = jnp.cross(e0, e1)
    rot = jnp.stack([e0, e1, e2], axis=-1)  # columns
    return Rigid(rot, origin)


def bb_frames_from_atom14(X: jnp.ndarray) -> Rigid:
    """Backbone frames from atom14 coordinates [..., 14, 3] (N=0, CA=1, C=2)."""
    return rigid_from_3_points(X[..., 0, :], X[..., 1, :], X[..., 2, :])
