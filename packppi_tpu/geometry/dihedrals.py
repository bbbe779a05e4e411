"""Dihedral-angle math, vectorized for XLA.

Two callers with slightly different sign conventions, both preserved from the
reference for metric parity:

* ``dihedrals_along_chain`` — the featurization convention
  (reference: src/datamodules/components/helper.py:20-36): dihedral sign from
  ``sign(u_{i} . n_{i+1})``.
* ``dihedral_from_four_points`` — the encoder's pairwise-dihedral convention
  (reference: src/models/components/encoder.py:164-174).
"""
from __future__ import annotations

import jax.numpy as jnp

TWO_PI = 2.0 * jnp.pi


def wrap_angle(x: jnp.ndarray) -> jnp.ndarray:
    """Wrap to [-pi, pi)."""
    return (x + jnp.pi) % TWO_PI - jnp.pi


def _safe_normalize(v: jnp.ndarray, axis: int = -1, eps: float = 1e-20) -> jnp.ndarray:
    # zero vectors normalize to zero WITHOUT producing intermediate NaNs,
    # so the deliberate degenerate cases stay compatible with jax_debug_nans
    n = jnp.sqrt(jnp.sum(v * v, axis=axis, keepdims=True))
    return jnp.where(n > eps, v, 0.0) / jnp.maximum(n, eps)


def dihedrals_along_chain(points: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Dihedrals over a chain of points [..., M, 3] -> [..., M-3].

    The k-th dihedral is about the bond (k+1, k+2).
    """
    u = _safe_normalize(points[..., 1:, :] - points[..., :-1, :])
    u2, u1, u0 = u[..., :-2, :], u[..., 1:-1, :], u[..., 2:, :]
    n2 = _safe_normalize(jnp.cross(u2, u1))
    n1 = _safe_normalize(jnp.cross(u1, u0))
    cos_d = jnp.clip(jnp.sum(n2 * n1, -1), -1 + eps, 1 - eps)
    sign = jnp.sign(jnp.sum(u2 * n1, -1))
    return sign * jnp.arccos(cos_d)


def dihedral_from_four_points(p0, p1, p2, p3):
    """Dihedral defined by points p0-p1-p2-p3 (encoder convention).

    Bit-parity edge case: the reference takes arccos of the *unclamped*
    normal dot product, so rounding past +/-1 at degenerate (near-parallel /
    near-antiparallel) normals yields NaN -> nan_to_num -> 0 (reference:
    src/models/components/encoder.py:164-174). We clamp for a finite
    gradient but return 0 exactly where the reference would.
    """
    axis = p2 - p1
    v1 = p0 - p1
    v2 = p3 - p2
    n1 = _safe_normalize(jnp.cross(axis, v1))
    n2 = _safe_normalize(jnp.cross(axis, v2))
    sign = jnp.sign(jnp.sum(jnp.cross(v1, v2) * axis, -1))
    dot = jnp.sum(n1 * n2, -1)
    d = sign * jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    return jnp.where(jnp.abs(dot) > 1.0, 0.0, jnp.nan_to_num(d))
