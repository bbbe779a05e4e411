"""Host-side featurization: Protein -> the canonical dense feature dict.

Every model in the framework consumes this fixed-shape schema (per protein,
before batching/padding): ``X [L,14,3]``, ``atom_mask [L,14]``,
``residue_type [L]``, ``residue_mask [L]``, ``residue_index [L]`` (with +100
inter-chain offsets), ``chain_indices [L]``, ``BB_D/BB_D_sincos/BB_D_mask``,
``SC_D/SC_D_sincos/SC_D_mask``, ``chi_{1,2}pi_periodic_mask``.

Semantics match the reference dataset transform bit-for-bit (reference:
src/datamodules/components/complex_dataset.py:64-148,
src/datamodules/components/helper.py:20-101), including its quirks:
pre-omega column reordering, ``SC_D_mask`` defined as ``dihedral != 0``, and
the cumulative +100 residue-index offset between chains. Runs in numpy on the
host; outputs are cached, and the device only ever sees the padded arrays.
"""
from __future__ import annotations

import numpy as np

from packppi_tpu.chem import CHEM
from packppi_tpu.structure.protein import Protein


def _normalize(v: np.ndarray, axis: int = -1) -> np.ndarray:
    with np.errstate(invalid="ignore", divide="ignore"):
        out = v / np.linalg.norm(v, axis=axis, keepdims=True)
    return np.nan_to_num(out)


def dihedrals_along_chain_np(points: np.ndarray, eps: float = 1e-8) -> np.ndarray:
    """Numpy twin of geometry.dihedrals_along_chain (featurization sign
    convention)."""
    u = _normalize(points[..., 1:, :] - points[..., :-1, :])
    u2, u1, u0 = u[..., :-2, :], u[..., 1:-1, :], u[..., 2:, :]
    n2 = _normalize(np.cross(u2, u1))
    n1 = _normalize(np.cross(u1, u0))
    with np.errstate(invalid="ignore"):
        cos_d = np.clip(np.sum(n2 * n1, -1), -1 + eps, 1 - eps)
        return np.sign(np.sum(u2 * n1, -1)) * np.arccos(cos_d)


def bb_dihedrals(X: np.ndarray, residue_index: np.ndarray | None = None,
                 use_pre_omega: bool = True):
    """Backbone dihedrals [L,3] + validity mask.

    With ``use_pre_omega`` the columns are (pre-omega, phi, psi): each
    residue carries the omega of the preceding peptide bond.
    """
    L = X.shape[0]
    chain = X[:, :3].reshape(3 * L, 3)
    d = dihedrals_along_chain_np(chain)
    d = np.concatenate([[np.nan], d, [np.nan, np.nan]])  # phi[0], psi[-1], omega[-1]
    d = d.reshape(L, 3)  # columns: phi, psi, omega

    if residue_index is not None:
        pre = np.concatenate([[0.0], (residue_index[1:] - 1 == residue_index[:-1]).astype(np.float32)])
        post = np.concatenate([(residue_index[:-1] + 1 == residue_index[1:]).astype(np.float32), [0.0]])
        mask = np.stack([pre, post, post], -1)
    else:
        mask = np.ones_like(d, dtype=np.float32)

    if use_pre_omega:
        omega_pre = np.concatenate([[np.nan], d[:-1, 2]])
        d = np.stack([omega_pre, d[:, 0], d[:, 1]], -1)
        mask[:, 1] = mask[:, 0]  # phi shares the needs-previous-residue mask

    mask = mask * np.isfinite(d).astype(np.float32)
    return d, mask


def sc_dihedrals(X: np.ndarray, aatype: np.ndarray):
    """Side-chain chi angles [L,4] + mask (mask is ``angle != 0`` after
    scrubbing, per the reference's convention)."""
    idx = CHEM.chi_atom14_indices[aatype]                      # [L, 7]
    cmask = CHEM.chi_mask[aatype]                              # [L, 4]
    pts = np.take_along_axis(X, idx[..., None].astype(np.int64).repeat(3, -1), axis=-2)
    d = dihedrals_along_chain_np(pts)                          # [L, 4]
    d = np.nan_to_num(d) * cmask
    return d, (d != 0.0).astype(np.float32)


def apply_chain_residue_offsets(residue_index: np.ndarray, chain_indices: np.ndarray,
                                gap: int = 100) -> np.ndarray:
    """Inter-chain residue-index offsets: each chain is shifted past the
    previous chain's maximum plus a ``gap``-residue buffer.

    INTENTIONAL DELTA from the reference
    (src/datamodules/components/complex_dataset.py:86-92): the reference's
    running offset re-reads already-offset indices, so gaps COMPOUND —
    offsets double per chain and a 24-chain complex overflows int32
    (measured 4.2e9 -> negative indices after the device cast) and exceeds
    f32's 2^24 integer-exact range (which silently broke the clash
    kernel's <, ==, and +1 residue-index tests on chains >= 17). Offsets
    here accumulate the ORIGINAL per-chain maxima instead: bit-identical
    for <= 2 chains (every golden fixture), and observationally identical
    beyond that — every consumer sees only clipped relative offsets
    (encoder._relpos clips at +-32 << gap), +1 adjacency (bb_dihedrals,
    peptide-bond exemptions; intra-chain, unchanged), or order (clash
    upper-triangle; preserved). Max index is now bounded by
    sum(per-chain max) + gap * n_chains, int32/f32-safe past 100k
    residues. Documented in PARITY.md "Known quirks"."""
    orig = residue_index
    residue_index = residue_index.copy()
    uniq = np.unique(chain_indices)
    offset = 0
    for k in uniq[:-1]:
        offset += orig[chain_indices == k].max() + gap
        residue_index[chain_indices == k + 1] += offset
    return residue_index


def featurize(protein: Protein) -> dict[str, np.ndarray]:
    """Protein -> canonical feature dict (all numpy, NaN-scrubbed)."""
    X = protein.atom_positions.astype(np.float32)
    residue_type = protein.aaindex.astype(np.int64)
    atom_mask = protein.atom_mask.astype(np.float32)
    residue_index = protein.residue_index.astype(np.int64)

    # factorize chain ids in order of first appearance, 1-based
    _, first_idx = np.unique(protein.chain_id, return_index=True)
    order = protein.chain_id[np.sort(first_idx)]
    chain_map = {c: i + 1 for i, c in enumerate(order)}
    chain_indices = np.array([chain_map[c] for c in protein.chain_id], np.int64)

    if len(order) > 1:
        residue_index = apply_chain_residue_offsets(residue_index, chain_indices)
    if np.abs(residue_index).max() >= 2**24:
        # the clash kernels carry residue indices in f32 metadata (exact
        # integers only below 2^24) and devices are int32-only
        raise ValueError(
            f"residue_index max {residue_index.max()} exceeds the 2^24 "
            "integer-exact f32 range (pathological input numbering?)")

    residue_mask = np.isfinite(X[:, :4].sum(axis=(-1, -2))).astype(np.float32)

    BB_D, BB_D_mask = bb_dihedrals(X, residue_index)
    SC_D, SC_D_mask = sc_dihedrals(X, residue_type)

    BB_D_sincos = np.stack([np.sin(BB_D), np.cos(BB_D)], -1) * BB_D_mask[..., None]
    SC_D_sincos = np.stack([np.sin(SC_D), np.cos(SC_D)], -1) * SC_D_mask[..., None]

    pi_periodic = CHEM.chi_pi_periodic[residue_type].astype(bool)

    rm = residue_mask
    feats = {
        "X": X * rm[:, None, None],
        "atom_mask": atom_mask * rm[:, None],
        "residue_type": (residue_type * rm).astype(np.int64),
        "residue_mask": rm,
        # int32: devices have no int64 (jnp silently wraps an int64 input —
        # the original compounding offsets DID overflow at 24 chains); the
        # non-compounding offsets above keep the max far inside int32/f32
        "residue_index": (residue_index * rm).astype(np.int32),
        "chain_indices": (chain_indices * rm).astype(np.int64),
        "BB_D": BB_D * rm[:, None],
        "BB_D_sincos": BB_D_sincos * rm[:, None, None],
        "BB_D_mask": BB_D_mask * rm[:, None],
        "SC_D": SC_D * rm[:, None],
        "SC_D_sincos": SC_D_sincos * rm[:, None, None],
        "SC_D_mask": SC_D_mask * rm[:, None],
        "chi_1pi_periodic_mask": (SC_D_mask * rm[:, None]).astype(bool) & pi_periodic,
        "chi_2pi_periodic_mask": (SC_D_mask * rm[:, None]).astype(bool) & ~pi_periodic,
    }
    return {k: (np.nan_to_num(v) if v.dtype.kind == "f" else v) for k, v in feats.items()}
