"""Geometry core tests: rigid algebra invariants + golden parity with the
reference torsions->coordinates chain on the T1124 fixture."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from packppi_tpu.geometry import (
    atom14_coords_from_torsions,
    compose,
    invert,
    invert_apply,
    rigid_apply,
    rigid_from_3_points,
    wrap_angle,
)
from packppi_tpu.structure import from_pdb_file
from packppi_tpu.structure.featurize import featurize, sc_dihedrals

from conftest import FIXTURES, GOLDEN


@pytest.fixture(scope="module")
def t1124_feats():
    return featurize(from_pdb_file(os.path.join(FIXTURES, "t1124.pdb"), mse_to_met=True))


@pytest.fixture(scope="module")
def golden_geom():
    return dict(np.load(os.path.join(GOLDEN, "geometry_golden.npz")))


def test_rigid_orthonormal_and_roundtrip():
    rng = np.random.default_rng(0)
    p = rng.normal(size=(5, 3, 3)).astype(np.float32)
    r = rigid_from_3_points(p[:, 0], p[:, 1], p[:, 2])
    eye = np.einsum("...ij,...kj->...ik", r.rot, r.rot)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (5, 3, 3)), atol=1e-5)

    pts = rng.normal(size=(5, 3)).astype(np.float32)
    back = invert_apply(r, rigid_apply(r, pts))
    np.testing.assert_allclose(back, pts, atol=1e-5)

    # compose with inverse is identity
    ident = compose(r, invert(r))
    np.testing.assert_allclose(ident.rot, np.broadcast_to(np.eye(3), (5, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(ident.trans, 0.0, atol=1e-5)


def test_wrap_angle():
    x = jnp.array([0.0, np.pi, -np.pi, 3 * np.pi, -2.5 * np.pi])
    w = wrap_angle(x)
    assert np.all(np.asarray(w) >= -np.pi) and np.all(np.asarray(w) < np.pi)
    np.testing.assert_allclose(np.cos(np.asarray(w)), np.cos(np.asarray(x)), atol=1e-6)


def test_sc_dihedrals_match_reference(t1124_feats, golden_geom):
    # atol covers float32 arccos sensitivity for angles at +-pi
    np.testing.assert_allclose(t1124_feats["SC_D"], golden_geom["sc_d"], atol=1e-4)
    np.testing.assert_array_equal(t1124_feats["SC_D_mask"], golden_geom["sc_mask"])


def test_atom14_reconstruction_matches_reference(t1124_feats, golden_geom):
    coords = atom14_coords_from_torsions(
        jnp.asarray(t1124_feats["X"]),
        jnp.asarray(t1124_feats["residue_type"]),
        jnp.asarray(t1124_feats["BB_D"]),
        jnp.asarray(t1124_feats["SC_D"]),
    )
    np.testing.assert_allclose(np.asarray(coords), golden_geom["atom14_coords"], atol=2e-4)


def test_chi_angles_survive_reconstruction(t1124_feats):
    """Rebuilding coordinates from chi angles then re-measuring the chi
    angles must be (nearly) the identity on chi-determined atoms."""
    coords = np.asarray(atom14_coords_from_torsions(
        jnp.asarray(t1124_feats["X"]),
        jnp.asarray(t1124_feats["residue_type"]),
        jnp.asarray(t1124_feats["BB_D"]),
        jnp.asarray(t1124_feats["SC_D"]),
    ))
    sc2, _ = sc_dihedrals(coords, t1124_feats["residue_type"])
    mask = t1124_feats["SC_D_mask"] * t1124_feats["residue_mask"][:, None]
    diff = np.abs(np.asarray(wrap_angle(jnp.asarray(sc2 - t1124_feats["SC_D"])))) * mask
    # placement uses idealized literature backbone geometry, so re-measured
    # chis are offset by the ideal-vs-experimental bond-geometry difference
    # (a few degrees worst case; the reference chain behaves identically)
    assert diff.sum() / mask.sum() < 0.02
    assert diff.max() < 0.15


def test_pdb_roundtrip(t1124_feats):
    from packppi_tpu.structure import from_pdb_string, to_pdb

    prot = from_pdb_file(os.path.join(FIXTURES, "t1124.pdb"), mse_to_met=True)
    prot2 = from_pdb_string(to_pdb(prot))
    np.testing.assert_array_equal(prot.aaindex, prot2.aaindex)
    np.testing.assert_array_equal(prot.atom_mask, prot2.atom_mask)
    np.testing.assert_array_equal(prot.residue_index, prot2.residue_index)
    m = prot.atom_mask.astype(bool)
    np.testing.assert_allclose(prot.atom_positions[m], prot2.atom_positions[m], atol=1.5e-3)


def test_bb_dihedrals_match_reference(t1124_feats, golden_geom):
    """Backbone dihedrals incl. the pre-omega column reorder and its mask
    overwrite quirk (golden replicates reference helper.calc_bb_dihedrals)."""
    g = dict(np.load(os.path.join(GOLDEN, "bb_dihedrals_golden.npz")))
    np.testing.assert_allclose(np.nan_to_num(t1124_feats["BB_D"])
                               * t1124_feats["residue_mask"][:, None],
                               g["bb_d"] * t1124_feats["residue_mask"][:, None],
                               atol=1e-4)
    np.testing.assert_array_equal(
        t1124_feats["BB_D_mask"] * t1124_feats["residue_mask"][:, None],
        g["bb_mask"] * t1124_feats["residue_mask"][:, None])
