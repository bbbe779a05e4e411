"""Parity tests: chem tables vs golden values derived from the reference
(reference: src/utils/residue_constants.py)."""
import numpy as np

from packppi_tpu.chem import CHEM, make_atom14_dists_bounds, sc_atom14_mask


def test_rigid_group_default_frames(golden_chem):
    np.testing.assert_allclose(
        CHEM.rigid_group_default_frame,
        golden_chem["restype_rigid_group_default_frame"],
        atol=1e-6,
    )


def test_atom14_group_and_positions(golden_chem):
    np.testing.assert_array_equal(
        CHEM.atom14_to_rigid_group, golden_chem["restype_atom14_to_rigid_group"])
    np.testing.assert_allclose(CHEM.atom14_mask, golden_chem["restype_atom14_mask"])
    np.testing.assert_allclose(
        CHEM.atom14_local_positions,
        golden_chem["restype_atom14_rigid_group_positions"],
        atol=1e-6,
    )


def test_chi_tables(golden_chem):
    np.testing.assert_array_equal(CHEM.chi_atom14_indices, golden_chem["chi_atom_indices_atom14"])
    np.testing.assert_allclose(CHEM.chi_mask, golden_chem["chi_mask_atom14"])


def test_dist_bounds(golden_chem):
    b = make_atom14_dists_bounds(overlap_tolerance=0.5, bond_length_tolerance_factor=12.0)
    np.testing.assert_allclose(b["lower_bound"], golden_chem["bounds_lower_05_12"], atol=1e-5)
    np.testing.assert_allclose(b["upper_bound"], golden_chem["bounds_upper_05_12"], atol=1e-5)


def test_sc_atom14_mask(golden_chem):
    for k in range(4):
        np.testing.assert_allclose(sc_atom14_mask(k), golden_chem[f"sc_atom14_mask_{k}"])


def test_vdw_radius(golden_chem):
    np.testing.assert_allclose(CHEM.vdw_radius_atom14, golden_chem["restype_atom_radius_atom14"])


def test_x_row_is_zero():
    assert CHEM.atom14_mask[20].sum() == 0
    assert CHEM.chi_mask[20].sum() == 0


def test_hbond_and_aux_tables():
    from packppi_tpu.chem import (ATOM7_GROUPS, ATOM8_GROUPS, ATOM16_TYPES,
                                  CG_ATOMS, HBOND_ACCEPTORS_ATOM14,
                                  HBOND_DONORS_ATOM14, RESTYPE_ORDER)

    ser = RESTYPE_ORDER["S"]
    # SER OG (slot 5) is both donor and acceptor
    assert HBOND_DONORS_ATOM14[ser, 5] == 1.0
    assert HBOND_ACCEPTORS_ATOM14[ser, 5] == 1.0
    # backbone N donates, O accepts, CA does neither
    assert HBOND_DONORS_ATOM14[ser, 0] == 1.0
    assert HBOND_ACCEPTORS_ATOM14[ser, 3] == 1.0
    assert HBOND_DONORS_ATOM14[ser, 1] == 0.0
    assert len(CG_ATOMS) == 20 and len(ATOM16_TYPES) == 16
    assert ATOM7_GROUPS.shape == (5, 7) and ATOM8_GROUPS.shape == (5, 8)
