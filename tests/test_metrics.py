"""Metric-suite unit tests (reference-quirk preserving) + interface mask."""
import os

import numpy as np

from packppi_tpu.structure import from_pdb_file
from packppi_tpu.structure.interface import interface_residue_mask
from packppi_tpu.utils.metrics import chi_metrics

from conftest import FIXTURES


def test_chi_metrics_exact_match_scores_zero_acc():
    """Reference quirk: accuracy requires chi_diff > 0, so an exact match
    does NOT count as accurate."""
    sc = np.random.default_rng(0).uniform(-np.pi, np.pi, (1, 10, 4))
    mask = np.ones((1, 10, 4))
    m = chi_metrics(sc, sc, mask, np.zeros_like(mask, bool))
    assert m["chi_0_acc"] == 0.0
    assert m["chi_0_ae_deg"] == 0.0


def test_chi_metrics_small_error_counts_accurate():
    sc = np.zeros((1, 10, 4))
    pred = sc + np.deg2rad(10.0)
    mask = np.ones((1, 10, 4))
    m = chi_metrics(sc, pred, mask, np.zeros_like(mask, bool))
    assert m["chi_0_acc"] == 1.0
    np.testing.assert_allclose(m["chi_0_ae_deg"], 10.0, atol=1e-6)


def test_chi_metrics_pi_periodic_folding():
    """A pi-periodic chi off by ~pi has AE folded to ~0."""
    sc = np.zeros((1, 5, 4))
    pred = sc + np.pi - 0.01
    mask = np.ones((1, 5, 4))
    pi_mask = np.ones((1, 5, 4), bool)
    m = chi_metrics(sc, pred, mask, pi_mask)
    assert m["chi_0_ae_rad"] < 0.011
    m2 = chi_metrics(sc, pred, mask, np.zeros_like(pi_mask))
    assert m2["chi_0_ae_rad"] > 3.0


def test_interface_mask_1brs():
    prot = from_pdb_file(os.path.join(FIXTURES, "1brs.pdb"), mse_to_met=True)
    m = interface_residue_mask(prot)
    assert m.shape == (len(prot.aaindex),)
    # barnase-barstar has a well-known interface: some but not all residues
    assert 10 < m.sum() < len(prot.aaindex)
    # both chains contribute
    chains = np.asarray(prot.chain_id)
    assert m[chains == "A"].sum() > 0 and m[chains == "D"].sum() > 0


def test_interface_mask_single_chain_is_zero():
    prot = from_pdb_file(os.path.join(FIXTURES, "1brs.pdb"), chain_id="A")
    assert interface_residue_mask(prot).sum() == 0


def test_chi_metrics_non_strict_is_boundary_and_padding_invariant():
    """strict_parity=False scores the periodicity-FOLDED error: a -3.13 vs
    +3.13 rad pair (1.5 deg across the periodic boundary) counts correct,
    exact matches count correct, and padded entries are excluded explicitly
    rather than via the reference's diff>0 quirk — so the values are
    invariant to the padding bucket. Parity mode is unchanged."""
    from packppi_tpu.utils.metrics import chi_metrics

    sc = np.zeros((1, 6, 4))
    pred = np.zeros((1, 6, 4))
    mask = np.zeros((1, 6, 4))
    mask[0, :3] = 1.0  # residues 3.. are padding
    sc[0, 0, 0], pred[0, 0, 0] = 3.13, -3.13   # across the boundary
    sc[0, 1, 0], pred[0, 1, 0] = 1.0, 1.0      # exact match
    sc[0, 2, 0], pred[0, 2, 0] = 0.5, 2.0      # genuinely wrong (86 deg)
    pi_mask = np.zeros((1, 6, 4), bool)

    m_strict = chi_metrics(sc, pred, mask, pi_mask)
    # reference quirks: boundary pair wrong (raw diff 358 deg), exact match
    # excluded by diff>0 -> 0/3 correct
    assert m_strict["chi_0_acc"] == 0.0

    m = chi_metrics(sc, pred, mask, pi_mask, strict_parity=False)
    # folded: boundary pair ~1.1 deg correct, exact match correct -> 2/3
    np.testing.assert_allclose(m["chi_0_acc"], 2.0 / 3.0, atol=1e-9)

    # padding invariance: double the padded length, values identical
    pad = lambda a: np.concatenate([a, np.zeros_like(a)], axis=1)
    m_pad = chi_metrics(pad(sc), pad(pred), pad(mask), pad(pi_mask),
                        strict_parity=False)
    for k, v in m.items():
        np.testing.assert_allclose(m_pad[k], v, atol=1e-12, err_msg=k)

    # pi-periodic folding applies to accuracy too in non-strict mode
    sc2 = np.zeros((1, 1, 4))
    pred2 = sc2 + np.pi - 0.01
    one = np.ones((1, 1, 4))
    m2 = chi_metrics(sc2, pred2, one, one.astype(bool), strict_parity=False)
    assert m2["chi_0_acc"] == 1.0


def test_atom_rmsd_non_strict_true_rmsd_padding_invariant():
    """strict_parity=False turns the reference's no-sqrt, eps-per-element
    'atom_rmsd' into a true RMSD (sqrt, masked denominator) whose value does
    not depend on the padding bucket; parity mode keeps the quirk."""
    from packppi_tpu.utils.metrics import mean_squared_atom_deviation

    rng = np.random.RandomState(0)
    true = rng.randn(1, 4, 14, 3)
    pred = true + 0.5
    am = np.ones((1, 4, 14))
    rm = np.ones((1, 4))

    v = mean_squared_atom_deviation(true, pred, am, rm, strict_parity=False)
    # every atom displaced by 0.5 in each of 3 components: RMSD = sqrt(0.75)
    np.testing.assert_allclose(v, np.sqrt(0.75), atol=1e-6)

    pad = lambda a: np.concatenate([a, np.zeros_like(a)], axis=1)
    v_pad = mean_squared_atom_deviation(pad(true), pad(pred), pad(am), pad(rm),
                                        strict_parity=False)
    np.testing.assert_allclose(v_pad, v, atol=1e-12)

    # the strict (reference) value DOES move with padding: the eps is added
    # per mask ELEMENT, so doubling the padded length grows the denominator
    s = mean_squared_atom_deviation(true, pred, am, rm)
    s_pad = mean_squared_atom_deviation(pad(true), pad(pred), pad(am), pad(rm))
    assert s != s_pad
    np.testing.assert_allclose(s, 0.75, atol=1e-4)


def test_prox_raw_on_reject_helper():
    """--no_strict_parity in packppi-prox: a rejected optimization emits the
    parsed input untouched instead of the reference's re-idealized rebuild
    (reference: src/proximal_optimize.py:50-55 rebuilds either way)."""
    from packppi_tpu.structure import from_pdb_file, to_pdb

    prot = from_pdb_file(os.path.join(FIXTURES, "2ftl.pdb"), mse_to_met=True)
    # the raw-on-reject path is a pure passthrough of the parsed structure:
    # writing it back must preserve every input coordinate bit-for-bit
    rt = from_pdb_file_str(to_pdb(prot))
    np.testing.assert_array_equal(rt.atom_positions[rt.atom_mask > 0],
                                  prot.atom_positions[prot.atom_mask > 0])


def from_pdb_file_str(text):
    from packppi_tpu.structure.protein import from_pdb_string
    return from_pdb_string(text)
