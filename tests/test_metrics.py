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
