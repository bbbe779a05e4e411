"""Clash-loss parity vs the reference (golden values on T1124) and proximal
optimizer behavior."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from packppi_tpu.data import stack_batch
from packppi_tpu.geometry import atom14_coords_from_torsions
from packppi_tpu.ops.clash import compute_residue_clash, sc_violation_loss
from packppi_tpu.sampling import proximal_optimize
from packppi_tpu.structure import from_pdb_file
from packppi_tpu.structure.featurize import featurize

from conftest import FIXTURES, GOLDEN


@pytest.fixture(scope="module")
def t1124():
    f = featurize(from_pdb_file(os.path.join(FIXTURES, "t1124.pdb"), mse_to_met=True))
    return f


@pytest.fixture(scope="module")
def golden():
    return dict(np.load(os.path.join(GOLDEN, "geometry_golden.npz")))


def _unpadded_batch(feats):
    return stack_batch([feats], target_len=len(feats["residue_type"]))


def test_per_atom_clash_matches_reference(t1124, golden):
    batch = _unpadded_batch(t1124)
    coords = atom14_coords_from_torsions(batch.X, batch.residue_type, batch.BB_D, batch.SC_D)
    np.testing.assert_allclose(np.asarray(coords[0]), golden["atom14_coords"], atol=2e-4)

    per_atom = sc_violation_loss(coords, batch.atom_mask, batch.residue_type,
                                 batch.residue_index, 12.0, 0.5, block=128)
    np.testing.assert_allclose(np.asarray(per_atom[0]), golden["per_atom_clash"],
                               atol=2e-3, rtol=1e-3)


def test_blocked_equals_unblocked(t1124):
    batch = _unpadded_batch(t1124)
    a = compute_residue_clash(batch, batch.SC_D, block=64)
    b = compute_residue_clash(batch, batch.SC_D, block=1024)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_clash_invariant_padding(t1124):
    unpadded = _unpadded_batch(t1124)
    padded = stack_batch([t1124])  # bucketed (larger) length
    a = np.asarray(compute_residue_clash(unpadded, unpadded.SC_D))
    L = a.shape[1]
    b = np.asarray(compute_residue_clash(padded, padded.SC_D))[:, :L]
    np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)


def test_proximal_reduces_clash_on_perturbed_chis(t1124):
    """Perturb chi angles to create clashes; proximal optimization must
    reduce both the objective and the clash term."""
    batch = _unpadded_batch(t1124)
    rng = np.random.default_rng(0)
    noise = rng.normal(0, 0.6, batch.SC_D.shape).astype(np.float32)
    sc_bad = jnp.asarray(np.asarray(batch.SC_D) + noise * np.asarray(batch.SC_D_mask))

    clash_before = float((compute_residue_clash(batch, sc_bad) * batch.residue_mask).sum())
    res = proximal_optimize(batch, sc_bad, num_steps=20)
    clash_after = float((compute_residue_clash(batch, res.SC_D) * batch.residue_mask).sum())

    assert res.losses[-1] < res.losses[0]
    assert clash_after < clash_before
    # untouched chis stay identical
    keep = ~np.asarray(res.clash_mask)
    np.testing.assert_array_equal(np.asarray(res.SC_D)[keep], np.asarray(sc_bad)[keep])


def test_proximal_supports_batches(t1124):
    """Unlike the reference (asserts num_proteins == 1), proximal
    optimization runs on B > 1 batches."""
    short = {k: v[:64] for k, v in t1124.items()}
    batch = stack_batch([short, short], target_len=64)
    rng = np.random.default_rng(1)
    bad = jnp.asarray(np.asarray(batch.SC_D)
                      + rng.normal(0, 0.7, batch.SC_D.shape).astype(np.float32)
                      * np.asarray(batch.SC_D_mask))
    res = proximal_optimize(batch, bad, num_steps=5)
    assert res.SC_D.shape == batch.SC_D.shape
    assert float(res.losses[-1]) < float(res.losses[0])
