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


def test_many_chain_residue_offsets_bounded_and_kernel_exact():
    """Regression for the compounding chain-offset overflow: the reference's
    offset quirk doubled per chain (24 chains -> 4.2e9 -> int32 wrap on
    device, f32-inexact in the Pallas kernel metadata, which silently
    dropped ~10% of the 8k fixture's clash loss on chains >= 17). Offsets
    now accumulate ORIGINAL per-chain maxima: a 26-chain complex stays far
    inside the 2^24 f32-exact range and the Pallas kernel matches the scan
    oracle exactly (featurize.apply_chain_residue_offsets)."""
    import string

    from packppi_tpu.chem import CHEM
    from packppi_tpu.ops.clash import between_residue_clash
    from packppi_tpu.ops.pallas_clash import between_residue_clash_pallas
    from packppi_tpu.structure.protein import Protein

    rng = np.random.default_rng(0)
    n_chains, per = 26, 6
    L = n_chains * per
    # poly-GLY backbones on a jittered grid: chains overlap enough to clash
    pos = np.zeros((L, 14, 3), np.float32)
    base = rng.uniform(0, 14.0, (n_chains, 3)).astype(np.float32)
    for c in range(n_chains):
        for r in range(per):
            o = base[c] + np.array([3.4 * r, 0, 0], np.float32)
            pos[c * per + r, 0] = o                       # N
            pos[c * per + r, 1] = o + [1.46, 0, 0]        # CA
            pos[c * per + r, 2] = o + [2.0, 1.2, 0]       # C
            pos[c * per + r, 3] = o + [2.1, 2.2, 0.8]     # O
            pos[c * per + r, 4] = o + [1.5, -1.3, 0.6]    # CB (clash carrier:
            # backbone-backbone pairs are exempt by construction)
    mask = np.zeros((L, 14), np.float32)
    mask[:, :5] = 1.0
    prot = Protein(
        atom_positions=pos,
        aaindex=np.full(L, 0, np.int64),                  # ALA (has CB)
        atom_mask=mask,
        residue_index=np.tile(np.arange(1, per + 1), n_chains).astype(np.int64),
        chain_id=np.repeat(list(string.ascii_uppercase[:n_chains]), per),
        b_factors=np.zeros((L, 14), np.float32),
    )
    f = featurize(prot)
    assert f["residue_index"].max() < 2**24
    assert f["residue_index"].dtype == np.int32
    b = stack_batch([f], target_len=L)

    radius = jnp.asarray(CHEM.vdw_radius_atom14)[b.residue_type] * b.atom_mask
    ref = between_residue_clash(jnp.asarray(b.X), jnp.asarray(b.atom_mask),
                                radius, jnp.asarray(b.residue_index),
                                tol_soft=0.5, block=32)["per_atom_loss_sum"]
    got = between_residue_clash_pallas(jnp.asarray(b.X), jnp.asarray(b.atom_mask),
                                       radius, jnp.asarray(b.residue_index),
                                       tol_soft=0.5, blk=256, interpret=True)
    assert float(jnp.asarray(ref).sum()) > 0.1  # chains really clash
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
