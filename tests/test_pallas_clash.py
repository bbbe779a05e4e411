"""Pallas clash kernel vs the jnp blocked implementation (interpret mode on
CPU; the real-TPU path is exercised by bench/eval flows)."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from packppi_tpu.chem import CHEM
from packppi_tpu.data import stack_batch
from packppi_tpu.ops.clash import between_residue_clash
from packppi_tpu.ops.pallas_clash import between_residue_clash_pallas
from packppi_tpu.structure import from_pdb_file
from packppi_tpu.structure.featurize import featurize

from conftest import FIXTURES


@pytest.fixture(scope="module")
def brs_batch():
    f = featurize(from_pdb_file(os.path.join(FIXTURES, "1brs.pdb"), mse_to_met=True))
    return stack_batch([f], target_len=len(f["residue_type"]))


def test_pallas_kernel_matches_jnp(brs_batch):
    b = brs_batch
    radius = jnp.asarray(CHEM.vdw_radius_atom14)[b.residue_type] * b.atom_mask
    ref = between_residue_clash(jnp.asarray(b.X), jnp.asarray(b.atom_mask),
                                radius, jnp.asarray(b.residue_index),
                                tol_soft=0.5, block=64)["per_atom_loss_sum"]
    got = between_residue_clash_pallas(jnp.asarray(b.X), jnp.asarray(b.atom_mask),
                                       radius, jnp.asarray(b.residue_index),
                                       tol_soft=0.5, blk=512, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-3, rtol=1e-3)


def test_pallas_kernel_perturbed_chis(brs_batch):
    """Same comparison on a clash-heavy conformation (nonzero everywhere)."""
    from packppi_tpu.geometry import atom14_coords_from_torsions

    b = brs_batch
    rng = np.random.default_rng(0)
    sc_bad = jnp.asarray(np.asarray(b.SC_D)
                         + rng.normal(0, 0.8, b.SC_D.shape).astype(np.float32)
                         * np.asarray(b.SC_D_mask))
    coords = atom14_coords_from_torsions(b.X, b.residue_type, b.BB_D, sc_bad)
    radius = jnp.asarray(CHEM.vdw_radius_atom14)[b.residue_type] * b.atom_mask

    ref = between_residue_clash(coords, jnp.asarray(b.atom_mask), radius,
                                jnp.asarray(b.residue_index),
                                tol_soft=0.5, block=128)["per_atom_loss_sum"]
    got = between_residue_clash_pallas(coords, jnp.asarray(b.atom_mask), radius,
                                       jnp.asarray(b.residue_index),
                                       tol_soft=0.5, blk=512, interpret=True)
    assert float(jnp.asarray(ref).sum()) > 1.0  # the perturbation really clashes
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-3, rtol=1e-3)


def test_pallas_spatial_sort_parity(brs_batch):
    """Morton-sorted path (spatial_sort=True): same values AND gradients as
    the unsorted kernel — culling + permutation must be value-neutral."""
    import jax

    from packppi_tpu.ops.pallas_clash import between_residue_clash_diff

    b = brs_batch
    radius = jnp.asarray(CHEM.vdw_radius_atom14)[b.residue_type] * b.atom_mask
    pos = jnp.asarray(b.X)
    ex = jnp.asarray(b.atom_mask)
    ridx = jnp.asarray(b.residue_index)

    # small blk so the fixture spans MANY tiles and culling really bites
    v_ref = between_residue_clash_pallas(pos, ex, radius, ridx, tol_soft=0.5,
                                         blk=256, interpret=True,
                                         spatial_sort=False)
    v_got = between_residue_clash_pallas(pos, ex, radius, ridx, tol_soft=0.5,
                                         blk=256, interpret=True,
                                         spatial_sort=True)
    np.testing.assert_allclose(np.asarray(v_got), np.asarray(v_ref),
                               atol=1e-5, rtol=1e-5)

    def loss(p, sort):
        out = between_residue_clash_diff(p, ex, radius, ridx, tol_soft=0.5,
                                         blk=256, interpret=True,
                                         spatial_sort=sort)
        return out.sum()

    g_ref = jax.grad(lambda p: loss(p, False))(pos)
    g_got = jax.grad(lambda p: loss(p, True))(pos)
    assert float(jnp.abs(g_ref).sum()) > 1e-3
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               atol=1e-4, rtol=1e-3)


def test_pallas_diff_gradient_parity(brs_batch):
    """custom-VJP kernel gradient == grad-through-scan gradient (positions)."""
    import jax

    from packppi_tpu.ops.pallas_clash import between_residue_clash_diff

    b = brs_batch
    radius = jnp.asarray(CHEM.vdw_radius_atom14)[b.residue_type] * b.atom_mask
    rng = np.random.default_rng(1)
    # weighted sum (non-uniform cotangent) so row/col contributions are
    # distinguishable; restrict weights to existing atoms
    w = jnp.asarray(rng.uniform(0.1, 1.0, b.atom_mask.shape).astype(np.float32)
                    * np.asarray(b.atom_mask))
    pos = jnp.asarray(b.X)
    ex = jnp.asarray(b.atom_mask)
    ridx = jnp.asarray(b.residue_index)

    def via_scan(p):
        out = between_residue_clash(p, ex, radius, ridx,
                                    tol_soft=0.5, block=64)["per_atom_loss_sum"]
        return (w * out).sum()

    def via_pallas(p):
        out = between_residue_clash_diff(p, ex, radius, ridx,
                                         tol_soft=0.5, interpret=True)
        return (w * out).sum()

    g_ref = jax.grad(via_scan)(pos)
    g_got = jax.grad(via_pallas)(pos)
    assert float(jnp.abs(g_ref).sum()) > 1e-3  # the test is not vacuous
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               atol=2e-4, rtol=1e-3)


def test_compute_residue_clash_backend_grad_parity(brs_batch):
    """End-to-end torsion gradients: backend='pallas_interpret' vs 'scan'
    through the full torsions->coords->clash chain used by proximal."""
    import jax

    from packppi_tpu.ops.clash import compute_residue_clash

    b = brs_batch
    rng = np.random.default_rng(2)
    sc_bad = jnp.asarray(np.asarray(b.SC_D)
                         + rng.normal(0, 0.6, b.SC_D.shape).astype(np.float32)
                         * np.asarray(b.SC_D_mask))

    def loss(sc, backend):
        prc = compute_residue_clash(b, sc, backend=backend)
        return (prc * b.residue_mask).sum()

    v_ref, g_ref = jax.value_and_grad(lambda s: loss(s, "scan"))(sc_bad)
    v_got, g_got = jax.value_and_grad(lambda s: loss(s, "pallas_interpret"))(sc_bad)
    assert float(v_ref) > 0.1
    np.testing.assert_allclose(float(v_got), float(v_ref), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               atol=5e-4, rtol=2e-3)
