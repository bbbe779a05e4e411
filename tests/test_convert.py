"""Checkpoint conversion + network-level forward parity with the reference.

The golden file holds a reference torch network's state_dict and its
activations on a real batch; converting those weights into our flax tree
must reproduce encoder features AND final scores — proving architectural
equivalence and reference-checkpoint convertibility.
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from convert_checkpoint import convert_diffusion_state_dict  # noqa: E402

from packppi_tpu.data import stack_batch
from packppi_tpu.models import NetworkConfig, SampleConfig, TorsionalDiffusion
from packppi_tpu.structure import from_pdb_file
from packppi_tpu.structure.featurize import featurize

from conftest import FIXTURES, GOLDEN


@pytest.fixture(scope="module")
def golden():
    z = np.load(os.path.join(GOLDEN, "network_golden.npz"))
    sd = {k[4:]: z[k] for k in z.files if k.startswith("sd::")}
    rest = {k: z[k] for k in z.files if not k.startswith("sd::")}
    return sd, rest


@pytest.fixture(scope="module")
def batch():
    feats = featurize(from_pdb_file(os.path.join(FIXTURES, "1brs.pdb"),
                                    chain_id="D", mse_to_met=True))
    return stack_batch([feats], target_len=len(feats["residue_type"]))


def test_converted_weights_reproduce_reference_outputs(golden, batch):
    sd, ref = golden
    params = convert_diffusion_state_dict(sd)
    model = TorsionalDiffusion.create(NetworkConfig(), SampleConfig())

    # shape-check against a fresh init (conversion must cover every leaf)
    init = model.init(jax.random.key(0), batch)
    conv_shapes = jax.tree.map(lambda x: np.asarray(x).shape, params)
    init_shapes = jax.tree.map(lambda x: np.asarray(x).shape, init)
    assert conv_shapes == init_shapes

    t = jnp.full(batch.residue_mask.shape, float(ref["t_value"]))
    score, h_out = model.apply(params, batch, jnp.asarray(batch.SC_D), t)

    np.testing.assert_allclose(np.asarray(h_out), ref["h_out"], atol=2e-3)
    np.testing.assert_allclose(np.asarray(score), ref["score"], atol=2e-3)


def test_knn_graph_matches_reference(golden, batch):
    _, ref = golden
    from packppi_tpu.ops.graph import masked_knn

    _, idx = masked_knn(jnp.asarray(batch.X[:, :, 1, :]),
                        jnp.asarray(batch.residue_mask), 32)
    np.testing.assert_array_equal(np.asarray(idx), ref["E_idx"])


def test_affinity_conversion_reproduces_reference(batch):
    """Reference AffinityPrediction weights -> AffinityNet: converted
    weights must reproduce the reference ddG prediction on a real mutation
    batch (1BRS KA25A+DD35A)."""
    from convert_checkpoint import convert_affinity_state_dict

    from packppi_tpu.data.skempi import parse_mutation, skempi_features, stack_affinity_batch
    from packppi_tpu.models.affinity import AffinityNet

    z = np.load(os.path.join(GOLDEN, "affinity_golden.npz"))
    sd = {k[4:]: z[k] for k in z.files if k.startswith("sd::")}

    prot_path = os.path.join(FIXTURES, "1brs.pdb")
    from packppi_tpu.structure import from_pdb_file
    prot = from_pdb_file(prot_path, mse_to_met=True)
    feats = skempi_features(prot, [parse_mutation("KA25A"), parse_mutation("DD35A")], ddg=4.85)
    abatch = stack_affinity_batch([feats], target_len=len(feats["residue_type"]))

    params = convert_affinity_state_dict(sd)
    net = AffinityNet(NetworkConfig(), mode="network")
    ddg, ddg_inv = net.apply(params, abatch.wild(), abatch.mutant(),
                             jnp.asarray(z["h_pret_wt"]), jnp.asarray(z["h_pret_mt"]),
                             jnp.asarray(abatch.mut_mask))
    np.testing.assert_allclose(float(ddg[0]), float(z["ddg"][0]), atol=5e-3)
    np.testing.assert_allclose(float(ddg_inv[0]), float(z["ddg_inv"][0]), atol=5e-3)
