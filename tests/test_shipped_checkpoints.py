"""The checkpoints shipped under docs/ckpts/ stay loadable and useful.

Guards the round-3 artifacts: the crop-trained diffusion model (first
in-repo model packing above chance) and the affinity CV checkpoint layout.
These are the artifacts EXAMPLES.md and PARITY.md cite — a silent format
or tree break would invalidate the documented results.
"""
import os

import jax
import numpy as np
import pytest

from conftest import FIXTURES

REPO = os.path.join(os.path.dirname(__file__), "..")
DIFFUSION_CKPT = os.path.join(REPO, "docs", "ckpts", "diffusion_crops", "params")


@pytest.mark.skipif(not os.path.isdir(DIFFUSION_CKPT), reason="checkpoint absent")
def test_diffusion_crops_checkpoint_packs_in_distribution():
    """The shipped params load against the default NetworkConfig tree and
    pack a 1BRS window (training distribution) far above chance."""
    from packppi_tpu.data import stack_batch
    from packppi_tpu.models import NetworkConfig, SampleConfig, TorsionalDiffusion
    from packppi_tpu.structure import from_pdb_file
    from packppi_tpu.structure.featurize import featurize
    from packppi_tpu.train import load_model_params
    from packppi_tpu.utils.metrics import chi_metrics

    feats = featurize(from_pdb_file(os.path.join(FIXTURES, "1brs.pdb"),
                                    mse_to_met=True))
    small = {k: v[:64] for k, v in feats.items()}
    batch = stack_batch([small], target_len=64)
    model = TorsionalDiffusion.create(NetworkConfig(), SampleConfig())
    template = jax.eval_shape(lambda: model.init(jax.random.key(0), batch))
    params = load_model_params(DIFFUSION_CKPT, template)

    sc = model.sample(params, jax.random.key(1), batch, n_steps=30)
    m = chi_metrics(batch.SC_D, np.asarray(sc), batch.SC_D_mask,
                    batch.chi_1pi_periodic_mask)
    # in-distribution accuracy is ~0.93; chance is ~0.13 — a generous
    # threshold still catches any loading/format/semantics regression
    assert m["chi_0_acc"] > 0.7
    assert m["total_acc"] > 0.6


@pytest.mark.skipif(not os.path.isdir(DIFFUSION_CKPT), reason="checkpoint absent")
def test_diffusion_crops_checkpoint_rejects_wrong_config():
    """Loading against a mismatched network width fails loudly instead of
    silently producing garbage."""
    from packppi_tpu.data import stack_batch
    from packppi_tpu.models import NetworkConfig, SampleConfig, TorsionalDiffusion
    from packppi_tpu.structure import from_pdb_file
    from packppi_tpu.structure.featurize import featurize
    from packppi_tpu.train import load_model_params

    feats = featurize(from_pdb_file(os.path.join(FIXTURES, "1brs.pdb"),
                                    mse_to_met=True))
    batch = stack_batch([{k: v[:32] for k, v in feats.items()}], target_len=32)
    model = TorsionalDiffusion.create(NetworkConfig(hidden_dim=64, node_features=64,
                                                    edge_features=64),
                                      SampleConfig())
    template = jax.eval_shape(lambda: model.init(jax.random.key(0), batch))
    with pytest.raises(ValueError, match="does not match"):
        load_model_params(DIFFUSION_CKPT, template)


AFFINITY_DIR = os.path.join(REPO, "docs", "ckpts", "affinity_skempi_mini_pretrained")


@pytest.mark.skipif(not os.path.isdir(AFFINITY_DIR), reason="checkpoint absent")
def test_pretrained_affinity_checkpoint_predicts():
    """The shipped pretrained-backbone affinity artifact runs the ddg CLI
    end-to-end and reproduces a finite prediction."""
    import argparse

    from packppi_tpu.cli.ddg import run

    args = argparse.Namespace(
        input=os.path.join(FIXTURES, "2ftl.pdb"), mutstr="KI15G",
        ckpt=os.path.join(AFFINITY_DIR, "affinity"),
        pre_ckpt=os.path.join(AFFINITY_DIR, "backbone"),
        outdir="/tmp/ddg_shipped", platform=None, seed=0, mode="network",
        batch_size=1, eval_csv=None, esm_dir=None)
    ddg = run(args)
    assert np.isfinite(ddg)
