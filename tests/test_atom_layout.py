"""atom14 <-> atom37 conversion + corrector/sigma-embedding smoke."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from packppi_tpu.structure import from_pdb_file
from packppi_tpu.structure.atom_layout import atom14_masks, atom14_to_atom37, atom37_to_atom14

from conftest import FIXTURES


def test_atom_layout_roundtrip():
    prot = from_pdb_file(os.path.join(FIXTURES, "1brs.pdb"), mse_to_met=True)
    x14 = np.nan_to_num(prot.atom_positions)[None].astype(np.float32)
    rt = prot.aaindex[None]

    x37 = atom14_to_atom37(x14, rt)
    back = atom37_to_atom14(x37, rt)
    mask = atom14_masks(rt)
    m = (mask["atom14_mask"] * prot.atom_mask[None]).astype(bool)
    np.testing.assert_allclose(np.asarray(back)[m], x14[m], atol=1e-6)

    # CA (atom37 slot 1) equals atom14 slot 1 for every residue
    np.testing.assert_allclose(np.asarray(x37)[0, :, 1], x14[0, :, 1], atol=1e-6)


def test_sampler_with_corrector_steps():
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from __graft_entry__ import _synthetic_batch

    from packppi_tpu.models import NetworkConfig, SampleConfig, TorsionalDiffusion

    model = TorsionalDiffusion.create(NetworkConfig(), SampleConfig())
    batch = _synthetic_batch(1, 16)
    params = model.init(jax.random.key(0), batch)
    sc = model.sample(params, jax.random.key(1), batch, n_steps=2, corrector_steps=1)
    sc = np.asarray(sc)
    assert np.isfinite(sc).all()
    assert (sc[np.asarray(batch.SC_D_mask) == 0] == 0).all()


def test_sigma_embedding_modes():
    from packppi_tpu.models.layers import SigmaEmbedding

    x = jnp.ones((2, 8, 32))
    sigma = jnp.full((2, 8), 0.5)
    for op in ("pre_concat", "post_add"):
        mod = SigmaEmbedding(hidden_dim=16, operation=op)
        params = mod.init(jax.random.key(0), x, sigma)
        out = mod.apply(params, x, sigma)
        assert out.shape == (2, 8, 16)
        assert np.isfinite(np.asarray(out)).all()


def test_static_edge_dtype_modes_agree():
    """The sampler's static edge cache quantizes to bf16/int8 with sub-
    millidegree chi deviation (per-channel symmetric int8, dequant on
    read); masked chis stay zero."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from __graft_entry__ import _synthetic_batch

    from packppi_tpu.models import NetworkConfig, SampleConfig, TorsionalDiffusion

    batch = _synthetic_batch(1, 32)
    outs = {}
    for sd in ("float32", "bfloat16", "int8"):
        model = TorsionalDiffusion.create(NetworkConfig(static_edge_dtype=sd),
                                          SampleConfig())
        params = model.init(jax.random.key(0), batch)
        outs[sd] = np.asarray(model.sample(params, jax.random.key(1), batch,
                                           n_steps=2))
    m = np.asarray(batch.SC_D_mask) > 0
    for sd in ("bfloat16", "int8"):
        assert np.abs(outs[sd] - outs["float32"])[m].max() < 0.01
        assert (outs[sd][~m] == 0).all()
