"""Score-network + diffusion task smoke tests on a real (small) complex."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from packppi_tpu.data import stack_batch
from packppi_tpu.models.diffusion_net import NetworkConfig
from packppi_tpu.models.torsional_diffusion import SampleConfig, TorsionalDiffusion
from packppi_tpu.structure import from_pdb_file
from packppi_tpu.structure.featurize import featurize

from conftest import FIXTURES


@pytest.fixture(scope="module")
def small_batch():
    prot = from_pdb_file(os.path.join(FIXTURES, "1brs.pdb"), chain_id="D", mse_to_met=True)
    return stack_batch([featurize(prot)])


@pytest.fixture(scope="module")
def model():
    return TorsionalDiffusion.create(NetworkConfig(), SampleConfig())


@pytest.fixture(scope="module")
def params(model, small_batch):
    return model.init(jax.random.key(0), small_batch)


def test_forward_shapes(model, params, small_batch):
    B, L = small_batch.residue_mask.shape
    t = jnp.zeros((B, L))
    score, h_V = model.apply(params, small_batch, small_batch.SC_D, t)
    assert score.shape == (B, L, 4)
    assert h_V.shape == (B, L, 128)
    assert np.isfinite(np.asarray(score)).all()


def test_param_count(params):
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    # encoder + 3 IPMP layers with edge updates + score head: ~2.6M weights
    assert 1_000_000 < n < 6_000_000


def test_loss_finite_and_positive(model, params, small_batch):
    loss = model.loss(params, jax.random.key(1), small_batch)
    val = float(loss)
    assert np.isfinite(val) and val > 0


def test_sampler_output_valid(model, params, small_batch):
    sc = model.sample(params, jax.random.key(2), small_batch, n_steps=3)
    sc = np.asarray(sc)
    assert sc.shape == small_batch.SC_D.shape
    assert (sc >= -np.pi).all() and (sc < np.pi).all()
    # masked chis stay exactly zero
    assert (sc[np.asarray(small_batch.SC_D_mask) == 0] == 0).all()
    # real chis moved away from zero
    assert np.abs(sc[np.asarray(small_batch.SC_D_mask) == 1]).mean() > 0.1


def test_loss_decreases_under_no_noise_consistency(model, params, small_batch):
    """At t~0 (tiny sigma) the target score explodes; sanity: loss with the
    same key is deterministic."""
    l1 = float(model.loss(params, jax.random.key(3), small_batch))
    l2 = float(model.loss(params, jax.random.key(3), small_batch))
    assert l1 == l2


def test_eval_loss_deterministic_disables_dropout(model, params, small_batch):
    """loss(deterministic=True) must equal the loss of a dropout-0 model with
    the same params/key (dropout OFF), and differ from the dropout-ON
    training loss — the eval path trainers use for best-ckpt selection and
    early stopping must not compare dropout noise."""
    from packppi_tpu.models.diffusion_net import NetworkConfig as NC

    key = jax.random.key(7)
    l_eval = float(model.loss(params, key, small_batch, deterministic=True))
    model0 = TorsionalDiffusion.create(NC(dropout=0.0), SampleConfig())
    l_nodrop = float(model0.loss(params, key, small_batch))
    assert l_eval == l_nodrop
    l_train = float(model.loss(params, key, small_batch))
    assert l_train != l_eval


def test_static_edge_cache_is_exact(model, params, small_batch):
    """Forward with precomputed static edges must equal the fused forward."""
    import jax.numpy as jnp

    t = jnp.full(small_batch.residue_mask.shape, 0.41)
    static = model.encode_static(params, small_batch)
    s1, h1 = model.apply(params, small_batch, small_batch.SC_D, t)
    s2, h2 = model.apply(params, small_batch, small_batch.SC_D, t, static=static)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))


def test_vanilla_mpnn_variant(small_batch):
    """use_ipmp=False selects the sum-pooled MPNN stack (reference's
    non-geometric variant)."""
    from packppi_tpu.models.diffusion_net import NetworkConfig as NC

    model_v = TorsionalDiffusion.create(NC(use_ipmp=False), SampleConfig())
    params = model_v.init(jax.random.key(0), small_batch)
    t = jnp.zeros(small_batch.residue_mask.shape)
    score, h = model_v.apply(params, small_batch, small_batch.SC_D, t)
    assert score.shape == (*small_batch.residue_mask.shape, 4)
    assert np.isfinite(np.asarray(score)).all()


def test_gaussian_fourier_embedding():
    from packppi_tpu.models.layers import GaussianFourierEmbedding

    emb = GaussianFourierEmbedding(dim=16, scale=1.0)
    t = jnp.linspace(0, 1, 8)
    params = emb.init(jax.random.key(0), t)
    out = emb.apply(params, t)
    assert out.shape == (8, 16)
    # frozen: no gradient flows into W
    g = jax.grad(lambda p: emb.apply(p, t).sum())(params)
    assert float(jnp.abs(g["params"]["W"]).max()) == 0.0


def test_fused_messages_match_unfused(small_batch):
    """The Pallas fused message path (interpret mode on CPU) must match the
    unfused jnp path through the full network."""
    from packppi_tpu.models.diffusion_net import NetworkConfig as NC
    from packppi_tpu.models.ipmp import FactoredMessageMLP
    import functools
    from unittest import mock

    model_f = TorsionalDiffusion.create(NC(fused_messages=True), SampleConfig())
    model_u = TorsionalDiffusion.create(NC(), SampleConfig())
    params = model_u.init(jax.random.key(0), small_batch)
    t = jnp.full(small_batch.residue_mask.shape, 0.3)

    s_u, h_u = model_u.apply(params, small_batch, small_batch.SC_D, t)

    # route the fused path through the interpreter (no TPU in tests)
    orig = FactoredMessageMLP.__call__

    def patched(self, *args, **kw):
        kw["interpret"] = True
        return orig(self, *args, **kw)

    with mock.patch.object(FactoredMessageMLP, "__call__", patched):
        s_f, h_f = model_f.apply(params, small_batch, small_batch.SC_D, t)

    np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_u), atol=2e-5)
    np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_u), atol=2e-5)


def test_fused_messages_gradients_match_unfused(small_batch):
    """Training-path gradients through the fused message kernel
    (fused_message_diff: kernel forward, rematerialized-jnp custom-VJP
    backward, interpret mode on CPU) must match the unfused path's
    gradients. Locks the remat reference (_reference_message) against the
    unfused flax math, param grad by param grad."""
    from packppi_tpu.models.diffusion_net import NetworkConfig as NC
    from packppi_tpu.models.ipmp import FactoredMessageMLP
    from unittest import mock

    model_f = TorsionalDiffusion.create(
        NC(fused_messages=True, fused_messages_train=True), SampleConfig())
    model_u = TorsionalDiffusion.create(NC(), SampleConfig())
    params = model_u.init(jax.random.key(0), small_batch)
    key = jax.random.key(7)

    g_u = jax.grad(lambda p: model_u.loss(p, key, small_batch))(params)

    orig = FactoredMessageMLP.__call__

    def patched(self, *args, **kw):
        kw["interpret"] = True
        return orig(self, *args, **kw)

    with mock.patch.object(FactoredMessageMLP, "__call__", patched):
        g_f = jax.grad(lambda p: model_f.loss(p, key, small_batch))(params)

    flat_u = jax.tree_util.tree_leaves_with_path(g_u)
    flat_f = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(g_f)}
    assert len(flat_u) == len(flat_f)
    for k, v_u in flat_u:
        v_f = flat_f[jax.tree_util.keystr(k)]
        scale = max(float(jnp.abs(v_u).max()), 1e-3)
        np.testing.assert_allclose(
            np.asarray(v_f), np.asarray(v_u), atol=5e-4 * scale,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(k)}")


def test_fused_messages_geom_match_unfused(small_batch):
    """The geometry-in-kernel fused message path (fused_messages="geom",
    interpret mode on CPU) must match the unfused jnp path through the full
    network — locks both the in-VMEM geometry math and the plane-major
    weight-row permutation (_geom_weight_perm)."""
    from packppi_tpu.models.diffusion_net import NetworkConfig as NC
    from packppi_tpu.models.ipmp import FactoredMessageMLP
    from unittest import mock

    model_g = TorsionalDiffusion.create(NC(fused_messages="geom"), SampleConfig())
    model_u = TorsionalDiffusion.create(NC(), SampleConfig())
    params = model_u.init(jax.random.key(0), small_batch)
    t = jnp.full(small_batch.residue_mask.shape, 0.3)

    s_u, h_u = model_u.apply(params, small_batch, small_batch.SC_D, t)

    orig = FactoredMessageMLP.geom_fused

    def patched(self, *args, **kw):
        kw["interpret"] = True
        return orig(self, *args, **kw)

    with mock.patch.object(FactoredMessageMLP, "geom_fused", patched):
        s_g, h_g = model_g.apply(params, small_batch, small_batch.SC_D, t)

    np.testing.assert_allclose(np.asarray(s_g), np.asarray(s_u), atol=2e-5)
    np.testing.assert_allclose(np.asarray(h_g), np.asarray(h_u), atol=2e-5)


def test_fused_messages_geom_lanes_match_unfused(small_batch):
    """The LANE-MAJOR geometry-in-kernel fused message path
    (fused_messages="geom_lanes", interpret mode on CPU) must match the
    unfused jnp path through the full network — locks the in-VMEM
    lane-major feature math, the one-hot lane expansion of the per-node
    stack, and the transposed W_g^T contraction + rejoining transpose."""
    from packppi_tpu.models.diffusion_net import NetworkConfig as NC
    from packppi_tpu.models.ipmp import FactoredMessageMLP
    from unittest import mock

    model_g = TorsionalDiffusion.create(NC(fused_messages="geom_lanes"),
                                        SampleConfig())
    model_u = TorsionalDiffusion.create(NC(), SampleConfig())
    params = model_u.init(jax.random.key(0), small_batch)
    t = jnp.full(small_batch.residue_mask.shape, 0.3)

    s_u, h_u = model_u.apply(params, small_batch, small_batch.SC_D, t)

    orig = FactoredMessageMLP.geom_fused_lanes

    def patched(self, *args, **kw):
        kw["interpret"] = True
        return orig(self, *args, **kw)

    with mock.patch.object(FactoredMessageMLP, "geom_fused_lanes", patched):
        s_g, h_g = model_g.apply(params, small_batch, small_batch.SC_D, t)

    np.testing.assert_allclose(np.asarray(s_g), np.asarray(s_u), atol=2e-5)
    np.testing.assert_allclose(np.asarray(h_g), np.asarray(h_u), atol=2e-5)


def test_geom_lanes_folded_edge_chain_matches_unfused(small_batch):
    """geom_lanes + fused_chain folds the EDGE chain into the lanes message
    kernel (chain_weights path). Interpret mode on CPU: the full network
    must match the unfused jnp path — locks the in-kernel chain math, the
    reproduced message->chain boundary rounding, and the mask handling."""
    from packppi_tpu.models.diffusion_net import NetworkConfig as NC
    from packppi_tpu.models.ipmp import FactoredMessageMLP
    import packppi_tpu.ops.pallas_layer as pallas_layer
    from unittest import mock

    import packppi_tpu.models.ipmp as ipmp_mod

    model_f = TorsionalDiffusion.create(
        NC(fused_messages="geom_lanes", fused_chain=True), SampleConfig())
    model_u = TorsionalDiffusion.create(NC(), SampleConfig())
    params = model_u.init(jax.random.key(0), small_batch)
    t = jnp.full(small_batch.residue_mask.shape, 0.3)

    s_u, h_u = model_u.apply(params, small_batch, small_batch.SC_D, t)

    orig = FactoredMessageMLP.geom_fused_lanes

    def patched(self, *args, **kw):
        kw["interpret"] = True
        return orig(self, *args, **kw)

    prev, pallas_layer.INTERPRET = pallas_layer.INTERPRET, True
    prev_fold, ipmp_mod.FOLD_EDGE_CHAIN = ipmp_mod.FOLD_EDGE_CHAIN, True
    try:
        with mock.patch.object(FactoredMessageMLP, "geom_fused_lanes",
                               patched):
            s_f, h_f = model_f.apply(params, small_batch, small_batch.SC_D, t)
    finally:
        pallas_layer.INTERPRET = prev
        ipmp_mod.FOLD_EDGE_CHAIN = prev_fold

    np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_u), atol=3e-5)
    np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_u), atol=3e-5)


def test_fused_messages_geom_gather_match_unfused(small_batch):
    """The in-kernel-GATHER variant (fused_messages="geom_gather",
    interpret mode on CPU) must match the unfused jnp path through the full
    network — locks the one-hot j-term/neighbor-plane selections (exact
    bf16 / bf16x3 payload handling) on top of the lane-major geometry."""
    from packppi_tpu.models.diffusion_net import NetworkConfig as NC
    from packppi_tpu.models.ipmp import FactoredMessageMLP
    from unittest import mock

    model_g = TorsionalDiffusion.create(NC(fused_messages="geom_gather"),
                                        SampleConfig())
    model_u = TorsionalDiffusion.create(NC(), SampleConfig())
    params = model_u.init(jax.random.key(0), small_batch)
    t = jnp.full(small_batch.residue_mask.shape, 0.3)

    s_u, h_u = model_u.apply(params, small_batch, small_batch.SC_D, t)

    orig = FactoredMessageMLP.geom_fused_gather

    def patched(self, *args, **kw):
        kw["interpret"] = True
        return orig(self, *args, **kw)

    with mock.patch.object(FactoredMessageMLP, "geom_fused_gather", patched):
        s_g, h_g = model_g.apply(params, small_batch, small_batch.SC_D, t)

    np.testing.assert_allclose(np.asarray(s_g), np.asarray(s_u), atol=2e-5)
    np.testing.assert_allclose(np.asarray(h_g), np.asarray(h_u), atol=2e-5)


def test_fused_layers_match_unfused(small_batch):
    """The step-fused Pallas layer path (two VMEM-resident passes per IPMP
    layer, interpret mode on CPU) must match the unfused jnp path through
    the full network in f32."""
    from packppi_tpu.models.diffusion_net import NetworkConfig as NC
    import packppi_tpu.ops.pallas_layer as pallas_layer

    model_f = TorsionalDiffusion.create(NC(fused_layers=True), SampleConfig())
    model_u = TorsionalDiffusion.create(NC(), SampleConfig())
    params = model_u.init(jax.random.key(0), small_batch)
    t = jnp.full(small_batch.residue_mask.shape, 0.3)

    s_u, h_u = model_u.apply(params, small_batch, small_batch.SC_D, t)

    prev, pallas_layer.INTERPRET = pallas_layer.INTERPRET, True
    try:
        s_f, h_f = model_f.apply(params, small_batch, small_batch.SC_D, t)
    finally:
        pallas_layer.INTERPRET = prev

    np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_u), atol=3e-5)
    np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_u), atol=3e-5)


def test_fused_layers_skip_last_edge_update(small_batch):
    """fused_layers with skip_last_edge_update (the sampler's inference
    configuration) still matches the unfused forward."""
    from packppi_tpu.models.diffusion_net import NetworkConfig as NC
    import packppi_tpu.ops.pallas_layer as pallas_layer

    model_f = TorsionalDiffusion.create(NC(fused_layers=True), SampleConfig())
    model_u = TorsionalDiffusion.create(NC(), SampleConfig())
    params = model_u.init(jax.random.key(0), small_batch)
    t = jnp.full(small_batch.residue_mask.shape, 0.3)

    s_u, h_u = model_u.apply(params, small_batch, small_batch.SC_D, t)

    prev, pallas_layer.INTERPRET = pallas_layer.INTERPRET, True
    try:
        s_f, h_f = model_f.apply(params, small_batch, small_batch.SC_D, t,
                                 skip_last_edge_update=True)
    finally:
        pallas_layer.INTERPRET = prev

    np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_u), atol=3e-5)
    np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_u), atol=3e-5)


def test_fused_chain_matches_unfused(small_batch):
    """The single-Pallas-pass post-message chains (fused_chain: residual ->
    LN -> FFN -> LN [-> mask], interpret mode on CPU) must match the unfused
    flax chains through the full network, in f32 and with the bf16 stream."""
    from packppi_tpu.models.diffusion_net import NetworkConfig as NC
    import packppi_tpu.ops.pallas_layer as pallas_layer

    t = jnp.full(small_batch.residue_mask.shape, 0.3)
    # bf16 tolerance is single-ulp rounding-order noise on O(4) stream
    # values (the kernel adds residuals in f32-of-rounded-values where the
    # flax chain adds in bf16; measured max 0.031 on this fixture)
    for dtype, atol in (("float32", 3e-5), ("bfloat16", 6e-2)):
        model_f = TorsionalDiffusion.create(
            NC(compute_dtype=dtype, fused_chain=True), SampleConfig())
        model_u = TorsionalDiffusion.create(
            NC(compute_dtype=dtype), SampleConfig())
        params = model_u.init(jax.random.key(0), small_batch)

        s_u, h_u = model_u.apply(params, small_batch, small_batch.SC_D, t)

        prev, pallas_layer.INTERPRET = pallas_layer.INTERPRET, True
        try:
            s_f, h_f = model_f.apply(params, small_batch, small_batch.SC_D, t)
        finally:
            pallas_layer.INTERPRET = prev

        np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_u),
                                   atol=atol, err_msg=dtype)
        np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_u),
                                   atol=atol, err_msg=dtype)


def test_fused_chain_gradients_match_unfused(small_batch):
    """Training-path gradients through the fused post-message chains
    (fused_chain_train -> ops.pallas_layer.fused_chain_diff: kernel forward,
    jnp-replay custom-VJP backward, interpret mode on CPU) must match the
    unfused flax chains' gradients param-by-param. Runs at dropout=0.0 —
    the only configuration the gate admits (the kernel applies no dropout;
    NetworkConfig validates the combination)."""
    from packppi_tpu.models.diffusion_net import NetworkConfig as NC
    import packppi_tpu.ops.pallas_layer as pallas_layer
    import pytest

    model_f = TorsionalDiffusion.create(
        NC(dropout=0.0, fused_chain_train=True), SampleConfig())
    model_u = TorsionalDiffusion.create(NC(dropout=0.0), SampleConfig())
    params = model_u.init(jax.random.key(0), small_batch)
    key = jax.random.key(7)

    g_u = jax.grad(lambda p: model_u.loss(p, key, small_batch))(params)

    prev, pallas_layer.INTERPRET = pallas_layer.INTERPRET, True
    try:
        g_f = jax.grad(lambda p: model_f.loss(p, key, small_batch))(params)
    finally:
        pallas_layer.INTERPRET = prev

    flat_u = jax.tree_util.tree_leaves_with_path(g_u)
    flat_f = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(g_f)}
    assert len(flat_u) == len(flat_f)
    for k, v_u in flat_u:
        v_f = flat_f[jax.tree_util.keystr(k)]
        scale = max(float(jnp.abs(v_u).max()), 1e-3)
        np.testing.assert_allclose(
            np.asarray(v_f), np.asarray(v_u), atol=5e-4 * scale,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(k)}")

    # the config contract: fused_chain_train with dropout active is an error
    with pytest.raises(ValueError, match="dropout"):
        TorsionalDiffusion.create(
            NC(dropout=0.1, fused_chain_train=True), SampleConfig()
        ).init(jax.random.key(0), small_batch)


def test_mxu_gather_grad_auto_policy(small_batch):
    """Pins the "auto" policy table for the one-hot MXU gather backward
    (ops.graph.resolve_mxu_gather_grad): measured-sign shapes from the r5
    sweep (PERF.md) resolve to the winning side, the boundary sits at
    MXU_GATHER_GRAD_MAX_L, explicit booleans pass through, and a training
    step traces end-to-end with the auto knob (the trainer-config
    default)."""
    from packppi_tpu.models.diffusion_net import NetworkConfig as NC
    from packppi_tpu.ops.graph import (MXU_GATHER_GRAD_MAX_L,
                                       resolve_mxu_gather_grad)

    # measured-sign shapes (the sweep's unambiguous endpoints)
    assert resolve_mxu_gather_grad("auto", 768) is True
    assert resolve_mxu_gather_grad("auto", 1024) is True
    assert resolve_mxu_gather_grad("auto", 3072) is False
    # the boundary is exactly the measured-crossover constant
    assert resolve_mxu_gather_grad("auto", MXU_GATHER_GRAD_MAX_L) is True
    assert not resolve_mxu_gather_grad("auto", MXU_GATHER_GRAD_MAX_L + 1)
    # explicit booleans bypass the policy (existing configs unchanged)
    assert resolve_mxu_gather_grad(True, 10 ** 6) is True
    assert resolve_mxu_gather_grad(False, 1) is False

    model_a = TorsionalDiffusion.create(NC(mxu_gather_grad="auto"),
                                        SampleConfig())
    model_d = TorsionalDiffusion.create(NC(), SampleConfig())
    params = model_d.init(jax.random.key(0), small_batch)
    key = jax.random.key(7)
    g_a = jax.grad(lambda p: model_a.loss(p, key, small_batch))(params)
    g_d = jax.grad(lambda p: model_d.loss(p, key, small_batch))(params)
    # auto at this (small) L engages the one-hot backward: gradients are
    # the same sums up to float reassociation
    for (k, v_a), (_, v_d) in zip(
            jax.tree_util.tree_leaves_with_path(g_a),
            jax.tree_util.tree_leaves_with_path(g_d)):
        scale = max(float(jnp.abs(v_d).max()), 1e-3)
        np.testing.assert_allclose(
            np.asarray(v_a), np.asarray(v_d), atol=1e-4 * scale,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(k)}")


def test_skip_last_edge_update_is_exact(model, params, small_batch):
    """Skipping the final layer's (unconsumed) edge update must not change
    the network outputs."""
    t = jnp.full(small_batch.residue_mask.shape, 0.2)
    s0, h0 = model.apply(params, small_batch, small_batch.SC_D, t)
    s1, h1 = model.apply(params, small_batch, small_batch.SC_D, t,
                         skip_last_edge_update=True)
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
    np.testing.assert_array_equal(np.asarray(h0), np.asarray(h1))


def test_geometry_features_soa_matches_aos(small_batch):
    """The SoA geometry-feature rewrite is bit-near the direct AoS math."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from packppi_tpu.geometry.rigid import (Rigid, bb_frames_from_atom14,
                                            invert_apply, rigid_apply)
    from packppi_tpu.models.ipmp import InvariantPointLayer
    from packppi_tpu.ops.graph import gather_nodes, masked_knn

    # the original AoS norm (the oracle's own formulation, kept here — the
    # production SoA path inlines per-component sums instead)
    _norm = lambda v, eps=1e-8: jnp.sqrt(jnp.sum(v * v, -1) + eps)

    batch = small_batch
    B, L = batch.residue_mask.shape
    P, K = 8, 8
    frames = bb_frames_from_atom14(jnp.asarray(batch.X))
    _, idx = masked_knn(jnp.asarray(batch.X[:, :, 1, :]),
                        jnp.asarray(batch.residue_mask), K)
    rng = np.random.default_rng(0)
    h_V = jnp.asarray(rng.normal(size=(B, L, 16)).astype(np.float32))
    W = jnp.asarray(rng.normal(size=(16, P * 3)).astype(np.float32)) * 0.1
    points_fn = lambda h: h @ W

    layer = InvariantPointLayer(hidden_dim=16, n_points=P)
    soa = layer._geometry_features(h_V, idx, frames, points_fn)

    # direct AoS reference (the original implementation)
    p_local = points_fn(h_V).reshape(B, L, P, 3)
    frames_p = Rigid(frames.rot[..., None, :, :], frames.trans[..., None, :])
    p_global = rigid_apply(frames_p, p_local)
    nbr_p_global = gather_nodes(p_global, idx)
    frames_pk = Rigid(frames.rot[..., None, None, :, :],
                      frames.trans[..., None, None, :])
    nbr_p_local = invert_apply(frames_pk, nbr_p_global)
    p_local_k = jnp.broadcast_to(p_local[:, :, None], (*idx.shape, P, 3))
    p_global_k = jnp.broadcast_to(p_global[:, :, None], (*idx.shape, P, 3))
    flatten = lambda x: x.reshape(*idx.shape, -1)
    aos = jnp.concatenate([
        flatten(p_local_k), _norm(p_local_k), flatten(nbr_p_local),
        _norm(nbr_p_local), _norm(p_global_k - nbr_p_global)], -1)

    np.testing.assert_allclose(np.asarray(soa), np.asarray(aos),
                               atol=1e-5, rtol=1e-5)


def test_bf16_train_step_tracks_f32(small_batch):
    """Mixed-precision TRAINING (configs/model/*.yaml ``compute_dtype``):
    bf16 message/FFN compute must keep params/grads/optimizer f32, produce
    finite losses, and track the f32 loss trajectory to bf16-noise scale.
    The reference trains f32-only (Lightning default, no precision flag in
    configs/trainer); this knob is a TPU-native addition."""
    import optax

    from packppi_tpu.train.diffusion_task import init_state, make_train_step

    def run(dtype):
        model = TorsionalDiffusion.create(
            NetworkConfig(compute_dtype=dtype), SampleConfig())
        opt = optax.adamw(1e-4)
        state = init_state(model, jax.random.key(0), small_batch, opt)
        step = jax.jit(make_train_step(model, opt))
        losses = []
        for _ in range(4):
            state, loss = step(state, small_batch)
            losses.append(float(loss))
        return state, np.array(losses)

    state32, l32 = run("float32")
    state16, l16 = run("bfloat16")

    assert np.isfinite(l16).all()
    # identical init (param init is dtype-independent), same noise keys ->
    # trajectories differ only by bf16 rounding through the network
    np.testing.assert_allclose(l16, l32, rtol=0.05)
    # the optimized params stay f32 in both modes (mixed precision, not
    # half-precision training)
    for leaf in jax.tree.leaves(state16.params):
        assert leaf.dtype == jnp.float32


def test_geometry_local_matches_global(small_batch):
    """The local-frame geometry path (static relative transforms + local
    point gather, NetworkConfig.geometry_mode='local') computes the SAME
    9P features as the global path at f32 — norms are R_i-invariant, so
    |pg_i - ng_j| == |p_local_i - R_rel p_local_j - t_rel| exactly (up to
    fp association)."""
    from packppi_tpu.geometry.rigid import bb_frames_from_atom14
    from packppi_tpu.models.ipmp import (geometry_features,
                                         geometry_features_local,
                                         relative_frame_transforms)
    from packppi_tpu.ops.graph import masked_knn

    batch = small_batch
    B, L = batch.residue_mask.shape
    P, K = 8, 16
    frames = bb_frames_from_atom14(jnp.asarray(batch.X))
    _, idx = masked_knn(jnp.asarray(batch.X[:, :, 1, :]),
                        jnp.asarray(batch.residue_mask), K)
    rng = np.random.default_rng(7)
    p_local = jnp.asarray(rng.normal(scale=3.0, size=(B, L, P, 3)).astype(np.float32))

    ref = geometry_features(p_local, idx, frames)
    rel = relative_frame_transforms(frames, idx)
    loc = geometry_features_local(p_local, idx, rel)

    # padding rows (residue_mask 0) have degenerate frames — garbage in
    # both paths, masked out downstream by mask_attend
    valid = np.asarray(batch.residue_mask, bool)[0]
    np.testing.assert_allclose(np.asarray(loc)[0, valid],
                               np.asarray(ref)[0, valid],
                               atol=2e-4, rtol=2e-4)


def test_network_geometry_local_matches_global(small_batch):
    """Full f32 network forward: geometry_mode='local' (incl. the
    encode_static rel cache) matches 'global' — no new params, same tree."""
    import dataclasses as dc

    m_g = TorsionalDiffusion.create(NetworkConfig(), SampleConfig())
    m_l = TorsionalDiffusion.create(
        NetworkConfig(geometry_mode="local"), SampleConfig())
    params = m_g.init(jax.random.key(0), small_batch)
    # identical param tree: local mode is layout-only
    chex_tree = jax.tree.structure(params)
    assert jax.tree.structure(m_l.init(jax.random.key(0), small_batch)) == chex_tree

    t = jnp.full(small_batch.residue_mask.shape, 0.37)
    s_g, _ = m_g.apply(params, small_batch, small_batch.SC_D, t)
    s_l, _ = m_l.apply(params, small_batch, small_batch.SC_D, t)
    np.testing.assert_allclose(np.asarray(s_l), np.asarray(s_g),
                               atol=2e-4, rtol=2e-3)

    # static path: encode_static caches (h_E, idx, mask_attend, rel)
    static = m_l.encode_static(params, small_batch)
    assert len(static) == 4
    s_ls, _ = m_l.apply(params, small_batch, small_batch.SC_D, t, static=static)
    np.testing.assert_allclose(np.asarray(s_ls), np.asarray(s_l),
                               atol=2e-4, rtol=2e-3)


def test_geometry_local_rejects_global_kernels(small_batch):
    model = TorsionalDiffusion.create(
        NetworkConfig(geometry_mode="local", fused_messages="geom"),
        SampleConfig())
    with pytest.raises(ValueError, match="incompatible"):
        model.init(jax.random.key(0), small_batch)


def test_sampler_local_geometry_parity(small_batch):
    """Local-frame geometry through the sampler: exact at f32, and at bf16
    it adds NO noise beyond the existing bf16 floor (the bf16-local score
    deviates from the f32 truth no more than bf16-global does — measured
    0.0035 vs 0.0036 mean; two bf16 variants drift apart through the
    annealed sampler, so trajectory-level comparison of bf16 variants is
    not the right check)."""
    mk = lambda **kw: TorsionalDiffusion.create(NetworkConfig(**kw), SampleConfig())
    m_f32, m_fl = mk(), mk(geometry_mode="local")
    m_bg = mk(compute_dtype="bfloat16")
    m_bl = mk(compute_dtype="bfloat16", geometry_mode="local")
    params = m_f32.init(jax.random.key(0), small_batch)
    mask = np.asarray(small_batch.SC_D_mask) == 1

    # f32: the sampler trajectory is layout-invariant
    sc_g = np.asarray(m_f32.sample(params, jax.random.key(5), small_batch, n_steps=3))
    sc_l = np.asarray(m_fl.sample(params, jax.random.key(5), small_batch, n_steps=3))
    d = np.abs(np.angle(np.exp(1j * (sc_l[mask] - sc_g[mask]))))
    assert d.max() < 1e-4, f"f32 sampler deviation {d.max()}"

    # bf16: local adds no precision cost on top of the bf16 floor
    t = jnp.full(small_batch.residue_mask.shape, 0.3)
    s32 = np.asarray(m_f32.apply(params, small_batch, small_batch.SC_D, t)[0])
    sbg = np.asarray(m_bg.apply(params, small_batch, small_batch.SC_D, t)[0])
    sbl = np.asarray(m_bl.apply(params, small_batch, small_batch.SC_D, t)[0])
    floor = np.abs(sbg - s32)[mask].mean()
    local = np.abs(sbl - s32)[mask].mean()
    assert local < floor * 1.5, f"bf16-local {local} vs bf16 floor {floor}"
    assert np.isfinite(sbl).all()


def test_masked_knn_blocked_matches_dense():
    """Row-blocked kNN (the >2048-residue memory path) is bit-identical to
    the dense [L, L] path, including masked/padded rows."""
    import numpy as np

    from packppi_tpu.ops.graph import masked_knn

    rng = np.random.default_rng(0)
    B, L, k = 2, 300, 24
    coords = jnp.asarray(rng.normal(0, 10, (B, L, 3)).astype(np.float32))
    mask = jnp.asarray((rng.uniform(size=(B, L)) > 0.1).astype(np.float32))

    D_d, idx_d = masked_knn(coords, mask, k)                    # dense
    D_b, idx_b = masked_knn(coords, mask, k, block=128)         # blocked+pad
    np.testing.assert_array_equal(np.asarray(idx_b), np.asarray(idx_d))
    np.testing.assert_allclose(np.asarray(D_b), np.asarray(D_d), rtol=1e-6)


def test_gather_nodes_mg_matches_gather():
    """gather_nodes_mg (one-hot MXU backward) matches gather_nodes in value
    EXACTLY and in gradient up to float reassociation — blocked and
    unblocked backward, flat and multi-dim payloads."""
    import numpy as np

    from packppi_tpu.ops.graph import gather_nodes, gather_nodes_mg

    rng = np.random.default_rng(3)
    B, L, K, C = 2, 70, 11, 13
    nodes = jnp.asarray(rng.normal(size=(B, L, C)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, L, (B, L, K)).astype(np.int32))
    ct = jnp.asarray(rng.normal(size=(B, L, K, C)).astype(np.float32))

    f_ref = lambda n: (gather_nodes(n, idx) * ct).sum()
    for blk in (8192, 64):  # one-block and 13-block backward
        f_mg = lambda n: (gather_nodes_mg(n, idx, bwd_block=blk) * ct).sum()
        v_ref, g_ref = jax.value_and_grad(f_ref)(nodes)
        v_mg, g_mg = jax.value_and_grad(f_mg)(nodes)
        assert float(v_ref) == float(v_mg)  # forward is the same gather
        np.testing.assert_allclose(np.asarray(g_mg), np.asarray(g_ref),
                                   rtol=0, atol=1e-5)

    # multi-dim payload ([..., P, 3] geometry planes shape)
    n3 = jnp.asarray(rng.normal(size=(B, L, 4, 3)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(gather_nodes_mg(n3, idx)), np.asarray(gather_nodes(n3, idx)))
    g_ref = jax.grad(lambda n: (gather_nodes(n, idx) ** 2).sum())(n3)
    g_mg = jax.grad(lambda n: (gather_nodes_mg(n, idx) ** 2).sum())(n3)
    np.testing.assert_allclose(np.asarray(g_mg), np.asarray(g_ref),
                               rtol=0, atol=1e-4)


def test_mxu_gather_grad_train_step_parity(small_batch):
    """NetworkConfig.mxu_gather_grad changes only the gathers' BACKWARD
    implementation: the forward loss is bit-identical and one optimizer
    step lands on near-identical parameters."""
    import numpy as np
    import optax

    from packppi_tpu.train.diffusion_task import init_state, make_train_step

    outs = {}
    for mg in (False, True):
        model = TorsionalDiffusion.create(
            NetworkConfig(mxu_gather_grad=mg), SampleConfig())
        opt = optax.adamw(1e-3)
        state = init_state(model, jax.random.key(0), small_batch, opt)
        step = jax.jit(make_train_step(model, opt))
        state, loss = step(state, small_batch)
        outs[mg] = (float(loss), state.params)
    assert outs[False][0] == outs[True][0]  # forward identical -> same loss
    flat_a = jax.tree_util.tree_leaves(outs[False][1])
    flat_b = jax.tree_util.tree_leaves(outs[True][1])
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=5e-5)


def test_geometry_features_lanes_matches_planes():
    """Lane-major geometry assembly (geometry_features_lanes) is exact vs
    the [B, L, K, P]-planes path, including the row permutation back to the
    reference feature order."""
    import numpy as np

    from packppi_tpu.geometry.rigid import Rigid
    from packppi_tpu.models.ipmp import geometry_features, geometry_features_lanes

    rng = np.random.default_rng(0)
    B, L, P, K = 2, 64, 8, 16
    p_local = jnp.asarray(rng.normal(0, 2, (B, L, P, 3)).astype(np.float32))
    Q = np.linalg.qr(rng.normal(size=(B, L, 3, 3)))[0].astype(np.float32)
    t = rng.normal(0, 50, (B, L, 3)).astype(np.float32)
    frames = Rigid(jnp.asarray(Q), jnp.asarray(t))
    idx = jnp.asarray(rng.integers(0, L, (B, L, K)).astype(np.int32))

    ref = geometry_features(p_local, idx, frames)
    got = geometry_features_lanes(p_local, idx, frames)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_geometry_lanes_knob_end_to_end(small_batch):
    """NetworkConfig.geometry_lanes flips the assembly path without
    changing scores (same params, same key)."""
    import numpy as np

    from packppi_tpu.models import NetworkConfig, SampleConfig, TorsionalDiffusion

    b = small_batch
    m0 = TorsionalDiffusion.create(NetworkConfig(), SampleConfig())
    m1 = TorsionalDiffusion.create(NetworkConfig(geometry_lanes=True), SampleConfig())
    params = m0.init(jax.random.key(0), b)
    t = jnp.full(b.residue_mask.shape, 0.5)
    s0, _ = m0.apply(params, b, jnp.asarray(b.SC_D), t)
    s1, _ = m1.apply(params, b, jnp.asarray(b.SC_D), t)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), atol=1e-5)


def test_remat_layers_loss_and_grad_parity(small_batch):
    """remat_layers=True recomputes layer activations in the backward;
    loss and every gradient leaf must be bit-identical to the stored
    -activations path."""
    import numpy as np

    from packppi_tpu.models import NetworkConfig, SampleConfig, TorsionalDiffusion

    b = small_batch
    m0 = TorsionalDiffusion.create(NetworkConfig(), SampleConfig())
    m1 = TorsionalDiffusion.create(NetworkConfig(remat_layers=True), SampleConfig())
    p = m0.init(jax.random.key(0), b)
    k = jax.random.key(1)
    l0, g0 = jax.value_and_grad(lambda pp: m0.loss(pp, k, b))(p)
    l1, g1 = jax.value_and_grad(lambda pp: m1.loss(pp, k, b))(p)
    assert float(l0) == float(l1)
    for a, c in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-6)


def test_coalesced_gathers_match_separate(small_batch):
    """coalesce_gathers (one wide j-term+planes gather per message pass,
    local mode + fused) is value-exact vs the two-gather path — it is a
    pure concat/split around the same take_along_axis."""
    from unittest import mock

    from packppi_tpu.models.diffusion_net import NetworkConfig as NC
    from packppi_tpu.models.ipmp import FactoredMessageMLP

    mk = lambda **kw: TorsionalDiffusion.create(
        NC(geometry_mode="local", fused_messages=True, **kw), SampleConfig())
    m_sep, m_co = mk(), mk(coalesce_gathers=True)
    params = m_sep.init(jax.random.key(0), small_batch)
    # identical param tree: coalescing is gather-layout-only
    assert (jax.tree.structure(m_co.init(jax.random.key(0), small_batch))
            == jax.tree.structure(params))
    t = jnp.full(small_batch.residue_mask.shape, 0.3)

    orig = FactoredMessageMLP.__call__

    def patched(self, *args, **kw):
        kw["interpret"] = True  # no TPU in tests
        return orig(self, *args, **kw)

    with mock.patch.object(FactoredMessageMLP, "__call__", patched):
        s_sep, h_sep = m_sep.apply(params, small_batch, small_batch.SC_D, t)
        s_co, h_co = m_co.apply(params, small_batch, small_batch.SC_D, t)
    np.testing.assert_array_equal(np.asarray(s_co), np.asarray(s_sep))
    np.testing.assert_array_equal(np.asarray(h_co), np.asarray(h_sep))

    # bf16 streams (the production sampler config for this knob)
    mkb = lambda **kw: TorsionalDiffusion.create(
        NC(geometry_mode="local", fused_messages=True,
           compute_dtype="bfloat16", **kw), SampleConfig())
    m_bs, m_bc = mkb(), mkb(coalesce_gathers=True)
    with mock.patch.object(FactoredMessageMLP, "__call__", patched):
        s_bs, _ = m_bs.apply(params, small_batch, small_batch.SC_D, t)
        s_bc, _ = m_bc.apply(params, small_batch, small_batch.SC_D, t)
    np.testing.assert_array_equal(np.asarray(s_bc), np.asarray(s_bs))
