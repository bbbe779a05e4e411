"""Pipeline parallelism (parallel/pipeline.py): GPipe over the stacked
layer axis must reproduce sequential lax.scan execution exactly.

The reference has no model parallelism of any kind (SURVEY.md §2.4); these
tests lock the TPU-native addition on the virtual 8-device CPU mesh.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from packppi_tpu.parallel import batch_sharding, make_mesh, pipeline_apply, replicated

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices")


def _mlp_stack(key, nl=8, d=16):
    k1, k2 = jax.random.split(key)
    return {
        "w": jax.random.normal(k1, (nl, d, d)) * (d ** -0.5),
        "b": jax.random.normal(k2, (nl, d)) * 0.1,
    }


def _apply_mlp(lp, x):
    return jnp.tanh(x @ lp["w"] + lp["b"])


def _sequential(layers, x):
    def body(c, lp):
        return _apply_mlp(lp, c), None
    out, _ = jax.lax.scan(body, x, layers)
    return out


@pytest.mark.parametrize("dp,pp,M", [(2, 4, 4), (1, 8, 2), (4, 2, 1)])
def test_pipeline_matches_sequential_scan(dp, pp, M):
    layers = _mlp_stack(jax.random.key(0), nl=8, d=16)
    B = dp * M * 2  # 2 examples per microbatch
    x = jax.random.normal(jax.random.key(1), (B, 5, 16))

    ref = np.asarray(_sequential(layers, x))

    mesh = make_mesh(8, model_parallel=pp)
    out = pipeline_apply(mesh, layers, x, _apply_mlp, n_microbatches=M)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6, rtol=1e-6)


def test_pipeline_streams_carry_pytrees():
    """Side inputs (e.g. attention biases) stream stage-to-stage with the
    activations: a 2-tuple carry where the second leaf parameterizes every
    layer's compute."""
    layers = _mlp_stack(jax.random.key(2), nl=4, d=16)
    B = 8
    x = jax.random.normal(jax.random.key(3), (B, 16))
    bias = jax.random.normal(jax.random.key(4), (B, 16))

    def apply_layer(lp, carry):
        x, bias = carry
        return jnp.tanh(x @ lp["w"] + lp["b"] + bias), bias

    def body(c, lp):
        return apply_layer(lp, c), None
    ref, _ = jax.lax.scan(body, (x, bias), layers)

    mesh = make_mesh(8, model_parallel=4)
    out = pipeline_apply(mesh, layers, (x, bias), apply_layer, n_microbatches=4)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]),
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(bias))


def test_pipeline_preserves_bool_carry_dtype():
    """A bool carry leaf (e.g. a padding mask) must come back bool with its
    values intact — the final psum-replication's masking used to promote
    bool to int32 (where(cond, bool, 0)), silently corrupting downstream
    ``~mask`` logic."""
    layers = _mlp_stack(jax.random.key(6), nl=4, d=16)
    B = 8
    x = jax.random.normal(jax.random.key(7), (B, 16))
    keep = jnp.asarray(np.arange(B) % 2 == 0)           # [B] bool

    def apply_layer(lp, carry):
        x, keep = carry
        return jnp.tanh(x @ lp["w"] + lp["b"]) * keep[:, None], keep

    mesh = make_mesh(8, model_parallel=4)
    out_x, out_keep = pipeline_apply(mesh, layers, (x, keep), apply_layer,
                                     n_microbatches=4)
    assert out_keep.dtype == jnp.bool_
    np.testing.assert_array_equal(np.asarray(out_keep), np.asarray(keep))

    def body(c, lp):
        return apply_layer(lp, c), None
    ref, _ = jax.lax.scan(body, (x, keep), layers)
    np.testing.assert_allclose(np.asarray(out_x), np.asarray(ref[0]),
                               atol=1e-6, rtol=1e-6)


def test_pipeline_validates_divisibility():
    layers = _mlp_stack(jax.random.key(5), nl=6, d=16)
    mesh = make_mesh(8, model_parallel=4)
    x = jnp.zeros((8, 16))
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_apply(mesh, layers, x, _apply_mlp, n_microbatches=2)
    layers8 = _mlp_stack(jax.random.key(5), nl=8, d=16)
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_apply(mesh, layers8, jnp.zeros((6, 16)), _apply_mlp,
                       n_microbatches=2)


def test_esm2_pipeline_matches_scan_forward():
    """esm2_pipeline_forward == esm2_forward on a (data=2, model=4) mesh —
    the 650M-and-up scaling path (per-device layer memory drops 4x)."""
    from packppi_tpu.models.esm2 import (ESM2Config, esm2_forward,
                                         esm2_pipeline_forward)

    cfg = ESM2Config(hidden_size=32, num_layers=8, num_heads=4,
                     intermediate_size=64)
    rng = np.random.default_rng(7)
    nl, hd, it = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size

    def r(*s):
        return jnp.asarray(rng.normal(0.0, 0.1, s), jnp.float32)

    params = {
        "embedding": r(cfg.vocab_size, hd),
        "final_ln_scale": jnp.ones(hd) + r(hd) * 0.1,
        "final_ln_bias": r(hd),
        "layers": {
            "wq": r(nl, hd, hd), "bq": r(nl, hd),
            "wk": r(nl, hd, hd), "bk": r(nl, hd),
            "wv": r(nl, hd, hd), "bv": r(nl, hd),
            "wo": r(nl, hd, hd), "bo": r(nl, hd),
            "w1": r(nl, hd, it), "b1": r(nl, it),
            "w2": r(nl, it, hd), "b2": r(nl, hd),
            "ln1_scale": jnp.ones((nl, hd)), "ln1_bias": r(nl, hd) * 0.1,
            "ln2_scale": jnp.ones((nl, hd)), "ln2_bias": r(nl, hd) * 0.1,
        },
    }
    B, T = 4, 24
    ids = rng.integers(4, 31, size=(B, T)).astype(np.int32)
    ids[:, 0] = 0
    ids[2, 5:] = 1  # padding (+ mask handling via kbias)
    mask = (ids != 1).astype(np.float32)
    ids[1, 3] = 32  # a <mask> token exercises the token-dropout rescale

    ref = np.asarray(esm2_forward(params, ids, mask, cfg))

    mesh = make_mesh(8, model_parallel=4)
    rep, rows = replicated(mesh), batch_sharding(mesh)
    fwd = jax.jit(
        lambda p, i, m: esm2_pipeline_forward(p, i, m, cfg, mesh,
                                              n_microbatches=2),
        in_shardings=(jax.tree.map(lambda _: rep, params), rows, rows),
        out_shardings=rows)
    out = np.asarray(fwd(jax.device_put(params, jax.tree.map(lambda _: rep, params)),
                         jax.device_put(ids, rows), jax.device_put(mask, rows)))
    valid = mask.astype(bool)
    np.testing.assert_allclose(out[valid], ref[valid], atol=2e-5, rtol=1e-5)
