"""Multi-chip SPMD validation on the virtual 8-device CPU mesh."""
import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_dryrun_multichip_executes():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)  # asserts internally (finite loss, step taken)


@pytest.mark.skipif(jax.device_count() < 4, reason="needs 4 virtual devices")
def test_dp_loss_matches_single_device():
    """The sharded loss must equal the single-device loss (same batch, same
    key): SPMD is a layout change, not a numerics change."""
    import jax.numpy as jnp

    from __graft_entry__ import _synthetic_batch
    from packppi_tpu.models import NetworkConfig, SampleConfig, TorsionalDiffusion
    from packppi_tpu.parallel import batch_sharding, make_mesh, replicated

    model = TorsionalDiffusion.create(NetworkConfig(), SampleConfig())
    batch = _synthetic_batch(B=4, L=48)
    params = model.init(jax.random.key(0), batch)
    key = jax.random.key(7)

    single = float(jax.jit(model.loss)(params, key, batch))

    mesh = make_mesh(4, model_parallel=1)
    b_shard = jax.tree.map(lambda _: batch_sharding(mesh), batch)
    sharded_loss = jax.jit(model.loss,
                           in_shardings=(replicated(mesh), replicated(mesh), b_shard),
                           out_shardings=replicated(mesh))
    batch_s = jax.device_put(batch, b_shard)
    params_s = jax.device_put(params, replicated(mesh))
    multi = float(sharded_loss(params_s, jax.device_put(key, replicated(mesh)), batch_s))

    np.testing.assert_allclose(multi, single, rtol=2e-5)
