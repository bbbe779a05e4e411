"""Training-harness components: config composition, bucketed loader,
checkpoint manager retention."""
import json
import os

import numpy as np
import pytest

from packppi_tpu.data.batch import bucket_length
from packppi_tpu.data.loader import BucketedLoader
from packppi_tpu.utils.config import load_config

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def test_config_compose_and_overrides():
    cfg = load_config(os.path.join(CONFIG_DIR, "train_diffusion.yaml"),
                      ["trainer.max_epochs=7", "data.batch_size=2", "trainer=debug"])
    # group swap wins for unlisted keys, dotlist wins for listed ones
    assert cfg.trainer.max_epochs == 7
    assert cfg.trainer.debug_nans is True  # from the debug group
    assert cfg.data.batch_size == 2
    assert cfg.model.hidden_dim == 128
    assert cfg.seed == 42


def test_config_list_override():
    cfg = load_config(os.path.join(CONFIG_DIR, "train_diffusion.yaml"),
                      ["data.split_fractions=[0.5,0.25,0.25]"])
    assert cfg.data.split_fractions == [0.5, 0.25, 0.25]


class _FakeDataset:
    """Feature dicts of varying lengths."""

    def __init__(self, lengths):
        self.lengths = lengths

    def __len__(self):
        return len(self.lengths)

    def __getitem__(self, i):
        L = self.lengths[i]
        rng = np.random.default_rng(i)
        return {
            "X": rng.normal(size=(L, 14, 3)).astype(np.float32),
            "atom_mask": np.ones((L, 14), np.float32),
            "residue_type": np.zeros(L, np.int64),
            "residue_mask": np.ones(L, np.float32),
            "residue_index": np.arange(L, dtype=np.int64),
            "chain_indices": np.ones(L, np.int64),
            "BB_D": np.zeros((L, 3), np.float32),
            "BB_D_sincos": np.zeros((L, 3, 2), np.float32),
            "BB_D_mask": np.ones((L, 3), np.float32),
            "SC_D": np.zeros((L, 4), np.float32),
            "SC_D_sincos": np.zeros((L, 4, 2), np.float32),
            "SC_D_mask": np.ones((L, 4), np.float32),
            "chi_1pi_periodic_mask": np.zeros((L, 4), bool),
            "chi_2pi_periodic_mask": np.ones((L, 4), bool),
        }


def test_bucketed_loader_same_bucket_batches():
    ds = _FakeDataset([60, 62, 100, 120, 300, 310, 305])
    loader = BucketedLoader(ds, batch_size=2, shuffle=True, seed=0, prefetch=0)
    seen = 0
    for batch in loader:
        L = batch.X.shape[1]
        assert L == bucket_length(L)  # padded exactly to a bucket boundary
        seen += batch.X.shape[0]
    assert seen == len(ds)


def test_bucketed_loader_epoch_reshuffles():
    ds = _FakeDataset([60] * 8)
    loader = BucketedLoader(ds, batch_size=2, shuffle=True, seed=0, prefetch=0)
    first = [tuple(np.asarray(b.residue_type[:, 0]).tolist()) for b in loader]
    assert len(first) == 4


def test_checkpoint_manager_retention(tmp_path):
    import jax.numpy as jnp

    from packppi_tpu.train.loop import CheckpointManager

    mgr = CheckpointManager(tmp_path / "ck", top_k=2)
    for step, metric in [(1, 5.0), (2, 3.0), (3, 4.0), (4, 1.0), (5, 9.0)]:
        mgr.save(step, {"w": jnp.ones(3) * step}, metric=metric)
    kept = set(json.loads((tmp_path / "ck" / "index.json").read_text()))
    # best two metrics (steps 4 and 2) + always the last (step 5)
    assert kept == {"step_00000004", "step_00000002", "step_00000005"}
    assert mgr.best().endswith("step_00000004")
    assert mgr.latest().endswith("step_00000005")


def test_train_step_skips_nonfinite_loss():
    """A NaN loss must leave params untouched (on-device skip)."""
    import jax
    import jax.numpy as jnp

    from packppi_tpu.train.diffusion_task import TrainState, make_optimizer

    import optax

    optimizer = make_optimizer()

    class FakeModel:
        def loss(self, params, key, batch):
            return params["w"].sum() * jnp.nan

    from packppi_tpu.train.diffusion_task import make_train_step
    step = make_train_step(FakeModel(), optimizer)
    params = {"w": jnp.ones(3)}
    state = TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32),
                       jax.random.key_data(jax.random.key(0)))
    new_state, loss = step(state, None)
    assert not bool(jnp.isfinite(loss))
    np.testing.assert_array_equal(np.asarray(new_state.params["w"]), np.ones(3))
    assert int(new_state.step) == 1


def test_time_limit():
    import time

    import pytest as _pytest

    from packppi_tpu.utils.logging import time_limit

    with time_limit(5):
        pass
    with _pytest.raises(TimeoutError):
        with time_limit(1):
            time.sleep(2)


def test_complex_dataset_length_filter(tmp_path):
    import shutil

    from packppi_tpu.data.complex import ComplexDataset

    src = os.path.join(os.path.dirname(__file__), "fixtures", "1brs.pdb")
    shutil.copy(src, tmp_path / "ok_rc.pdb")
    shutil.copy(src, tmp_path / "toobig_rc.pdb")
    ds = ComplexDataset(str(tmp_path), ["ok", "toobig"],
                        cache_dir=str(tmp_path / "cache"), len_region=(10, 3000))
    assert len(ds.filtered()) == 2
    ds_small = ComplexDataset(str(tmp_path), ["ok", "toobig"],
                              cache_dir=str(tmp_path / "cache2"), len_region=(10, 100))
    assert len(ds_small.filtered()) == 0
