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


def test_checkpoint_manager_ema_sidecars(tmp_path):
    """EMA sidecars (`<name>_ema`) are written next to each checkpoint and
    pruned together with it."""
    import jax.numpy as jnp

    from packppi_tpu.train.loop import CheckpointManager

    mgr = CheckpointManager(tmp_path / "ck", top_k=1)
    for step, metric in [(1, 5.0), (2, 3.0), (3, 4.0)]:
        mgr.save(step, {"w": jnp.ones(3) * step}, metric=metric,
                 ema={"w": jnp.ones(3) * step * 10})
    names = {p.name for p in (tmp_path / "ck").glob("step_*")}
    # best (step 2) + last (step 3), each with its _ema twin
    assert names == {"step_00000002", "step_00000002_ema",
                     "step_00000003", "step_00000003_ema"}
    from packppi_tpu.train.checkpoints import load_params
    ema = load_params(f"{mgr.best()}_ema")
    np.testing.assert_allclose(np.asarray(ema["w"]), 20.0)


def test_ema_update_math():
    """One EMA step: e' = d*e + (1-d)*p, leafwise."""
    import jax
    import jax.numpy as jnp

    from packppi_tpu.train.diffusion_task import make_ema_update

    ema = {"a": jnp.zeros(4), "b": {"c": jnp.ones(2)}}
    params = {"a": jnp.ones(4), "b": {"c": jnp.full(2, 3.0)}}
    step = jax.jit(make_ema_update(0.9))
    out = step(ema, params)
    np.testing.assert_allclose(np.asarray(out["a"]), 0.1, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["b"]["c"]), 0.9 + 0.3, rtol=1e-6)


def test_train_diffusion_ema_end_to_end(tmp_path):
    """train_diffusion with trainer.ema_decay>0: EMA sidecars saved, EMA
    resume picks the sidecar up, and the sidecar loads as a params-only
    checkpoint for inference (load_model_params)."""
    import sys

    import jax

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from make_crop_corpus import take_residues

    from packppi_tpu.structure import from_pdb_file, to_pdb
    from packppi_tpu.train.loop import train_diffusion

    prot = from_pdb_file(os.path.join(os.path.dirname(__file__), "fixtures", "1brs.pdb"),
                         mse_to_met=True)
    data_dir = tmp_path / "corpus"
    data_dir.mkdir()
    for k in range(6):
        sel = np.arange(k * 13, k * 13 + 48) % len(prot.aaindex)
        (data_dir / f"crop{k:02d}_rc.pdb").write_text(
            to_pdb(take_residues(prot, np.sort(sel))))

    overrides = [
        f"output_dir={tmp_path / 'out'}",
        f"data.data_dir={data_dir}",
        "data.split_fractions=[0.7,0.2,0.1]",
        "data.batch_size=1",
        "trainer.n_devices=1",
        "trainer.max_epochs=1",
        "trainer.ema_decay=0.5",
        "sample.sample_during_training=false",
        "seed=0",
    ]
    cfg = load_config(os.path.join(CONFIG_DIR, "train_diffusion.yaml"), overrides)
    result = train_diffusion(cfg)
    assert np.isfinite(result["best_val_loss"])

    ckpts = sorted((tmp_path / "out" / "checkpoints").glob("step_*"))
    emas = [p for p in ckpts if p.name.endswith("_ema")]
    assert emas, "no EMA sidecars written"

    # the sidecar is a params-only tree usable directly by inference
    from packppi_tpu.models import NetworkConfig, SampleConfig, TorsionalDiffusion
    from packppi_tpu.train.checkpoints import load_model_params, load_params

    raw = load_params(emas[-1].parent / emas[-1].name.removesuffix("_ema"))
    ema_params = load_model_params(str(emas[-1]), raw["params"])
    assert set(ema_params) == {"params"}

    # after 1 epoch at decay 0.5 the EMA must differ from the raw params
    # (it still carries init-weight mass)
    leaf = lambda t: np.asarray(jax.tree.leaves(t)[0])
    assert not np.allclose(leaf(ema_params), leaf(raw["params"]))

    # resume: 1 more epoch from the same dir — must load the sidecar
    # (covered by it not raising + new sidecars appearing at higher steps)
    cfg2 = load_config(os.path.join(CONFIG_DIR, "train_diffusion.yaml"),
                       overrides[:5] + ["trainer.max_epochs=2",
                                        "trainer.ema_decay=0.5",
                                        "sample.sample_during_training=false",
                                        "seed=0"])
    result2 = train_diffusion(cfg2)
    assert np.isfinite(result2["best_val_loss"])
    emas2 = sorted((tmp_path / "out" / "checkpoints").glob("step_*_ema"))
    assert max(int(p.name.split("_")[1]) for p in emas2) > \
        max(int(p.name.split("_")[1]) for p in emas)


def test_val_loss_uses_fixed_eval_noise(tmp_path):
    """Common-random-numbers eval: at lr=0 (params frozen) every validation
    pass must produce a BIT-IDENTICAL val/loss — the fixed per-batch eval
    keys remove t/noise-draw variance, so best-ckpt selection and early
    stopping compare parameters, not sampling noise."""
    import json
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from make_crop_corpus import take_residues

    from packppi_tpu.structure import from_pdb_file, to_pdb
    from packppi_tpu.train.loop import train_diffusion

    prot = from_pdb_file(os.path.join(os.path.dirname(__file__), "fixtures", "1brs.pdb"),
                         mse_to_met=True)
    data_dir = tmp_path / "corpus"
    data_dir.mkdir()
    for k in range(6):
        sel = np.arange(k * 13, k * 13 + 48) % len(prot.aaindex)
        (data_dir / f"crop{k:02d}_rc.pdb").write_text(
            to_pdb(take_residues(prot, np.sort(sel))))

    cfg = load_config(os.path.join(CONFIG_DIR, "train_diffusion.yaml"), [
        f"output_dir={tmp_path / 'out'}",
        f"data.data_dir={data_dir}",
        "data.split_fractions=[0.7,0.3,0.0]",
        "data.batch_size=1",
        "trainer.n_devices=1",
        "trainer.max_epochs=3",
        "trainer.val_every_epochs=1",
        "trainer.lr=0.0",
        "trainer.ema_decay=0",
        "sample.sample_during_training=false",
        "seed=0",
    ])
    train_diffusion(cfg)

    records = [json.loads(l) for l in
               (tmp_path / "out" / "logs" / "metrics.jsonl").read_text().splitlines()]
    vals = [r["val/loss"] for r in records if "val/loss" in r]
    assert len(vals) == 3
    assert vals[0] == vals[1] == vals[2], vals


def test_train_affinity_ema_sidecars(tmp_path):
    """trainer.ema_decay>0 in the affinity loop writes _ema sidecars and
    evaluates the EMA weights."""
    import pandas as pd

    from packppi_tpu.train.loop import train_affinity

    fix = os.path.join(os.path.dirname(__file__), "fixtures", "skempi_mini")
    data_dir = tmp_path / "skempi"
    (data_dir / "PDBs").mkdir(parents=True)
    df = pd.read_csv(os.path.join(fix, "skempi_v2.csv"), sep=";")
    pdbcode = df["#Pdb"].str.split("_").str[0]
    pd.concat([df[pdbcode == "1BRS"].head(3),
               df[pdbcode == "2FTL"].head(3)]).to_csv(
        data_dir / "skempi_v2.csv", sep=";", index=False)
    for n in ("1BRS", "2FTL"):
        (data_dir / "PDBs" / f"{n}.pdb").symlink_to(
            os.path.join(fix, "PDBs", f"{n}.pdb"))

    out = tmp_path / "out"
    cfg = load_config(os.path.join(CONFIG_DIR, "train_affinity.yaml"), [
        f"output_dir={out}", f"data.data_dir={data_dir}",
        "data.num_cvfolds=2", "data.batch_size=2", "trainer.n_devices=1",
        "trainer.max_epochs=1", "trainer.ema_decay=0.5", "seed=0",
    ])
    result = train_affinity(cfg)
    assert np.isfinite(result["best_val_loss"])
    assert list((out / "checkpoints").glob("step_*_ema")), "no EMA sidecars"

    # params-level resume: a second run seeded from the best checkpoint
    # must pick up both the params and the EMA sidecar and train on
    out2 = tmp_path / "out2"
    cfg2 = load_config(os.path.join(CONFIG_DIR, "train_affinity.yaml"), [
        f"output_dir={out2}", f"data.data_dir={data_dir}",
        "data.num_cvfolds=2", "data.batch_size=2", "trainer.n_devices=1",
        "trainer.max_epochs=1", "trainer.ema_decay=0.5", "seed=1",
        f"ckpt_path={result['best_ckpt']}",
    ])
    result2 = train_affinity(cfg2)
    assert np.isfinite(result2["best_val_loss"])
    assert list((out2 / "checkpoints").glob("step_*_ema"))


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


# ---------------------------------------------------------------------------
# Multirun sweeps + per-run output dirs (reference: Hydra basic sweeper via
# src/train_diffusion.py:100-117, configs/hydra/default.yaml:8-11)
# ---------------------------------------------------------------------------

def test_expand_multirun_cartesian():
    from packppi_tpu.utils.config import expand_multirun
    jobs = expand_multirun(["model.lr=1e-4,3e-4", "seed=0,1", "trainer=debug"])
    assert len(jobs) == 4
    assert ["model.lr=1e-4", "seed=0", "trainer=debug"] in jobs
    assert ["model.lr=3e-4", "seed=1", "trainer=debug"] in jobs


def test_expand_multirun_brackets_not_split():
    from packppi_tpu.utils.config import expand_multirun
    jobs = expand_multirun(["data.split_fractions=[0.5,0.25,0.25],[0.8,0.1,0.1]"])
    assert len(jobs) == 2
    assert jobs[0] == ["data.split_fractions=[0.5,0.25,0.25]"]


def test_make_run_dir_layout(tmp_path):
    from packppi_tpu.utils.config import make_run_dir
    single = make_run_dir(str(tmp_path), timestamp="2026-01-02_03-04-05",
                          tags=["ablate", "v2"])
    assert single == tmp_path / "runs" / "2026-01-02_03-04-05_ablate-v2"
    assert single.is_dir()
    m0 = make_run_dir(str(tmp_path), multirun=True, job=0,
                      timestamp="2026-01-02_03-04-05")
    m1 = make_run_dir(str(tmp_path), multirun=True, job=1,
                      timestamp="2026-01-02_03-04-05")
    assert m0.parent == m1.parent == tmp_path / "multiruns" / "2026-01-02_03-04-05"
    assert {m0.name, m1.name} == {"0", "1"}


def test_get_metric_value():
    from packppi_tpu.utils.config import get_metric_value
    assert get_metric_value({"val_loss": 0.5}, "val_loss") == 0.5
    assert get_metric_value({"val_loss": 0.5}, None) is None
    with pytest.raises(KeyError):
        get_metric_value({"val_loss": 0.5}, "nope")


def test_cli_multirun_end_to_end(tmp_path, monkeypatch):
    """packppi-train-diffusion -m sweeps two seeds into separate run dirs
    with echoed configs and a summary."""
    import sys
    from packppi_tpu.cli import train_diffusion as cli_mod

    calls = []

    def fake_train(cfg):
        calls.append(cfg)
        open(os.path.join(cfg.output_dir, "marker.txt"), "w").close()
        return {"best_val_loss": 0.1 * (len(calls)), "test_loss": None}

    monkeypatch.setattr(cli_mod, "_loader", lambda: fake_train)
    monkeypatch.setattr(sys, "argv", [
        "packppi-train-diffusion", "-m", "--platform", "cpu",
        f"output_dir={tmp_path}", "seed=0,1",
        "optimized_metric=best_val_loss"])
    cli_mod.main()

    assert len(calls) == 2
    assert {c.seed for c in calls} == {0, 1}
    run_dirs = sorted((tmp_path / "multiruns").glob("*/*/"))
    assert len(run_dirs) == 2
    for d in run_dirs:
        assert (d / "config.yaml").exists()
        assert (d / "marker.txt").exists()
    summaries = list((tmp_path / "multiruns").glob("*/multirun_summary.json"))
    assert len(summaries) == 1
    rows = json.loads(summaries[0].read_text())
    assert [r["optimized_metric"] for r in rows] == [0.1, 0.2]


def test_override_scientific_notation():
    """'3e-4' is a YAML-1.1 string; overrides must still coerce it to float
    (Hydra-compatible)."""
    cfg = load_config(os.path.join(CONFIG_DIR, "train_diffusion.yaml"),
                      ["trainer.lr=3e-4", "task_name=still_a_string"])
    assert cfg.trainer.lr == 3e-4 and isinstance(cfg.trainer.lr, float)
    assert cfg.task_name == "still_a_string"


def test_prefetch_worker_error_propagates():
    """A failure inside the prefetch worker must raise in the consumer, not
    silently end the epoch early."""
    class ExplodingDataset:
        def __len__(self):
            return 4

        def lengths(self):
            return [60, 60, 60, 60]

        def __getitem__(self, i):
            if i == 2:
                raise ValueError("boom")
            return _FakeDataset([60])[0]

    loader = BucketedLoader(ExplodingDataset(), batch_size=1, shuffle=False,
                            prefetch=2)
    with pytest.raises(ValueError, match="boom"):
        list(loader)


def test_loader_plan_matches_iteration_order():
    ds = _FakeDataset([60, 300, 62, 310])  # interleaved buckets
    loader = BucketedLoader(ds, batch_size=2, shuffle=False, prefetch=0)
    plan = loader.plan()
    flat = [i for b in plan for i in b]
    assert sorted(flat) == [0, 1, 2, 3]
    # same-bucket entries grouped: 60/62 together, 300/310 together
    got = [set(b) for b in plan]
    assert {0, 2} in got and {1, 3} in got


def test_make_lr_schedule():
    """Trainer LR knob: constant passthrough, warmup+cosine shape, bad name
    rejected (reference exposes an optional scheduler hook;
    src/models/TorsionalDiffusion.py:343-361)."""
    from packppi_tpu.train.loop import make_lr
    from packppi_tpu.utils.config import Config

    cfg = Config.wrap({"lr": 3e-4, "lr_schedule": "constant", "warmup_steps": 0,
                       "max_epochs": 10})
    assert make_lr(cfg, 5) == 3e-4

    cfg["lr_schedule"] = "cosine"
    cfg["warmup_steps"] = 10
    sched = make_lr(cfg, 5)  # total = 50 steps
    assert float(sched(0)) == 0.0                       # warmup start
    assert float(sched(10)) == pytest.approx(3e-4)      # peak after warmup
    assert float(sched(50)) == pytest.approx(3e-5)      # decayed to lr/10
    assert float(sched(30)) < float(sched(15))          # monotone decay

    cfg["lr_schedule"] = "bogus"
    with pytest.raises(ValueError):
        make_lr(cfg, 5)


def test_make_run_dir_collision_suffix(tmp_path):
    """Two runs in the same second get distinct directories (counter suffix)
    instead of silently sharing one."""
    from packppi_tpu.utils.config import make_run_dir
    a = make_run_dir(str(tmp_path), timestamp="2026-01-02_03-04-05")
    b = make_run_dir(str(tmp_path), timestamp="2026-01-02_03-04-05")
    c = make_run_dir(str(tmp_path), timestamp="2026-01-02_03-04-05")
    assert len({a, b, c}) == 3
    assert all(p.is_dir() for p in (a, b, c))


def test_early_stopper_logic():
    """Patience semantics of the reference's early-stopping callback
    (reference: configs/callbacks/early_stopping.yaml): counted in
    validation checks, min-mode, min_delta, gated on min_epochs; NaN
    (no-validation epochs) neither improves nor consumes patience."""
    from types import SimpleNamespace

    from packppi_tpu.train.loop import EarlyStopper

    cfg = lambda **kw: SimpleNamespace(get=lambda k, d=None, _kw=kw: _kw.get(k, d))

    s = EarlyStopper(cfg(early_stopping_patience=2))
    assert not s.should_stop(0, 1.0)       # first value = improvement
    assert not s.should_stop(1, float("nan"))  # no-val epoch: ignored
    assert not s.should_stop(2, 1.0)       # stale 1
    assert s.should_stop(3, 1.0)           # stale 2 -> stop

    # improvement resets patience
    s = EarlyStopper(cfg(early_stopping_patience=1))
    assert not s.should_stop(0, 1.0)
    assert not s.should_stop(1, 0.5)
    assert s.should_stop(2, 0.5)

    # min_delta: tiny improvements don't count
    s = EarlyStopper(cfg(early_stopping_patience=1, early_stopping_min_delta=0.1))
    assert not s.should_stop(0, 1.0)
    assert s.should_stop(1, 0.95)

    # min_epochs holds off stopping (the reference's neutralization knob)
    s = EarlyStopper(cfg(early_stopping_patience=1, min_epochs=4))
    assert not s.should_stop(0, 1.0)
    assert not s.should_stop(1, 1.0)       # patience exhausted but epoch < min
    assert s.should_stop(3, 1.0)

    # disabled by default
    s = EarlyStopper(cfg())
    assert not any(s.should_stop(e, 1.0) for e in range(50))


def test_train_diffusion_early_stopping(tmp_path):
    """End-to-end: with lr=0 the val loss never improves, so training stops
    after patience+1 validation checks instead of running max_epochs."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from make_crop_corpus import take_residues

    from packppi_tpu.structure import from_pdb_file, to_pdb
    from packppi_tpu.train.loop import train_diffusion

    prot = from_pdb_file(os.path.join(os.path.dirname(__file__), "fixtures", "1brs.pdb"),
                         mse_to_met=True)
    data_dir = tmp_path / "corpus"
    data_dir.mkdir()
    for k in range(6):
        sel = np.arange(k * 13, k * 13 + 48) % len(prot.aaindex)
        (data_dir / f"crop{k:02d}_rc.pdb").write_text(
            to_pdb(take_residues(prot, np.sort(sel))))

    cfg = load_config(os.path.join(CONFIG_DIR, "train_diffusion.yaml"), [
        f"output_dir={tmp_path / 'out'}",
        f"data.data_dir={data_dir}",
        "data.split_fractions=[0.7,0.2,0.1]",
        "data.batch_size=1",
        "trainer.n_devices=1",
        "trainer.max_epochs=30",
        "trainer.lr=0.0",
        "trainer.early_stopping_patience=1",
        "sample.sample_during_training=false",
        "seed=0",
    ])
    result = train_diffusion(cfg)
    # val eval draws fresh noise each epoch, so the constant-params loss
    # still fluctuates a little — the stop lands on the first epoch whose
    # val draw fails to improve on the running best (epoch 2-4 in practice,
    # seed-deterministic), far short of max_epochs
    assert 2 <= result["epochs_run"] <= 6
    assert np.isfinite(result["best_val_loss"])


def test_configure_platform_keeps_cpu_backend(monkeypatch):
    """A forced accelerator platform must keep the CPU backend registered
    (host metric paths pin eager work there — utils.analysis.get_metric)."""
    import jax

    from packppi_tpu.utils.platform import configure_platform

    recorded = {}
    monkeypatch.setattr(jax.config, "update",
                        lambda k, v: recorded.setdefault(k, v))
    configure_platform("axon")
    assert recorded["jax_platforms"] == "axon,cpu"
    recorded.clear()
    configure_platform("cpu")
    assert recorded["jax_platforms"] == "cpu"
    recorded.clear()
    configure_platform("tpu,cpu")
    assert recorded["jax_platforms"] == "tpu,cpu"


def test_metric_logger_wandb_backend(tmp_path):
    """The wandb backend writes wandb-history-schema JSONL rows (with the
    real wandb package absent) alongside the always-on metrics.jsonl."""
    import json as _json

    from packppi_tpu.utils.logging import MetricLogger

    ml = MetricLogger(tmp_path / "logs", backends=("wandb",),
                      run_config={"seed": 1})
    ml.log(0, {"loss": 2.0}, prefix="train/")
    ml.log(5, {"loss": 1.0}, prefix="train/")
    ml.close()

    hist = tmp_path / "logs" / "wandb" / "history.jsonl"
    assert hist.exists()
    rows = [_json.loads(l) for l in hist.read_text().splitlines()]
    assert rows[0]["_step"] == 0 and rows[0]["train/loss"] == 2.0
    assert rows[1]["_step"] == 5 and "_runtime" in rows[1]
    meta = _json.loads((tmp_path / "logs" / "wandb" / "wandb-metadata.json").read_text())
    assert meta["config"]["seed"] == 1
    # metrics.jsonl unchanged by backend selection
    base = [_json.loads(l) for l in (tmp_path / "logs" / "metrics.jsonl").read_text().splitlines()]
    assert base[0]["train/loss"] == 2.0
