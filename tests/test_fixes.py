"""Regression tests for round-2 hardening fixes.

Covers: tolerant checkpoint loading (TrainState vs params-only), the
lengths manifest (no full-corpus featurization during loader planning),
ESM eval tail batches, and the degenerate-dihedral reference parity.
"""
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from packppi_tpu.train.checkpoints import load_model_params, save_params


def _tiny_params():
    return {"params": {"Dense_0": {"kernel": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
                                   "bias": jnp.zeros(3)}}}


def test_load_model_params_accepts_params_only(tmp_path):
    params = _tiny_params()
    save_params(tmp_path / "ckpt", params)
    template = jax.eval_shape(lambda: params)
    out = load_model_params(str(tmp_path / "ckpt"), template)
    np.testing.assert_array_equal(out["params"]["Dense_0"]["kernel"],
                                  params["params"]["Dense_0"]["kernel"])


def test_load_model_params_unwraps_trainstate(tmp_path):
    """A full diffusion TrainState checkpoint restores into a params-only
    template (the reference analog: AffinityPrediction loads a
    TDiffusionModule training .ckpt as its frozen backbone)."""
    from packppi_tpu.train.diffusion_task import TrainState

    params = _tiny_params()
    state = TrainState(params=params, opt_state=(jnp.zeros(()),),
                       step=jnp.asarray(7), key=jax.random.key(0))
    save_params(tmp_path / "ckpt", state)
    template = jax.eval_shape(lambda: params)
    out = load_model_params(str(tmp_path / "ckpt"), template)
    np.testing.assert_array_equal(out["params"]["Dense_0"]["kernel"],
                                  params["params"]["Dense_0"]["kernel"])


def test_load_model_params_rejects_mismatched_tree(tmp_path):
    save_params(tmp_path / "ckpt", _tiny_params())
    bad_template = jax.eval_shape(
        lambda: {"params": {"Dense_0": {"kernel": jnp.zeros((4, 5)), "bias": jnp.zeros(5)}}})
    with pytest.raises(ValueError, match="does not match"):
        load_model_params(str(tmp_path / "ckpt"), bad_template)


def test_lengths_manifest_avoids_featurization(tmp_path, monkeypatch):
    """Loader planning must not featurize the corpus: lengths come from a
    parse-only scan persisted to a JSON manifest."""
    import shutil

    from packppi_tpu.data.complex import ComplexDataset

    fixtures = Path(__file__).parent / "fixtures"
    pdb_dir = tmp_path / "pdbs"
    pdb_dir.mkdir()
    for name in ("1brs", "2ftl"):
        shutil.copy(fixtures / f"{name}.pdb", pdb_dir / f"{name}_rc.pdb")

    import packppi_tpu.data.complex as complex_mod

    def _no_featurize(*a, **kw):
        raise AssertionError("lengths() must not featurize")

    monkeypatch.setattr(complex_mod, "featurize", _no_featurize)
    ds = ComplexDataset(str(pdb_dir), ["1brs", "2ftl"], cache_dir=str(tmp_path / "cache"))
    lengths = ds.lengths()
    assert lengths == [195, 280]

    manifest = json.loads((tmp_path / "cache" / "lengths.json").read_text())
    assert manifest == {"1brs": 195, "2ftl": 280}

    # second dataset instance answers purely from the manifest (no parsing)
    monkeypatch.setattr(complex_mod, "from_pdb_file",
                        lambda *a, **kw: (_ for _ in ()).throw(AssertionError("manifest miss")))
    ds2 = ComplexDataset(str(pdb_dir), ["1brs", "2ftl"], cache_dir=str(tmp_path / "cache"))
    assert ds2.lengths() == [195, 280]


def test_loader_uses_dataset_lengths(tmp_path, monkeypatch):
    from packppi_tpu.data.loader import BucketedLoader

    class FakeDataset:
        def __len__(self):
            return 3

        def lengths(self):
            return [10, 11, 200]

        def __getitem__(self, i):
            raise AssertionError("planning must not materialize items")

    loader = BucketedLoader(FakeDataset(), batch_size=2, shuffle=False)
    # two buckets (10/11 together, 200 alone) -> 2 planned batches
    assert len(loader) == 2


def test_esm_batches_eval_emits_partial_tail():
    from packppi_tpu.train.loop import esm_batches

    def load_item(e):
        return (np.ones((5, 1280), np.float32), np.ones((5, 1280), np.float32),
                np.float32(e))

    entries = [1.0, 2.0, 3.0]  # 3 entries, batch_size 2
    eval_batches = list(esm_batches(entries, 2, False, 0, load_item))
    assert [b[2].shape[0] for b in eval_batches] == [2, 1]  # tail emitted
    train_batches = list(esm_batches(entries, 2, True, 0, load_item))
    assert [b[2].shape[0] for b in train_batches] == [2]  # tail dropped

    # a split smaller than batch_size still yields at eval
    small = list(esm_batches([1.0], 4, False, 0, load_item))
    assert len(small) == 1 and small[0][2].shape[0] == 1


def test_degenerate_dihedral_matches_reference():
    """Bit-parity with the reference's unclamped arccos + nan_to_num
    (reference: src/models/components/encoder.py:164-174), including
    degenerate near-parallel/antiparallel normals where f32 rounding can
    push |dot| past 1 (reference yields NaN -> 0)."""
    import torch

    from packppi_tpu.geometry.dihedrals import dihedral_from_four_points

    def reference(p0, p1, p2, p3):
        def norm(t):
            return torch.nan_to_num(t / torch.norm(t, dim=-1, keepdim=True))
        u0, u1, u2 = p2 - p1, p0 - p1, p3 - p2
        n1 = norm(torch.cross(u0, u1, dim=-1))
        n2 = norm(torch.cross(u0, u2, dim=-1))
        sgn = torch.sign((torch.cross(u1, u2, dim=-1) * u0).sum(-1))
        return torch.nan_to_num(sgn * torch.arccos((n1 * n2).sum(-1)))

    rng = np.random.default_rng(3)
    pts = rng.normal(size=(4, 256, 3)).astype(np.float32)
    # append degenerate rows: coplanar (parallel / antiparallel normals)
    degen = []
    for flip in (1.0, -1.0):
        a = rng.normal(size=3).astype(np.float32)
        b = rng.normal(size=3).astype(np.float32)
        degen.append(np.stack([a, np.zeros(3, np.float32), b, flip * a]))
    pts = np.concatenate([pts, np.stack(degen, 1)], axis=1)

    ours = np.asarray(dihedral_from_four_points(*[jnp.asarray(p) for p in pts]))
    theirs = reference(*[torch.from_numpy(p) for p in pts]).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_skempi_mini_fixture_loads():
    """The committed real-SKEMPI subset (1BRS + 2FTL mutations from the
    SKEMPI-v2 CSV) loads with complex-grouped CV folds — the corpus behind
    the real-data affinity training evidence in PARITY.md."""
    import os
    from packppi_tpu.data.skempi import cv_split, load_skempi_entries

    d = os.path.join(os.path.dirname(__file__), "fixtures", "skempi_mini")
    entries = load_skempi_entries(d, "PDBs")
    assert len(entries) == 126
    by_pdb = {}
    for e in entries:
        by_pdb.setdefault(e["pdb_id"], 0)
        by_pdb[e["pdb_id"]] += 1
    assert by_pdb == {"1BRS": 94, "2FTL": 32}
    sp = cv_split(entries, 3, 0, 42)
    train_cplx = {e["pdb_id"] for e in sp["train"]}
    val_cplx = {e["pdb_id"] for e in sp["valid"]}
    assert train_cplx.isdisjoint(val_cplx)  # leave-complex-out


def test_train_affinity_esm_mode_end_to_end(tmp_path):
    """ESM-mode affinity training runs end to end on precomputed embeddings
    (reference: configs/experiment/affinity_esm.yaml) — real skempi_mini
    entries, synthetic cached [L,1280] features, finite losses, checkpoint
    written."""
    import os

    import numpy as np

    from packppi_tpu.data.skempi import load_skempi_entries
    from packppi_tpu.train.loop import train_affinity
    from packppi_tpu.utils.config import Config, load_config

    fix = os.path.join(os.path.dirname(__file__), "fixtures", "skempi_mini")
    data_dir = tmp_path / "skempi"
    data_dir.mkdir()
    (data_dir / "skempi_v2.csv").write_text(
        open(os.path.join(fix, "skempi_v2.csv")).read())
    pdbs = data_dir / "PDBs"
    pdbs.mkdir()
    for n in ("1BRS", "2FTL"):
        (pdbs / f"{n}.pdb").symlink_to(os.path.join(fix, "PDBs", f"{n}.pdb"))

    # trim the CSV to 4 mutations per complex (both CV folds non-empty),
    # THEN seed the embedding cache with the post-trim entry ids
    import pandas as pd
    df = pd.read_csv(data_dir / "skempi_v2.csv", sep=";")
    pdbcode = df["#Pdb"].str.split("_").str[0]
    keep = pd.concat([df[pdbcode == "1BRS"].head(4),
                      df[pdbcode == "2FTL"].head(4)])
    keep.to_csv(data_dir / "skempi_v2.csv", sep=";", index=False)

    cache = data_dir / "dataset_cache"
    cache.mkdir()
    rng = np.random.default_rng(0)
    entries = load_skempi_entries(str(data_dir), "PDBs")
    assert len(entries) == 8
    for e in entries:
        L = 195 if e["pdb_id"] == "1BRS" else 280
        np.savez_compressed(
            cache / f"esm_{e['pdb_id']}_{e['id']}.npz",
            wt=rng.normal(size=(L, 1280)).astype(np.float32),
            mut=rng.normal(size=(L, 1280)).astype(np.float32))

    cfg_dir = os.path.join(os.path.dirname(__file__), "..", "configs")
    cfg = load_config(os.path.join(cfg_dir, "train_affinity.yaml"), [
        f"output_dir={tmp_path / 'out'}",
        f"data.data_dir={data_dir}",
        "model.mode=esm",
        "data.num_cvfolds=2",
        "trainer.max_epochs=2",
        "data.batch_size=2",
        "seed=0",
    ])
    result = train_affinity(cfg)
    assert np.isfinite(result["best_val_loss"])
    assert result["best_ckpt"] is not None


def test_scripts_argparse_smoke():
    """Every data/baseline script parses --help (import-clean even when its
    external tool is absent)."""
    import os
    import subprocess
    import sys

    root = os.path.join(os.path.dirname(__file__), "..")
    for s in ("download_complex", "structural_leakage_check",
              "rosetta_baseline", "decoy_analysis"):
        r = subprocess.run([sys.executable, os.path.join(root, "scripts", f"{s}.py"),
                            "--help"], capture_output=True, timeout=120)
        assert r.returncode == 0, (s, r.stderr[-300:])


def test_train_affinity_saves_backbone_artifact(tmp_path):
    """Network-mode affinity training persists its frozen backbone to
    <out>/backbone so checkpoints are self-contained for packppi-ddg
    (--pre_ckpt <out>/backbone), even with a random backbone."""
    import os

    import pandas as pd

    from packppi_tpu.train.loop import train_affinity
    from packppi_tpu.utils.config import load_config

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

    cfg_dir = os.path.join(os.path.dirname(__file__), "..", "configs")
    out = tmp_path / "out"
    cfg = load_config(os.path.join(cfg_dir, "train_affinity.yaml"), [
        f"output_dir={out}", f"data.data_dir={data_dir}",
        "data.num_cvfolds=2", "data.batch_size=2", "trainer.n_devices=1",
        "trainer.max_epochs=1", "seed=0",
    ])
    result = train_affinity(cfg)
    assert (out / "backbone").is_dir()

    # the artifact restores through the standard checkpoint loader
    import jax

    from packppi_tpu.data.skempi import load_skempi_entries, skempi_features, stack_affinity_batch
    from packppi_tpu.models import NetworkConfig
    from packppi_tpu.models.affinity import AffinityModel
    from packppi_tpu.structure import from_pdb_file
    from packppi_tpu.train import load_model_params

    e = load_skempi_entries(str(data_dir), "PDBs")[0]
    feats = skempi_features(from_pdb_file(e["pdb_path"], mse_to_met=True),
                            e["mutations"], ddg=e["ddG"])
    batch = stack_affinity_batch([feats])
    model = AffinityModel.create(NetworkConfig(), mode="network")
    template = jax.eval_shape(
        lambda: model.backbone.init(jax.random.key(0), batch.wild()))
    bb = load_model_params(str(out / "backbone"), template)
    assert jax.tree.all(jax.tree.map(lambda a, b: a.shape == b.shape, bb, template))


# ---------------------------------------------------------------------------
# round-4 ADVICE fixes


def test_config_self_reference_raises(tmp_path):
    """a: ${a} converges in one pass (identical tree) — the fixpoint loop
    must not ship the literal '${a}' string; it raises instead."""
    from packppi_tpu.utils.config import load_config

    cfg = tmp_path / "selfref.yaml"
    cfg.write_text("a: ${a}\nb: 1\n")
    with pytest.raises(ValueError, match="unresolved"):
        load_config(str(cfg))


def test_config_mutual_reference_raises(tmp_path):
    from packppi_tpu.utils.config import load_config

    cfg = tmp_path / "mutual.yaml"
    cfg.write_text("a: ${b}\nb: ${a}\n")
    with pytest.raises(ValueError, match="converge|unresolved"):
        load_config(str(cfg))


def test_split_file_pruning_persists(tmp_path):
    """Reconciling a stale split against the directory rewrites the file so
    later runs stop re-warning about the same vanished codes."""
    from packppi_tpu.data.complex import split_entries

    split_file = tmp_path / "split.json"
    split_file.write_text(json.dumps(
        {"train": ["a", "gone"], "val": ["b"], "test": ["c"]}))
    out = split_entries(["a", "b", "c"], split_file=str(split_file))
    assert out["train"] == ["a"]
    on_disk = json.loads(split_file.read_text())
    assert on_disk == {"train": ["a"], "val": ["b"], "test": ["c"]}


def test_esm_batches_skips_none_items():
    """load_item returning None (mutation failed to apply) drops the entry
    instead of crashing or training on corrupt wt==mut pairs."""
    from packppi_tpu.data.esm import ESM_DIM
    from packppi_tpu.train.loop import esm_batches

    entries = [{"i": i} for i in range(4)]

    def load_item(e):
        if e["i"] == 2:
            return None
        L = 5 + e["i"]
        return (np.full((L, ESM_DIM), e["i"], np.float32),
                np.zeros((L, ESM_DIM), np.float32), np.float32(e["i"]))

    batches = list(esm_batches(entries, 2, False, 0, load_item))
    total = sum(b[0].shape[0] for b in batches)
    assert total == 3  # entry 2 dropped
    # an all-None batch is skipped entirely
    batches = list(esm_batches([{"i": 2}, {"i": 2}], 2, False, 0, load_item))
    assert batches == []
