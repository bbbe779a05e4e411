"""In-process CLI smoke tests (small protein, few steps, CPU)."""
import argparse
import os

import numpy as np
import pytest

from conftest import FIXTURES


def test_pack_cli_runs(tmp_path):
    from packppi_tpu.cli.pack import run

    args = argparse.Namespace(
        input=os.path.join(FIXTURES, "1brs.pdb"), outdir=str(tmp_path),
        ckpt=None, use_proximal=False, seed=0, platform=None, n_steps=2,
        molprobity_loc=None, exact_length=True, print_metrics=False,
        batch_size=1, precision="float32", no_fused=True)
    metrics = run(args)
    assert (tmp_path / "structure.pdb").exists()
    assert (tmp_path / "metrics.json").exists()
    assert 0 <= metrics["total_acc"] <= 1
    assert np.isfinite(metrics["clashscore"])


def test_ddg_cli_runs(tmp_path):
    from packppi_tpu.cli.ddg import run

    args = argparse.Namespace(
        input=os.path.join(FIXTURES, "1brs.pdb"), mutstr="KA25A",
        ckpt=None, pre_ckpt=None, mode="linear", outdir=str(tmp_path),
        seed=0, platform=None, esm_dir=None, esm_key=None)
    value = run(args)
    assert np.isfinite(value)
    assert (tmp_path / "ddg.json").exists()


def test_prox_cli_rejects_backbone_only(tmp_path):
    """A structure without side chains must be refused (reference asserts
    side-chain presence; reference: src/proximal_optimize.py:17-27)."""
    from packppi_tpu.cli.prox import run
    from packppi_tpu.structure import from_pdb_file, to_pdb
    import dataclasses

    prot = from_pdb_file(os.path.join(FIXTURES, "1brs.pdb"), chain_id="D")
    bb_mask = np.zeros_like(prot.atom_mask)
    bb_mask[:, :4] = prot.atom_mask[:, :4]
    bb_only = dataclasses.replace(prot, atom_mask=bb_mask)
    pdb = tmp_path / "bb_only.pdb"
    pdb.write_text(to_pdb(bb_only))

    args = argparse.Namespace(
        input=str(pdb), outdir=str(tmp_path), num_steps=2, lamda=1.0,
        violation_tolerance_factor=12.0, clash_overlap_tolerance=0.5,
        molprobity_loc=None, exact_length=True, platform=None)
    with pytest.raises(SystemExit, match="side-chain"):
        run(args)


def test_pack_cli_with_converted_checkpoint(tmp_path):
    """Full migration flow: reference-layout torch weights -> converter ->
    orbax checkpoint -> pack CLI --ckpt."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from convert_checkpoint import convert_diffusion_state_dict

    from conftest import GOLDEN
    from packppi_tpu.cli.pack import run
    from packppi_tpu.train import save_params

    z = np.load(os.path.join(GOLDEN, "network_golden.npz"))
    sd = {k[4:]: z[k] for k in z.files if k.startswith("sd::")}
    params = convert_diffusion_state_dict(sd)
    ckpt_dir = tmp_path / "converted_ckpt"
    save_params(str(ckpt_dir), params)

    args = argparse.Namespace(
        input=os.path.join(FIXTURES, "1brs.pdb"), outdir=str(tmp_path / "out"),
        ckpt=str(ckpt_dir), use_proximal=False, seed=0, platform=None, n_steps=2,
        molprobity_loc=None, exact_length=True, print_metrics=False,
        batch_size=1, precision="float32", no_fused=True)
    metrics = run(args)
    assert (tmp_path / "out" / "structure.pdb").exists()
    assert np.isfinite(metrics["atom_rmsd"])


def test_pack_cli_best_of_n(tmp_path):
    from packppi_tpu.cli.pack import run

    args = argparse.Namespace(
        input=os.path.join(FIXTURES, "1brs.pdb"), outdir=str(tmp_path),
        ckpt=None, use_proximal=False, seed=0, platform=None, n_steps=2,
        molprobity_loc=None, exact_length=True, print_metrics=False,
        batch_size=1, precision="float32", no_fused=True, n_samples=3)
    metrics = run(args)
    assert (tmp_path / "structure.pdb").exists()
    assert np.isfinite(metrics["clashscore"])


def test_ddg_eval_csv_mode(tmp_path):
    """Dataset evaluation: --eval_csv predicts every CSV mutation and
    reports correlation metrics + per-mutation JSONL."""
    import json
    import os

    import pandas as pd

    from packppi_tpu.cli.ddg import build_parser, run_eval_csv

    fix = os.path.join(os.path.dirname(__file__), "fixtures", "skempi_mini")
    data_dir = tmp_path / "skempi"
    (data_dir / "PDBs").mkdir(parents=True)
    df = pd.read_csv(os.path.join(fix, "skempi_v2.csv"), sep=";")
    pdbcode = df["#Pdb"].str.split("_").str[0]
    a = df[pdbcode == "1BRS"].head(3)
    b = df[pdbcode == "2FTL"].head(2)
    # INTERLEAVE complexes of different length buckets: bucketed batching
    # permutes the evaluation order, and per-row outputs must be mapped
    # back to CSV order (regression for a misalignment bug)
    rows = [a.iloc[[0]], b.iloc[[0]], a.iloc[[1]], b.iloc[[1]], a.iloc[[2]]]
    pd.concat(rows).to_csv(data_dir / "skempi_v2.csv", sep=";", index=False)
    for n in ("1BRS", "2FTL"):
        (data_dir / "PDBs" / f"{n}.pdb").symlink_to(
            os.path.join(fix, "PDBs", f"{n}.pdb"))

    args = build_parser().parse_args([
        "--eval_csv", str(data_dir), "--outdir", str(tmp_path / "out"),
        "--batch_size", "2", "--platform", "cpu"])
    out = run_eval_csv(args)
    assert out["n"] == 5
    assert "rmse" in out and out["rmse"] > 0
    rows = [json.loads(l) for l in open(tmp_path / "out" / "ddg_eval.jsonl")]
    assert len(rows) == 5
    # rows come back in CSV order with each mutation's OWN experimental ddG
    assert [r["complex"].split("_")[0] for r in rows] == [
        "1BRS", "2FTL", "1BRS", "2FTL", "1BRS"]
    from packppi_tpu.data.skempi import load_skempi_entries
    expected = load_skempi_entries(str(data_dir), "PDBs")
    for r, e in zip(rows, expected):
        assert r["mutstr"] == e["mutstr"]
        assert abs(r["ddg_exp"] - e["ddG"]) < 1e-6


def test_pack_cli_corrector_steps(tmp_path):
    """--corrector_steps 1 runs the per-schedule Langevin corrector inside
    the sampler scan and still writes a valid structure."""
    from packppi_tpu.cli.pack import run

    args = argparse.Namespace(
        input=os.path.join(FIXTURES, "1brs.pdb"), outdir=str(tmp_path),
        ckpt=None, use_proximal=False, seed=0, platform=None, n_steps=2,
        molprobity_loc=None, exact_length=True, print_metrics=False,
        batch_size=1, precision="float32", no_fused=True, corrector_steps=1)
    metrics = run(args)
    assert (tmp_path / "structure.pdb").exists()
    assert np.isfinite(metrics["clashscore"])
    assert 0 <= metrics["total_acc"] <= 1


def test_pack_cli_skips_metrics_for_backbone_only(tmp_path):
    """Packing a backbone-only input still writes the structure but skips
    the chi-comparison metric suite (undefined without true side chains;
    reference guard: src/eval_diffusion.py:43-50,73-77)."""
    import dataclasses

    from packppi_tpu.cli.pack import run
    from packppi_tpu.structure import from_pdb_file, to_pdb

    prot = from_pdb_file(os.path.join(FIXTURES, "1brs.pdb"), chain_id="D")
    bb_mask = np.zeros_like(prot.atom_mask)
    bb_mask[:, :4] = prot.atom_mask[:, :4]
    pdb = tmp_path / "bb_only.pdb"
    pdb.write_text(to_pdb(dataclasses.replace(prot, atom_mask=bb_mask)))

    args = argparse.Namespace(
        input=str(pdb), outdir=str(tmp_path), ckpt=None, use_proximal=False,
        seed=0, platform=None, n_steps=2, molprobity_loc=None,
        exact_length=True, print_metrics=False, batch_size=1,
        precision="float32", no_fused=True)
    metrics = run(args)
    assert (tmp_path / "structure.pdb").exists()
    assert "total_acc" not in metrics            # suite skipped
    assert "sampling_seconds" in metrics         # timing still reported
