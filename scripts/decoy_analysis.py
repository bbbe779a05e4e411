#!/usr/bin/env python
"""Decoy energy-landscape analysis (script form of the reference notebooks).

For a directory of decoy structures of the same complex (e.g. chi-perturbed
CASP models), computes per-decoy:

* the model's diffusion score norm at t=0 (how "on-manifold" the side
  chains look to the trained score network),
* the on-device clash energy,
* chi deviation from the native structure,
* optional Rosetta REU (when a scores CSV from rosetta_baseline.py exists).

Writes a CSV plus the score-vs-REU / clash-vs-REU correlations — the
quantities the reference's decoys_{energy,clash_reu,landscape} notebooks
plot (reference: scripts/decoys_*.ipynb).
"""
from __future__ import annotations

import argparse
import csv
import json
from pathlib import Path

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--native", required=True, help="native (reference) PDB")
    p.add_argument("--decoy_dir", required=True)
    p.add_argument("--ckpt", default=None, help="trained diffusion checkpoint")
    p.add_argument("--rosetta_scores", default=None,
                   help="CSV with columns name,reu (optional)")
    p.add_argument("--out", default="decoy_analysis.csv")
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    from packppi_tpu.utils.platform import configure_platform
    configure_platform(args.platform)
    import jax
    import jax.numpy as jnp

    from packppi_tpu.data import stack_batch
    from packppi_tpu.models import NetworkConfig, SampleConfig, TorsionalDiffusion
    from packppi_tpu.ops.clash import compute_residue_clash
    from packppi_tpu.structure import from_pdb_file
    from packppi_tpu.structure.featurize import featurize
    from packppi_tpu.train import load_params
    from packppi_tpu.utils.metrics import chi_metrics

    native_feats = featurize(from_pdb_file(args.native, mse_to_met=True))
    L = len(native_feats["residue_type"])

    model = TorsionalDiffusion.create(NetworkConfig(), SampleConfig())
    native_batch = stack_batch([native_feats], target_len=L)
    if args.ckpt:
        template = jax.eval_shape(lambda: model.init(jax.random.key(0), native_batch))
        params = load_params(args.ckpt, template)
    else:
        print("WARNING: scoring with random weights (no --ckpt)")
        params = model.init(jax.random.key(0), native_batch)

    @jax.jit
    def model_score_norm(batch):
        t = jnp.zeros(batch.residue_mask.shape)
        score, _ = model.apply(params, batch, batch.SC_D, t)
        m = batch.SC_D_mask
        return jnp.sqrt((score**2 * m).sum() / jnp.maximum(m.sum(), 1))

    @jax.jit
    def clash_energy(batch):
        prc = compute_residue_clash(batch, batch.SC_D)
        return (prc * batch.residue_mask).sum()

    reu = {}
    if args.rosetta_scores:
        with open(args.rosetta_scores) as f:
            for row in csv.DictReader(f):
                reu[row["name"]] = float(row["reu"])

    rows = []
    for decoy in sorted(Path(args.decoy_dir).glob("*.pdb")):
        feats = featurize(from_pdb_file(decoy, mse_to_met=True))
        if len(feats["residue_type"]) != L:
            print(f"skip {decoy.name}: residue count mismatch")
            continue
        batch = stack_batch([feats], target_len=L)
        m = chi_metrics(native_feats["SC_D"], feats["SC_D"], native_feats["SC_D_mask"],
                        native_feats["chi_1pi_periodic_mask"])
        rows.append({
            "name": decoy.name,
            "model_score_norm": float(model_score_norm(batch)),
            "clash_energy": float(clash_energy(batch)),
            "chi1_ae_deg": m["chi_0_ae_deg"],
            "total_acc": m["total_acc"],
            "reu": reu.get(decoy.name, ""),
        })

    with open(args.out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {args.out} ({len(rows)} decoys)")

    have_reu = [r for r in rows if r["reu"] != ""]
    if len(have_reu) > 2:
        reus = np.array([r["reu"] for r in have_reu], float)
        for key in ("model_score_norm", "clash_energy"):
            vals = np.array([r[key] for r in have_reu])
            if vals.std() > 0 and reus.std() > 0:
                print(f"corr({key}, REU) = {np.corrcoef(vals, reus)[0, 1]:.3f}")
    summary = {"n_decoys": len(rows)}
    Path(args.out).with_suffix(".json").write_text(json.dumps(summary))


if __name__ == "__main__":
    main()
