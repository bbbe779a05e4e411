"""One-command reproduction: real ESM-2 650M -> esm-mode affinity CV.

The moment egress opens, this downloads facebook/esm2_t33_650M_UR50D
(the backbone the reference's esm affinity mode embeds with; reference:
src/datamodules/components/helper.py:131-169), converts it to the in-repo
JAX ESM-2 (models/esm2.py, torch-golden-locked), precomputes wt/mut
embeddings for every SKEMPI mutation, and runs the 3-fold esm-mode CV.

Usage (online):
    python scripts/repro_esm2_cv.py --fetch --data_dir data/skempi

Usage (offline stand-in, tested end-to-end in this repo):
    python scripts/repro_esm2_cv.py --random_esm \
        --data_dir tests/fixtures/skempi_mini --epochs 2

``--random_esm`` runs the identical pipeline with a small randomly
initialized ESM-2 (architecture exercised, weights not pretrained) so the
whole path — embedding extraction, caching, CV training, fold metrics —
is verified without egress; with ``--fetch`` the only difference is the
state dict.
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def random_extractor(seed: int = 0, hidden: int = 64, layers: int = 2,
                     heads: int = 4):
    """Stand-in extractor: the real JAX ESM-2 forward + the real HF-layout
    conversion (models/esm2.convert_hf_esm) at toy width with random
    weights, through the same chain-separated tokenize/reorder glue the
    online extractor uses. Embedding dim differs from 1280 — the affinity
    head's input width follows the embedding array, so CV runs unchanged."""
    from packppi_tpu.data.esm import (build_chain_separated_sequence,
                                      chain_grouped_order,
                                      residue_keep_indices)
    from packppi_tpu.models.esm2 import (ESM2Config, convert_hf_esm,
                                         make_extractor, tokenize)

    cfg = ESM2Config(vocab_size=33, hidden_size=hidden, num_layers=layers,
                     num_heads=heads, intermediate_size=hidden * 4)
    rng = np.random.default_rng(seed)

    def w(*shape, scale=0.05):
        return rng.normal(0, scale, shape).astype(np.float32)

    sd = {"embeddings.word_embeddings.weight": w(cfg.vocab_size, hidden),
          "encoder.emb_layer_norm_after.weight": np.ones(hidden, np.float32),
          "encoder.emb_layer_norm_after.bias": np.zeros(hidden, np.float32)}
    for i in range(layers):
        for stem, (din, dout) in (
                (f"encoder.layer.{i}.attention.self.query", (hidden, hidden)),
                (f"encoder.layer.{i}.attention.self.key", (hidden, hidden)),
                (f"encoder.layer.{i}.attention.self.value", (hidden, hidden)),
                (f"encoder.layer.{i}.attention.output.dense", (hidden, hidden)),
                (f"encoder.layer.{i}.intermediate.dense", (hidden, hidden * 4)),
                (f"encoder.layer.{i}.output.dense", (hidden * 4, hidden))):
            sd[f"{stem}.weight"] = w(dout, din)   # torch [out, in]
            sd[f"{stem}.bias"] = np.zeros(dout, np.float32)
        for ln in (f"encoder.layer.{i}.attention.LayerNorm",
                   f"encoder.layer.{i}.LayerNorm"):
            sd[f"{ln}.weight"] = np.ones(hidden, np.float32)
            sd[f"{ln}.bias"] = np.zeros(hidden, np.float32)

    run_tokens = make_extractor(convert_hf_esm(sd, cfg), cfg)

    def extract(residue_types, chain_indices, mask_positions=None):
        seq = build_chain_separated_sequence(residue_types, chain_indices,
                                             mask_positions)
        reps = run_tokens(tokenize(seq))[1:-1]  # drop cls/eos
        keep = residue_keep_indices(chain_indices)
        perm = chain_grouped_order(chain_indices)
        out = np.empty((len(perm), reps.shape[-1]), np.float32)
        out[perm] = reps[keep]
        return out

    return extract


def precompute_embeddings(entries, cache_dir: Path, extractor) -> int:
    """Write esm_<pdb>_<id>.npz wt/mut caches (what the esm trainer reads)."""
    from packppi_tpu.data.skempi import apply_mutations
    from packppi_tpu.structure import from_pdb_file
    from packppi_tpu.structure.featurize import featurize

    cache_dir.mkdir(parents=True, exist_ok=True)
    n = 0
    for e in entries:
        cache = cache_dir / f"esm_{e['pdb_id']}_{e['id']}.npz"
        if cache.exists():
            continue
        prot = from_pdb_file(e["pdb_path"], mse_to_met=True)
        feats = featurize(prot)
        try:
            rt_mut, _ = apply_mutations(prot, e["mutations"], strict=True)
        except ValueError as err:
            print(f"skipping {e['pdb_id']}/{e['id']}: {err}")
            continue
        wt = extractor(feats["residue_type"], feats["chain_indices"])
        mut = extractor(rt_mut, feats["chain_indices"])
        wt = wt * feats["residue_mask"][:, None]
        mut = mut * feats["residue_mask"][:, None]
        np.savez_compressed(cache, wt=wt, mut=mut)
        n += 1
    return n


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--fetch", action="store_true",
                     help="download ESM-2 650M from HuggingFace (needs egress)")
    src.add_argument("--random_esm", action="store_true",
                     help="offline stand-in: toy random-weight JAX ESM-2")
    p.add_argument("--data_dir", default="data/skempi",
                   help="SKEMPI layout: <dir>/skempi_v2.csv + <dir>/PDBs/")
    p.add_argument("--folds", type=int, default=3)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--outdir", default="repro_esm_cv")
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    from packppi_tpu.utils.platform import configure_platform
    configure_platform(args.platform)

    from packppi_tpu.data.skempi import load_skempi_entries
    from packppi_tpu.train.loop import train_affinity
    from packppi_tpu.utils.config import load_config

    if args.fetch:
        from transformers import EsmModel

        from packppi_tpu.data.esm import ESM_MODEL_NAME
        # populate the HF cache; get_esm_extractor() then finds it with
        # local_files_only=True and converts to the JAX model
        EsmModel.from_pretrained(ESM_MODEL_NAME)
        from packppi_tpu.data.esm import get_esm_extractor
        extractor = get_esm_extractor()
        if extractor is None:
            raise SystemExit("download appeared to succeed but the extractor "
                             "still cannot load the weights")
    else:
        extractor = random_extractor()

    entries = load_skempi_entries(args.data_dir, "PDBs")
    if not entries:
        raise SystemExit(f"no usable SKEMPI entries under {args.data_dir}")
    cache_dir = Path(args.data_dir) / "dataset_cache"
    n = precompute_embeddings(entries, cache_dir, extractor)
    print(f"embeddings: {n} newly cached, {len(entries)} total entries")

    results = {}
    for fold in range(args.folds):
        cfg = load_config(
            str(REPO / "configs/train_affinity.yaml"),
            [f"data.data_dir={args.data_dir}",
             "model.mode=esm",
             f"data.num_cvfolds={args.folds}",
             f"data.cvfold_index={fold}",
             f"data.batch_size={args.batch_size}",
             f"trainer.max_epochs={args.epochs}",
             f"output_dir={args.outdir}/fold{fold}"])
        results[f"fold{fold}"] = train_affinity(cfg)
        print(f"fold {fold}: {results[f'fold{fold}']}")

    vals = [r.get("best_val_loss", r.get("val_loss")) for r in results.values()
            if isinstance(r, dict)]
    summary = {"folds": results,
               "mean_val_loss": float(np.mean([v for v in vals if v is not None]))
               if any(v is not None for v in vals) else None,
               "weights": "esm2_t33_650M" if args.fetch else "random_standin"}
    Path(args.outdir).mkdir(parents=True, exist_ok=True)
    (Path(args.outdir) / "cv_summary.json").write_text(
        json.dumps(summary, indent=1, default=str))
    print(json.dumps({k: v for k, v in summary.items() if k != "folds"}))
    if args.random_esm:
        print("NOTE: --random_esm weights are a stand-in; metrics validate "
              "the pipeline, not ESM parity.")


if __name__ == "__main__":
    main()
