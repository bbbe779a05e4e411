"""packppi-ddg: mutation binding-affinity change (ddG) inference (PackPPI-AP).

Equivalent of the reference CLI (reference: src/eval_affinity.py): parse a
complex, apply the mutation string (e.g. 'KI15G' or 'KA25A,DD35A'), run the
frozen-backbone affinity model, print predicted ddG in kcal/mol.
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path


def build_parser():
    p = argparse.ArgumentParser(description="PackPPI-TPU ddG prediction")
    p.add_argument("--input", default=None, help="wild-type complex PDB")
    p.add_argument("--mutstr", default=None,
                   help="comma-separated mutations, e.g. KI15G or KA25A,DD35A")
    p.add_argument("--eval_csv", default=None, metavar="DATA_DIR",
                   help="dataset mode: evaluate every mutation in "
                        "DATA_DIR/skempi_v2.csv (PDBs under DATA_DIR/PDBs), "
                        "reporting pearson/spearman/RMSE vs experimental ddG")
    p.add_argument("--batch_size", type=int, default=4,
                   help="dataset mode: mutations per device batch")
    p.add_argument("--ckpt", default=None, help="affinity-net checkpoint")
    p.add_argument("--pre_ckpt", default=None, help="pretrained diffusion checkpoint")
    p.add_argument("--mode", default="network", choices=["network", "linear", "esm"])
    p.add_argument("--esm_dir", default=None,
                   help="esm mode: directory with precomputed <key>.npz (wt/mut) embeddings")
    p.add_argument("--esm_key", default=None, help="esm mode: embedding file stem")
    p.add_argument("--outdir", default="packppi_out")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", default=None)
    p.add_argument("--no_strict_parity", action="store_true",
                   help="mask padding out of the ddG max-pool (padding-"
                        "invariant predictions) instead of reproducing the "
                        "reference's padded pool bit-for-bit")
    return p


def run_eval_csv(args) -> dict:
    """Dataset mode: predict ddG for every mutation in a SKEMPI-format CSV
    and report correlation metrics against the experimental values
    (complements the reference, which only evaluates during training)."""
    from packppi_tpu.utils.platform import configure_platform
    configure_platform(args.platform)
    import jax
    import numpy as np

    from packppi_tpu.data.loader import BucketedLoader
    from packppi_tpu.data.skempi import (load_skempi_entries, skempi_features,
                                         stack_affinity_batch)
    from packppi_tpu.models import NetworkConfig
    from packppi_tpu.models.affinity import AffinityModel
    from packppi_tpu.structure import from_pdb_file
    from packppi_tpu.train import load_model_params

    if args.mode == "esm":
        raise SystemExit("--eval_csv supports network/linear modes; for esm, "
                         "precompute embeddings and use the training loop's "
                         "eval (packppi-train-affinity model.mode=esm)")

    entries = load_skempi_entries(args.eval_csv, "PDBs")
    if not entries:
        raise SystemExit(f"no usable SKEMPI entries under {args.eval_csv}")

    # parse-only residue counts per unique PDB so loader planning does not
    # featurize the whole corpus (it still featurizes once per entry during
    # iteration, via the prefetch worker)
    pdb_len: dict = {}
    for e in entries:
        if e["pdb_path"] not in pdb_len:
            pdb_len[e["pdb_path"]] = len(
                from_pdb_file(e["pdb_path"], mse_to_met=True).aaindex)
    entry_lengths = [pdb_len[e["pdb_path"]] for e in entries]

    class DS:
        lengths = staticmethod(lambda: entry_lengths)

        def __len__(self):
            return len(entries)

        def __getitem__(self, i):
            e = entries[i]
            return skempi_features(from_pdb_file(e["pdb_path"], mse_to_met=True),
                                   e["mutations"], ddg=e["ddG"])

    loader = BucketedLoader(DS(), args.batch_size, shuffle=False, drop_last=False,
                            prefetch=2, stack_fn=stack_affinity_batch)
    # bucket grouping permutes entries; this is the yielded dataset order
    order = [i for b in loader.plan() for i in b]

    model = AffinityModel.create(NetworkConfig(), mode=args.mode,
                                 strict_parity=not getattr(args, "no_strict_parity", False))
    key = jax.random.key(args.seed)
    k_bb, k_net = jax.random.split(key)
    # shape template straight from the dataset: starting (and abandoning) a
    # loader iterator here would leave its prefetch worker blocked on a full
    # queue and re-featurize the first batches when the real loop starts
    first = stack_affinity_batch([DS()[0]])

    if args.pre_ckpt:
        template = jax.eval_shape(lambda: model.backbone.init(jax.random.key(0), first.wild()))
        backbone_params = load_model_params(args.pre_ckpt, template)
    else:
        print("WARNING: no --pre_ckpt; using randomly initialized diffusion backbone")
        backbone_params = model.backbone.init(k_bb, first.wild())
    if args.ckpt:
        template = jax.eval_shape(lambda: model.init(jax.random.key(0), first, backbone_params))
        params = load_model_params(args.ckpt, template)
    else:
        print("WARNING: no --ckpt; using randomly initialized affinity net")
        params = model.init(k_net, first, backbone_params)

    predict = jax.jit(lambda p, bp, b: model.predict(p, bp, b)[0])
    preds, labels = [], []
    for batch in loader:
        preds.append(np.asarray(predict(params, backbone_params, batch)))
        labels.append(np.asarray(batch.ddg))
    flat_p, flat_y = np.concatenate(preds), np.concatenate(labels)
    if len(flat_p) != len(entries):
        raise SystemExit(f"evaluated {len(flat_p)} of {len(entries)} entries "
                         "— incomplete eval, refusing to report metrics")
    # un-permute from bucket order back to CSV entry order
    p = np.empty(len(entries), flat_p.dtype)
    y = np.empty(len(entries), flat_y.dtype)
    p[order] = flat_p
    y[order] = flat_y

    out = {"n": len(entries),
           "rmse": float(np.sqrt(np.mean((p - y) ** 2))),
           "mae": float(np.mean(np.abs(p - y)))}
    if len(p) > 2 and p.std() > 0 and y.std() > 0:
        from packppi_tpu.utils.metrics import spearman

        out["pearson"] = float(np.corrcoef(p, y)[0, 1])
        out["spearman"] = spearman(p, y)
    print(json.dumps(out))

    outdir = Path(args.outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    with open(outdir / "ddg_eval.jsonl", "w") as f:
        for e, pi, yi in zip(entries, p, y):
            f.write(json.dumps({"complex": e["complex"], "mutstr": e["mutstr"],
                                "ddg_pred": float(pi), "ddg_exp": float(yi)}) + "\n")
    (outdir / "ddg_eval_summary.json").write_text(json.dumps(out))
    return out


def run(args) -> float:
    from packppi_tpu.utils.platform import configure_platform
    configure_platform(args.platform)
    import jax

    from packppi_tpu.data.skempi import parse_mutation, skempi_features, stack_affinity_batch
    from packppi_tpu.models import NetworkConfig
    from packppi_tpu.models.affinity import AffinityModel
    from packppi_tpu.structure import from_pdb_file
    from packppi_tpu.train import load_model_params

    prot = from_pdb_file(args.input, mse_to_met=True)
    mutations = [parse_mutation(m.strip()) for m in args.mutstr.split(",")]
    feats = skempi_features(prot, mutations)
    batch = stack_affinity_batch([feats])

    model = AffinityModel.create(NetworkConfig(), mode=args.mode,
                                 strict_parity=not getattr(args, "no_strict_parity", False))
    key = jax.random.key(args.seed)

    if args.mode == "esm":
        import jax.numpy as jnp
        import numpy as np

        from packppi_tpu.data.esm import get_esm_extractor, load_precomputed

        emb = load_precomputed(args.esm_dir, args.esm_key) if args.esm_dir else None
        if emb is not None:
            if "wt" not in emb or "mut" not in emb:
                raise SystemExit("esm npz must contain 'wt' and 'mut' arrays")
            wt, mt = emb["wt"], emb["mut"]
        else:
            extractor = get_esm_extractor()
            if extractor is None:
                raise SystemExit("esm mode needs --esm_dir/--esm_key or local ESM-2 weights")
            from packppi_tpu.data.skempi import apply_mutations
            rt_mut, _ = apply_mutations(prot, mutations)
            wt = extractor(feats["residue_type"], feats["chain_indices"])
            mt = extractor(rt_mut, feats["chain_indices"])
        wt, mt = jnp.asarray(wt)[None], jnp.asarray(mt)[None]
        if args.ckpt:
            template = jax.eval_shape(
                lambda: model.net.init(jax.random.key(0), None, None, wt, mt, None))
            params = load_model_params(args.ckpt, template)
        else:
            print("WARNING: no --ckpt; using randomly initialized esm head")
            params = model.net.init(key, None, None, wt, mt, None)
        ddg, _ = model.predict_esm(params, wt, mt)
        value = float(ddg[0])
        print(f"Predicted ddG (kcal/mol): {value:.4f}")
        outdir = Path(args.outdir)
        outdir.mkdir(parents=True, exist_ok=True)
        (outdir / "ddg.json").write_text(json.dumps(
            {"input": args.input, "mutstr": args.mutstr, "ddg_pred": value}))
        return value
    k_bb, k_net = jax.random.split(key)

    if args.pre_ckpt:
        template = jax.eval_shape(lambda: model.backbone.init(jax.random.key(0), batch.wild()))
        backbone_params = load_model_params(args.pre_ckpt, template)
    else:
        print("WARNING: no --pre_ckpt; using randomly initialized diffusion backbone")
        backbone_params = model.backbone.init(k_bb, batch.wild())

    if args.ckpt:
        template = jax.eval_shape(lambda: model.init(jax.random.key(0), batch, backbone_params))
        params = load_model_params(args.ckpt, template)
    else:
        print("WARNING: no --ckpt; using randomly initialized affinity net")
        params = model.init(k_net, batch, backbone_params)

    ddg, _ = jax.jit(lambda p, bp, b: model.predict(p, bp, b))(params, backbone_params, batch)
    value = float(ddg[0])
    print(f"Predicted ddG (kcal/mol): {value:.4f}")

    outdir = Path(args.outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    (outdir / "ddg.json").write_text(json.dumps(
        {"input": args.input, "mutstr": args.mutstr, "ddg_pred": value}))
    return value


def main():
    args = build_parser().parse_args()
    if args.eval_csv:
        run_eval_csv(args)
        return
    if not args.input or not args.mutstr:
        build_parser().error("--input and --mutstr are required "
                             "(or use --eval_csv DATA_DIR)")
    run(args)


if __name__ == "__main__":
    main()
