"""One-command reproduction: published checkpoint -> README parity table.

The moment egress opens, this fetches the reference's published trained
diffusion checkpoint (reference: README.md:43, the Google Drive folder),
converts it to packppi-tpu params (tools/convert_checkpoint.py), runs the
T1124 worked example with and without proximal refinement, and prints our
metrics next to the reference's published numbers
(reference: README.md:84-113).

Usage (online):
    python scripts/repro_published_weights.py --fetch

Usage (offline stand-in, tested end-to-end in this repo):
    python scripts/repro_published_weights.py \
        --sd_npz tests/golden/network_golden.npz --input tests/fixtures/t1124.pdb

``--sd_npz`` takes any npz holding a reference state_dict under ``sd::``
keys (the format tools/gen_network_golden.py emits); ``--torch_ckpt``
takes the published Lightning .ckpt directly once downloaded.
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

DRIVE_FOLDER = "https://drive.google.com/drive/folders/1MbvDKjQJIMafll5Sy3ZI2rJaLMOj8CkT"

# reference README.md:92-113 (eval_diffusion.py on data/T1124_lig.pdb,
# published weights): {metric: (plain, use_proximal)}
REFERENCE_TABLE = {
    "chi_0_acc": (0.8453, 0.8489),
    "chi_1_acc": (0.6806, 0.6644),
    "chi_2_acc": (0.4236, 0.3750),
    "chi_3_acc": (0.3077, 0.2769),
    "atom_rmsd": (0.7415, 0.7672),
    "total_acc": (0.5643, 0.5413),
    "interface_acc": (0.5972, 0.5569),
    "clashscore": (22.67, 16.42),
}


def fetch_checkpoint(outdir: Path) -> Path:
    """Download the published checkpoint folder. Requires egress + gdown."""
    try:
        import gdown  # type: ignore
    except ImportError:
        raise SystemExit(
            "gdown is not installed. Online path: pip install gdown, or "
            f"download {DRIVE_FOLDER} manually and pass --torch_ckpt <file>")
    outdir.mkdir(parents=True, exist_ok=True)
    gdown.download_folder(DRIVE_FOLDER, output=str(outdir), quiet=False)
    ckpts = sorted(outdir.rglob("*.ckpt")) + sorted(outdir.rglob("*.pt"))
    if not ckpts:
        raise SystemExit(f"no .ckpt/.pt found under {outdir} after download")
    return ckpts[0]


def convert(args, workdir: Path) -> Path:
    from convert_checkpoint import convert_diffusion_state_dict

    from packppi_tpu.train import save_params

    if args.sd_npz:
        import numpy as np
        z = np.load(args.sd_npz)
        sd = {k[4:]: z[k] for k in z.files if k.startswith("sd::")}
        if not sd:
            raise SystemExit(f"{args.sd_npz} has no sd:: keys")
    else:
        import torch
        blob = torch.load(args.torch_ckpt, map_location="cpu", weights_only=False)
        sd = blob.get("state_dict", blob)
        sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    params = convert_diffusion_state_dict(sd, args.num_mpnn_layers)
    out = workdir / "converted_params"
    save_params(out, params)
    print(f"converted {len(sd)} reference tensors -> {out}")
    return out


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--fetch", action="store_true",
                     help="download the published checkpoint (needs egress)")
    src.add_argument("--torch_ckpt", help="already-downloaded reference .ckpt")
    src.add_argument("--sd_npz", help="offline stand-in: npz with sd:: state-dict keys")
    p.add_argument("--input", default=str(REPO / "tests/fixtures/t1124.pdb"),
                   help="ground-truth complex to repack (README uses T1124)")
    p.add_argument("--workdir", default="repro_published")
    p.add_argument("--num_mpnn_layers", type=int, default=3)
    p.add_argument("--molprobity_loc", default=None)
    p.add_argument("--platform", default=None)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    workdir = Path(args.workdir)
    workdir.mkdir(parents=True, exist_ok=True)
    if args.fetch:
        args.torch_ckpt = str(fetch_checkpoint(workdir / "download"))
        args.sd_npz = None
    ckpt = convert(args, workdir)

    from packppi_tpu.cli import pack

    rows = {}
    for label, use_prox in (("plain", False), ("proximal", True)):
        ns = pack.build_parser().parse_args(
            ["--input", args.input, "--ckpt", str(ckpt),
             "--outdir", str(workdir / label), "--seed", str(args.seed)]
            + (["--use_proximal"] if use_prox else [])
            + (["--molprobity_loc", args.molprobity_loc] if args.molprobity_loc else [])
            + (["--platform", args.platform] if args.platform else []))
        rows[label] = pack.run(ns)

    print(f"\n{'metric':<16}{'ours':>10}{'README':>10}{'ours+prox':>12}{'README+prox':>13}")
    table = {}
    for metric, (ref_plain, ref_prox) in REFERENCE_TABLE.items():
        ours_p = rows["plain"].get(metric)
        ours_x = rows["proximal"].get(metric)
        fmt = lambda v: f"{float(v):.4f}" if v is not None else "n/a"
        print(f"{metric:<16}{fmt(ours_p):>10}{ref_plain:>10.4f}"
              f"{fmt(ours_x):>12}{ref_prox:>13.4f}")
        table[metric] = {"ours": None if ours_p is None else float(ours_p),
                         "reference": ref_plain,
                         "ours_proximal": None if ours_x is None else float(ours_x),
                         "reference_proximal": ref_prox}
    (workdir / "parity_table.json").write_text(json.dumps(table, indent=1))
    print(f"\nwrote {workdir / 'parity_table.json'}")
    if args.sd_npz:
        print("NOTE: --sd_npz stand-in weights are NOT the published "
              "checkpoint; metric values validate the pipeline, not parity.")


if __name__ == "__main__":
    main()
