"""Build an offline pre-training corpus by cropping real complexes.

The reference trains on ~5k complexes (reference: data/download_complex.py,
src/train_diffusion.py:19) — unavailable offline. This tool converts the
real structures we do have into hundreds of distinct local packing
environments: spatially coherent crops (a center residue plus its K nearest
residues by CA distance) and contiguous sequence windows. Each crop is a
valid multi-chain sub-complex written as `<name>_rc.pdb`, directly
consumable by `packppi-train-diffusion` (scan_complex_dir + featurize);
chain breaks introduced by cropping are handled by the featurizer's
residue-index-contiguity dihedral masking (structure/featurize.py:55-58).

Crop sizes default to the loader's small length buckets (64/96) so every
batch compiles into one of two executables.

Usage:
    python scripts/make_crop_corpus.py --out data/crops \
        tests/fixtures/1brs.pdb tests/fixtures/2ftl.pdb
"""
from __future__ import annotations

import argparse
import dataclasses
from pathlib import Path

import numpy as np

from packppi_tpu.structure.protein import Protein, from_pdb_file, to_pdb


def take_residues(prot: Protein, sel: np.ndarray) -> Protein:
    """Sub-protein at (sorted, original-order) residue indices ``sel``."""
    return Protein(**{f.name: getattr(prot, f.name)[sel]
                      for f in dataclasses.fields(Protein)})


def spatial_crops(prot: Protein, size: int, stride: int):
    """(center, selection) pairs: K-nearest-residue neighborhoods by CA."""
    ca = prot.atom_positions[:, 1]  # atom14 index 1 = CA
    n = len(ca)
    if n <= size:
        return
    d2 = np.sum((ca[:, None] - ca[None, :]) ** 2, -1)
    for center in range(0, n, stride):
        sel = np.sort(np.argpartition(d2[center], size)[:size])
        yield center, sel


def window_crops(prot: Protein, size: int, stride: int):
    """Contiguous per-chain sequence windows (intact backbone dihedrals)."""
    chains = prot.chain_id
    for cid in dict.fromkeys(chains):  # first-appearance order
        idx = np.nonzero(chains == cid)[0]
        if len(idx) < size:
            continue
        for s in range(0, len(idx) - size + 1, stride):
            yield f"{cid}{idx[s]}", idx[s:s + size]


def jitter(prot: Protein, sigma: float, rng) -> Protein:
    """Gaussian coordinate noise on every present atom (augmentation:
    decorrelates the corpus from exact crystal geometry; chi targets shift
    by ~1-2 deg at sigma=0.05 A, well under the 20-deg accuracy bin)."""
    noise = rng.normal(0.0, sigma, prot.atom_positions.shape)
    return dataclasses.replace(
        prot, atom_positions=prot.atom_positions + noise * prot.atom_mask[..., None])


def build(sources: list[str], out_dir: str, sizes=(64, 96), stride: int = 4,
          window_stride: int = 24, noise_copies: int = 0,
          noise_sigma: float = 0.05, seed: int = 0) -> int:
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    n_written = 0
    for src in sources:
        name = Path(src).stem.lower()
        prot = from_pdb_file(src, mse_to_met=True)
        crops: dict[str, np.ndarray] = {}
        for size in sizes:
            for center, sel in spatial_crops(prot, size, stride):
                crops[f"{name}_s{size}c{center}"] = sel
            for tag, sel in window_crops(prot, size, window_stride):
                crops[f"{name}_w{size}{tag}"] = sel
        # drop exact-duplicate selections (edge windows / coincident centers)
        seen: set[bytes] = set()
        for tag, sel in crops.items():
            h = sel.astype(np.int32).tobytes()
            if h in seen:
                continue
            seen.add(h)
            sub = take_residues(prot, sel)
            (out / f"{tag}_rc.pdb").write_text(to_pdb(sub))
            n_written += 1
            for k in range(noise_copies):
                (out / f"{tag}n{k}_rc.pdb").write_text(
                    to_pdb(jitter(sub, noise_sigma, rng)))
                n_written += 1
        print(f"{src}: {len(prot.aaindex)} residues -> "
              f"{len(seen)} unique crops (cumulative {n_written})")
    return n_written


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("sources", nargs="+", help="source PDB files")
    ap.add_argument("--out", required=True, help="output corpus directory")
    ap.add_argument("--sizes", type=int, nargs="+", default=[64, 96])
    ap.add_argument("--stride", type=int, default=4,
                    help="spatial-crop center stride (residues)")
    ap.add_argument("--window_stride", type=int, default=24)
    ap.add_argument("--noise_copies", type=int, default=0,
                    help="extra jittered copies per crop (augmentation)")
    ap.add_argument("--noise_sigma", type=float, default=0.05,
                    help="coordinate noise stddev (A) for jittered copies")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    n = build(args.sources, args.out, tuple(args.sizes), args.stride,
              args.window_stride, args.noise_copies, args.noise_sigma,
              args.seed)
    print(f"corpus: {n} crops in {args.out}")


if __name__ == "__main__":
    main()
