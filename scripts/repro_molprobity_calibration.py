"""One-command reproduction: MolProbity binary vs native clashscore proxy.

The moment a MolProbity install is reachable, this runs the real
``molprobity.clashscore`` binary (reference: src/utils/protein_analysis.py:26-34,
``keep_hydrogens=True``) and the in-repo native H-aware proxy
(utils.metrics.probe_clashscore) over a spread of structures — the fixture
complexes plus chi-perturbed repacks spanning low to pathological clash
levels — and prints the calibration: per-structure pairs, Pearson r,
mean/max relative error, and a least-squares linear map proxy->binary.

Usage (with the binary):
    python scripts/repro_molprobity_calibration.py \
        --molprobity_loc ~/MolProbity/build/bin/molprobity.clashscore

Usage (offline stand-in, tested end-to-end in this repo):
    python scripts/repro_molprobity_calibration.py --proxy_vs_proxy

``--proxy_vs_proxy`` calibrates the on-device heavy-atom approximation
(utils.metrics.approx_clashscore) against the H-aware proxy through the
IDENTICAL harness — swapping in the binary changes one callable.
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

FIXTURES = REPO / "tests" / "fixtures"


def build_structure_set(workdir: Path, noise_scales=(0.0, 0.15, 0.4, 0.8),
                        seed: int = 0, max_residues: int = 100000) -> list:
    """Fixture PDBs + chi-perturbed repacks covering a clashscore range."""
    import dataclasses

    import jax.numpy as jnp

    from packppi_tpu.geometry import atom14_coords_from_torsions
    from packppi_tpu.structure import from_pdb_file, to_pdb
    from packppi_tpu.structure.featurize import featurize

    workdir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    out = []
    for fix in sorted(FIXTURES.glob("*.pdb")):
        prot = from_pdb_file(fix, mse_to_met=True)
        feats = featurize(prot)
        if feats["SC_D_mask"].sum() == 0 or len(feats["residue_type"]) > max_residues:
            continue
        for s in noise_scales:
            if s == 0.0:
                out.append(str(fix))
                continue
            sc = (feats["SC_D"]
                  + rng.normal(0, s, feats["SC_D"].shape).astype(np.float32)
                  * feats["SC_D_mask"])
            coords = np.asarray(atom14_coords_from_torsions(
                jnp.asarray(feats["X"][None]), jnp.asarray(feats["residue_type"][None]),
                jnp.asarray(feats["BB_D"][None]), jnp.asarray(sc[None])))[0]
            rm = feats["residue_mask"].astype(bool)
            pos = np.where(rm[:, None, None], coords,
                           np.nan_to_num(prot.atom_positions))
            pert = dataclasses.replace(prot, atom_positions=pos)
            path = workdir / f"{fix.stem}_chi{s}.pdb"
            path.write_text(to_pdb(pert))
            out.append(str(path))
    return out


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--molprobity_loc",
                     help="molprobity.clashscore binary (the real calibration)")
    src.add_argument("--proxy_vs_proxy", action="store_true",
                     help="offline stand-in: approx (heavy-atom) vs H-aware proxy")
    p.add_argument("--workdir", default="repro_molprobity")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", default=None)
    p.add_argument("--max_residues", type=int, default=100000,
                   help="skip fixtures above this size (the H-aware proxy is "
                        "host-side numpy; large complexes take minutes/structure "
                        "on a small host)")
    p.add_argument("--noise_scales", default="0.0,0.15,0.4,0.8",
                   help="comma-separated chi-noise stddevs (rad)")
    args = p.parse_args()

    from packppi_tpu.utils.platform import configure_platform
    configure_platform(args.platform)

    from packppi_tpu.structure import from_pdb_file
    from packppi_tpu.structure.featurize import featurize
    from packppi_tpu.utils.analysis import ProteinAnalysis
    from packppi_tpu.utils.metrics import approx_clashscore, probe_clashscore

    workdir = Path(args.workdir)
    scales = tuple(float(x) for x in args.noise_scales.split(","))
    pdbs = build_structure_set(workdir / "structures", noise_scales=scales,
                               seed=args.seed, max_residues=args.max_residues)
    print(f"{len(pdbs)} structures (fixtures + chi-perturbed repacks)")

    if args.molprobity_loc:
        analysis = ProteinAnalysis(args.molprobity_loc, tmp_dir=str(workdir / "tmp"))
        reference_fn = analysis.get_clashscore          # the real binary
        ref_name = "molprobity_binary"
    else:
        def reference_fn(pdb):
            return probe_clashscore(from_pdb_file(pdb, mse_to_met=True))
        ref_name = "probe_proxy(H-aware)"

    def proxy_fn(pdb):
        if args.molprobity_loc:
            # real run calibrates OUR primary proxy against the binary
            return probe_clashscore(from_pdb_file(pdb, mse_to_met=True))
        f = featurize(from_pdb_file(pdb, mse_to_met=True))
        return float(approx_clashscore(f["X"][None], f["atom_mask"][None],
                                       f["residue_type"][None],
                                       f["residue_index"][None]))

    proxy_name = "probe_proxy(H-aware)" if args.molprobity_loc else "approx(heavy-atom)"

    rows = []
    for pdb in pdbs:
        ref = reference_fn(pdb)
        prox = proxy_fn(pdb)
        if ref is None or prox is None:
            print(f"  {Path(pdb).name}: skipped (a scorer returned None)")
            continue
        rows.append({"pdb": Path(pdb).name, ref_name: float(ref),
                     proxy_name: float(prox)})
        print(f"  {Path(pdb).name:<28} {proxy_name}={prox:8.2f}  {ref_name}={ref:8.2f}")

    if len(rows) < 3:
        raise SystemExit("fewer than 3 scored structures — cannot calibrate")
    x = np.asarray([r[proxy_name] for r in rows])
    y = np.asarray([r[ref_name] for r in rows])
    slope, intercept = np.polyfit(x, y, 1)
    pearson = float(np.corrcoef(x, y)[0, 1]) if x.std() > 0 and y.std() > 0 else None
    nz = y > 1e-6
    rel = np.abs(x[nz] - y[nz]) / y[nz]
    summary = {
        "n": len(rows),
        "proxy": proxy_name,
        "reference": ref_name,
        "pearson": pearson,
        "mean_rel_err": float(rel.mean()) if nz.any() else None,
        "max_rel_err": float(rel.max()) if nz.any() else None,
        "linear_fit": {"slope": float(slope), "intercept": float(intercept)},
        "rows": rows,
    }
    (workdir / "calibration.json").write_text(json.dumps(summary, indent=1))
    print(json.dumps({k: v for k, v in summary.items() if k != "rows"}))
    if args.proxy_vs_proxy:
        print("NOTE: --proxy_vs_proxy validates the harness; run with "
              "--molprobity_loc for the real binary calibration.")


if __name__ == "__main__":
    main()
