"""packppi-prox: standalone proximal clash optimization (PackPPI-Prox).

Equivalent of the reference CLI (reference: src/proximal_optimize.py):
takes any structure WITH side chains, optimizes the chi angles of
clash-heavy residues, writes the relaxed structure, and reports
clashscore before/after.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import time
from pathlib import Path

import numpy as np


def _merge_output_structure(prot, feats, batch, coords, L):
    """Rebuilt coordinates for modeled residues; residues the model cannot
    represent (incomplete backbone -> residue_mask 0) pass through unchanged
    so the output keeps the input's residue count."""
    rm = feats["residue_mask"].astype(bool)
    pos = np.where(rm[:, None, None], np.asarray(coords[0, :L]),
                   np.nan_to_num(prot.atom_positions))
    mask = np.where(rm[:, None], np.asarray(batch.atom_mask[0, :L]), prot.atom_mask)
    return dataclasses.replace(prot, atom_positions=pos, atom_mask=mask)


def build_parser():
    p = argparse.ArgumentParser(description="PackPPI-TPU proximal clash optimization")
    p.add_argument("--input", required=True, help="input PDB with side chains")
    p.add_argument("--outdir", default="packppi_out")
    p.add_argument("--num_steps", type=int, default=50)
    p.add_argument("--platform", default=None, help="jax platform override (cpu/axon)")
    p.add_argument("--lamda", type=float, default=1.0)
    p.add_argument("--violation_tolerance_factor", type=float, default=12.0)
    p.add_argument("--clash_overlap_tolerance", type=float, default=0.5)
    p.add_argument("--molprobity_loc", "--molprobity_clash_loc", default=None,
                   help="molprobity.clashscore binary (reference-compatible alias)")
    p.add_argument("--exact_length", action="store_true")
    return p


def run(args) -> dict:
    from packppi_tpu.utils.platform import configure_platform
    configure_platform(getattr(args, "platform", None))
    import jax

    from packppi_tpu.data import stack_batch
    from packppi_tpu.geometry import atom14_coords_from_torsions
    from packppi_tpu.sampling import proximal_optimize
    from packppi_tpu.structure import from_pdb_file, to_pdb
    from packppi_tpu.structure.featurize import featurize
    from packppi_tpu.utils.analysis import ProteinAnalysis

    outdir = Path(args.outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    analysis = ProteinAnalysis(args.molprobity_loc, tmp_dir=str(outdir / "tmp"))

    prot = from_pdb_file(args.input, mse_to_met=True)
    feats = featurize(prot)
    if feats["SC_D_mask"].sum() == 0:
        raise SystemExit("input structure has no side-chain chi angles to optimize")
    target_len = len(feats["residue_type"]) if args.exact_length else None
    batch = stack_batch([feats], target_len=target_len)

    clash_before = analysis.get_clashscore(args.input)
    print(f"clashscore before: {clash_before}")

    if args.num_steps < 1:
        raise SystemExit("--num_steps must be >= 1")
    t0 = time.perf_counter()
    res = jax.jit(lambda b, sc: proximal_optimize(
        b, sc, args.violation_tolerance_factor, args.clash_overlap_tolerance,
        args.lamda, args.num_steps))(batch, batch.SC_D)
    res.losses.block_until_ready()
    t_opt = time.perf_counter() - t0

    accepted = float(res.losses[-1]) < float(res.losses[0])
    sc_final = res.SC_D if accepted else batch.SC_D
    if not accepted:
        print("objective did not decrease; keeping input conformation")

    coords = jax.jit(lambda b, sc: atom14_coords_from_torsions(
        b.X, b.residue_type, b.BB_D, sc))(batch, sc_final)
    L = len(feats["residue_type"])
    out_prot = _merge_output_structure(prot, feats, batch, coords, L)
    out_pdb = outdir / "structure.pdb"
    out_pdb.write_text(to_pdb(out_prot))

    clash_after = analysis.get_clashscore(str(out_pdb))
    print(f"clashscore after: {clash_after}  ({t_opt:.2f}s, "
          f"objective {float(res.losses[0]):.4f} -> {float(res.losses[-1]):.4f})")

    result = {
        "clashscore_before": clash_before,
        "clashscore_after": clash_after,
        "accepted": accepted,
        "optimize_seconds": t_opt,
        # losses are recorded BEFORE each Adam step (the reference's
        # convention, src/models/components/optimize.py:60-71): _final is
        # the objective entering the last step, not of the returned chis
        "objective_initial": float(res.losses[0]),
        "objective_final": float(res.losses[-1]),
        "objective_convention": "pre-step (reference parity)",
    }
    (outdir / "metrics.json").write_text(json.dumps(result, indent=1))
    return result


def main():
    run(build_parser().parse_args())


if __name__ == "__main__":
    main()
