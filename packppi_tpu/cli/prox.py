"""packppi-prox: standalone proximal clash optimization (PackPPI-Prox).

Equivalent of the reference CLI (reference: src/proximal_optimize.py):
takes any structure WITH side chains, optimizes the chi angles of
clash-heavy residues, writes the relaxed structure, and reports
clashscore before/after.
"""
from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np

from packppi_tpu.cli._directory import merge_output_structure as _merge_output_structure


def build_parser():
    p = argparse.ArgumentParser(description="PackPPI-TPU proximal clash optimization")
    p.add_argument("--input", required=True,
                   help="input PDB with side chains, or a directory of PDBs "
                        "for batched optimization sharded over all devices")
    p.add_argument("--outdir", default="packppi_out")
    p.add_argument("--num_steps", type=int, default=50)
    p.add_argument("--platform", default=None, help="jax platform override (cpu/axon)")
    p.add_argument("--lamda", type=float, default=1.0)
    p.add_argument("--violation_tolerance_factor", type=float, default=12.0)
    p.add_argument("--clash_overlap_tolerance", type=float, default=0.5)
    p.add_argument("--molprobity_loc", "--molprobity_clash_loc", default=None,
                   help="molprobity.clashscore binary (reference-compatible alias)")
    p.add_argument("--exact_length", action="store_true")
    p.add_argument("--batch_size", type=int, default=1,
                   help="directory mode: structures PER DEVICE per dispatch")
    p.add_argument("--n_devices", type=int, default=None,
                   help="directory mode: devices to shard rows over (default all)")
    p.add_argument("--no_clashscore", action="store_true",
                   help="directory mode: skip the per-structure before/after "
                        "clashscores (host path; computed on a thread pool "
                        "overlapped with device work by default)")
    p.add_argument("--no_strict_parity", action="store_true",
                   help="when the optimization is REJECTED (objective did "
                        "not decrease), write the raw input coordinates "
                        "unchanged instead of the reference's re-idealized "
                        "rebuild from the input chis (reference parity: "
                        "src/proximal_optimize.py:50-55 rebuilds either way, "
                        "so a 'rejected' output still differs from the input)")
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
    raw_on_reject = getattr(args, "no_strict_parity", False)
    if not accepted:
        if raw_on_reject:
            print("objective did not decrease; emitting the raw input "
                  "structure unchanged (--no_strict_parity)")
        else:
            # NOTE the written structure is still REBUILT at ideal bond
            # geometry from the input chis (reference parity:
            # src/proximal_optimize.py:50-55 runs get_atom14_coords on
            # batch.SC_D either way), so its clashscore can differ from the
            # raw input's; --no_strict_parity opts out
            print("objective did not decrease; keeping input chi angles "
                  "(coordinates re-idealized, as in the reference)")

    if not accepted and raw_on_reject:
        out_prot = prot  # the parsed input, coordinates untouched
    else:
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


def run_directory(args) -> list:
    """Batched proximal optimization over a directory of structures.

    Length-bucketed chunks of ``batch_size * n_devices`` structures run
    through ONE jitted dispatch each (proximal refinement with the per-row
    accept rule + coordinate rebuild), rows sharded over the ``data`` mesh
    axis. The reference CLI is strictly single-structure
    (src/proximal_optimize.py asserts batch size 1 via optimize.py:27);
    this is the TPU-native scale-out. Host work (PDB writes, before/after
    clashscores) runs on a thread pool overlapped with device execution.
    """
    from packppi_tpu.utils.platform import configure_platform
    configure_platform(getattr(args, "platform", None))
    import jax.numpy as jnp

    from packppi_tpu.cli._directory import (bucket_indices, load_directory,
                                            resolve_n_devices, run_chunks,
                                            sharding_env)
    from packppi_tpu.data import stack_batch
    from packppi_tpu.geometry import atom14_coords_from_torsions
    from packppi_tpu.sampling import proximal_optimize
    from packppi_tpu.structure import to_pdb
    from packppi_tpu.utils.analysis import ProteinAnalysis

    outdir = Path(args.outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    proteins, feats, skipped = load_directory(args.input, require_chis=True)

    n_devices = resolve_n_devices(args)
    per_chunk = max(args.batch_size, 1) * n_devices

    if args.num_steps < 1:
        raise SystemExit("--num_steps must be >= 1")

    def _prox_chunk(b):
        res = proximal_optimize(
            b, b.SC_D, args.violation_tolerance_factor,
            args.clash_overlap_tolerance, args.lamda, args.num_steps)
        accept = res.row_losses[-1] < res.row_losses[0]          # [rows]
        sc = jnp.where(accept[:, None, None], res.SC_D, b.SC_D)
        coords = atom14_coords_from_torsions(b.X, b.residue_type, b.BB_D, sc)
        return coords, b.atom_mask, accept, res.row_losses[0], res.row_losses[-1]

    shard_batch, jit_sharded = sharding_env(n_devices)
    prox_fn = jit_sharded(_prox_chunk, ("batch",),
                          ("batch", "batch", "rep", "rep", "rep"))

    analysis = (None if getattr(args, "no_clashscore", False) else
                ProteinAnalysis(getattr(args, "molprobity_loc", None),
                                tmp_dir=str(outdir / "tmp")))

    from types import SimpleNamespace

    raw_on_reject = getattr(args, "no_strict_parity", False)

    def _write_one(i, coords_row, mask_row, accepted, l0, l1) -> dict:
        path, prot = proteins[i]
        if raw_on_reject and not bool(accepted):
            out_prot = prot  # the parsed input, coordinates untouched
        else:
            L = len(feats[i]["residue_type"])
            out_prot = _merge_output_structure(
                prot, feats[i], SimpleNamespace(atom_mask=mask_row[None]),
                coords_row[None], L)
        out_path = outdir / path.name
        out_path.write_text(to_pdb(out_prot))
        rec = {"input": str(path), "output": str(out_path),
               "accepted": bool(accepted),
               "objective_initial": float(l0), "objective_final": float(l1)}
        if analysis is not None:
            try:
                rec["clashscore_before"] = analysis.get_clashscore(str(path))
                rec["clashscore_after"] = analysis.get_clashscore(str(out_path))
            except Exception as e:  # metric failure must not void the write
                rec["clashscore_error"] = f"{type(e).__name__}: {e}"
        return rec

    def _dispatch(padded, bucket):
        batch = shard_batch(stack_batch([feats[i] for i in padded],
                                        target_len=bucket))
        return tuple(map(np.asarray, prox_fn(batch)))

    def _submit(pool, futures, chunk, out):
        coords, masks, accept, l0, l1 = out
        for row, i in enumerate(chunk):
            futures.append(pool.submit(
                _write_one, i, coords[row], masks[row],
                accept[row], l0[row], l1[row]))

    t0 = time.perf_counter()
    results = run_chunks(bucket_indices(feats), per_chunk, _dispatch, _submit)
    elapsed = time.perf_counter() - t0
    print(f"optimized {len(results)} structures in {elapsed:.2f}s on "
          f"{n_devices} device(s) ({elapsed / max(len(results), 1):.3f}s each)")
    (outdir / "summary.json").write_text(json.dumps(
        {"n": len(results), "seconds": elapsed, "n_devices": n_devices,
         "num_steps": args.num_steps, "skipped": skipped,
         "results": results}, indent=1))
    return results


def main():
    args = build_parser().parse_args()
    if Path(args.input).is_dir():
        run_directory(args)
    else:
        run(args)


if __name__ == "__main__":
    main()
