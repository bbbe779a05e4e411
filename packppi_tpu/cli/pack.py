"""packppi-pack: side-chain packing inference (PackPPI-MSC).

Equivalent of the reference's eval CLI (reference: src/eval_diffusion.py):
parse a complex, run the 30-step reverse diffusion on device, optionally
refine with the proximal clash optimizer, write the repacked structure, and
report the chi metric suite against the input conformation.
"""
from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np

from packppi_tpu.cli._directory import merge_output_structure as _merge_output_structure


def build_parser():
    p = argparse.ArgumentParser(description="PackPPI-TPU side-chain packing")
    p.add_argument("--input", required=True,
                   help="input PDB, or a directory of PDBs for batched packing")
    p.add_argument("--batch_size", type=int, default=1,
                   help="sampler rows PER DEVICE in directory mode (the "
                        "global batch is batch_size x n_devices). Default 1: "
                        "measured per-complex latency RISES with batch on one "
                        "chip (VMEM-residency-bound step, see PERF.md) — "
                        "scale throughput with devices, not batch")
    p.add_argument("--n_devices", type=int, default=None,
                   help="devices to shard directory-mode batches over "
                        "(default: all; rows shard over a 'data' mesh axis)")
    p.add_argument("--outdir", default="packppi_out", help="output directory")
    p.add_argument("--ckpt", default=None, help="orbax checkpoint with network params")
    p.add_argument("--use_proximal", action="store_true", help="proximal clash refinement")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", default=None, help="jax platform override (cpu/axon)")
    p.add_argument("--n_steps", type=int, default=30, help="reverse-diffusion steps")
    p.add_argument("--corrector_steps", type=int, default=0,
                   help="Langevin corrector sub-steps per denoising iteration "
                        "(extra network evals; 0 = off, matching the reference "
                        "sampler, whose corrector is also implemented but "
                        "unused: reference src/models/components/schedule.py:237)")
    p.add_argument("--n_samples", type=int, default=1,
                   help="sample N conformations in one batched pass and keep "
                        "the least-clashing one (single-PDB mode)")
    p.add_argument("--precision", default="bfloat16", choices=["bfloat16", "float32"],
                   help="network compute dtype (bf16 ~15%% faster, <1%% score deviation)")
    p.add_argument("--no_fused", action="store_true",
                   help="disable the fused Pallas message kernel")
    p.add_argument("--geometry", default="global", choices=["global", "local"],
                   help="point-geometry layout: 'local' caches static "
                        "relative frame transforms and gathers bf16-safe "
                        "local points (see NetworkConfig.geometry_mode)")
    p.add_argument("--molprobity_loc", "--molprobity_clash_loc", default=None,
                   help="molprobity.clashscore binary (reference-compatible alias)")
    p.add_argument("--exact_length", action="store_true",
                   help="skip length bucketing (exact reference-style shapes)")
    p.add_argument("--print_metrics", action="store_true", default=True)
    p.add_argument("--metrics", action="store_true",
                   help="directory mode: compute the per-structure chi/clash "
                        "metric suite on a host thread pool (overlapped with "
                        "device work) and record it in summary.json")
    p.add_argument("--no_strict_parity", action="store_true",
                   help="score metrics WITHOUT the reference's quirks: chi "
                        "accuracy on the periodicity-folded error (boundary-"
                        "invariant, exact matches count) and atom_rmsd as a "
                        "true RMSD (sqrt, masked denominator). Default keeps "
                        "bit-parity with the reference definitions")
    return p


def run(args) -> dict:
    from packppi_tpu.utils.platform import configure_platform
    configure_platform(getattr(args, "platform", None))
    import jax

    from packppi_tpu.data import stack_batch
    from packppi_tpu.geometry import atom14_coords_from_torsions
    from packppi_tpu.models import NetworkConfig, SampleConfig, TorsionalDiffusion
    from packppi_tpu.sampling import proximal_optimize
    from packppi_tpu.structure import from_pdb_file, to_pdb
    from packppi_tpu.structure.featurize import featurize
    from packppi_tpu.train import load_model_params
    from packppi_tpu.utils.analysis import ProteinAnalysis

    outdir = Path(args.outdir)
    outdir.mkdir(parents=True, exist_ok=True)

    prot = from_pdb_file(args.input, mse_to_met=True)
    feats = featurize(prot)
    target_len = len(feats["residue_type"]) if args.exact_length else None
    n_samples = max(1, getattr(args, "n_samples", 1))
    # best-of-N: replicate the protein along the batch axis; one batched
    # sampler pass costs barely more than one sample on the MXU
    batch = stack_batch([feats] * n_samples, target_len=target_len)

    # the fused Pallas kernels are TPU-only; fall back transparently
    # elsewhere. On TPU the default message path is the lane-major
    # in-kernel-geometry kernel (r5: 21.8 vs 23.4 ms T1124 pack, PERF.md
    # "Lane-major geometry kernel"); local geometry mode keeps the
    # standard fused kernel (the geom kernels need global points).
    fused = not args.no_fused and jax.default_backend().startswith(("tpu", "axon"))
    geometry = getattr(args, "geometry", "global")
    fm = (False if not fused
          else (True if geometry == "local" else "geom_lanes"))
    net_cfg = NetworkConfig(compute_dtype=args.precision, fused_messages=fm,
                            fused_chain=fused, geometry_mode=geometry)
    model = TorsionalDiffusion.create(net_cfg, SampleConfig())
    key = jax.random.key(args.seed)
    if args.ckpt:
        template = jax.eval_shape(lambda: model.init(jax.random.key(0), batch))
        params = load_model_params(args.ckpt, template)
    else:
        print("WARNING: no --ckpt given; sampling with randomly initialized weights")
        key, k_init = jax.random.split(key)
        params = model.init(k_init, batch)

    t0 = time.perf_counter()
    _sample = lambda p, k, b: model.sample(
        p, k, b, n_steps=args.n_steps,
        corrector_steps=getattr(args, "corrector_steps", 0))
    n_devices = min(getattr(args, "n_devices", None) or jax.device_count(),
                    jax.device_count())
    if n_devices > 1 and n_samples % n_devices == 0:
        # best-of-N shards over the mesh: each chip samples N/n_devices
        # conformations — multi-chip speedup for SINGLE-complex packing
        from packppi_tpu.parallel import batch_sharding, make_mesh, replicated

        mesh = make_mesh(n_devices, model_parallel=1)
        print(f"sharding {n_samples} samples over {n_devices} devices")
        rep, rows = replicated(mesh), batch_sharding(mesh)
        batch = jax.device_put(batch, jax.tree.map(lambda _: rows, batch))
        params = jax.device_put(params, rep)
        sample_fn = jax.jit(_sample, in_shardings=(rep, rep, rows),
                            out_shardings=rows)
    else:
        sample_fn = jax.jit(_sample)
    coords_fn = jax.jit(lambda b, sc: atom14_coords_from_torsions(
        b.X, b.residue_type, b.BB_D, sc))
    key, k_sample = jax.random.split(key)
    sc_sample = sample_fn(params, k_sample, batch)
    sc_sample.block_until_ready()
    t_sample = time.perf_counter() - t0

    if n_samples > 1:
        from packppi_tpu.ops.clash import compute_residue_clash

        per_sample = jax.jit(lambda b, sc: (
            compute_residue_clash(b, sc) * b.residue_mask).sum(-1))(batch, sc_sample)
        best = int(jax.numpy.argmin(per_sample))
        print(f"best-of-{n_samples}: clash sums {np.round(np.asarray(per_sample), 2)}"
              f" -> keeping sample {best}")
        # host round-trip: the winner row may live on any device of the mesh
        take = lambda x: np.asarray(x)[best:best + 1]
        batch = jax.tree.map(take, batch)
        sc_sample = take(sc_sample)

    t_prox = 0.0
    if args.use_proximal:
        t0 = time.perf_counter()
        res = jax.jit(lambda b, sc: proximal_optimize(
            b, sc, model.sample_cfg.violation_tolerance_factor,
            model.sample_cfg.clash_overlap_tolerance,
            model.sample_cfg.lamda, model.sample_cfg.num_steps))(batch, sc_sample)
        res.losses.block_until_ready()
        t_prox = time.perf_counter() - t0
        if float(res.losses[-1]) < float(res.losses[0]):
            sc_sample = res.SC_D
        else:
            print("proximal refinement did not reduce the objective; keeping the sample")

    coords = coords_fn(batch, sc_sample)
    L = len(feats["residue_type"])
    out_prot = _merge_output_structure(prot, feats, batch, coords, L)
    out_pdb = outdir / "structure.pdb"
    out_pdb.write_text(to_pdb(out_prot))
    print(f"wrote {out_pdb}  (sampling {t_sample:.2f}s"
          + (f", proximal {t_prox:.2f}s" if args.use_proximal else "") + ")")

    analysis = ProteinAnalysis(args.molprobity_loc, tmp_dir=str(outdir / "tmp"))
    if feats["SC_D_mask"].sum() == 0:
        # chi-comparison metrics are undefined without ground-truth side
        # chains; the reference skips the suite too (contains_sidechains
        # guard, src/eval_diffusion.py:43-50,73-77)
        print("no side chain atoms in the input PDB; skipping metric calculation")
        metric = {}
    else:
        metric = analysis.get_metric(
            args.input, str(out_pdb),
            strict_parity=not getattr(args, "no_strict_parity", False)) or {}
    metric["sampling_seconds"] = t_sample
    if args.use_proximal:
        metric["proximal_seconds"] = t_prox
    if args.print_metrics:
        for k, v in metric.items():
            print(f"  {k}: {v}")
    (outdir / "metrics.json").write_text(
        json.dumps({k: (float(v) if isinstance(v, (int, float, np.floating)) else v)
                    for k, v in metric.items()}, indent=1))
    return metric


def run_directory(args) -> list:
    """Batched throughput mode: pack every PDB in a directory, bucketing by
    length so each XLA compilation serves many complexes.

    SPMD over all devices: rows shard over a ``data`` mesh axis, so the same
    run scales 1 chip -> pod slice (the reference distributes training only;
    reference: configs/trainer/ddp.yaml:4-9). ``--n_samples`` packs N noise
    samples per complex in the same row budget and keeps the least-clashing
    one; ``--use_proximal`` refines every winner with the batched proximal
    optimizer (accept rule applied per complex via its own loss trajectory).

    The whole sample -> winner-select -> refine -> coords chain is ONE
    jitted dispatch per chunk (winner selection and the proximal accept rule
    run on device), and all host work — merge, PDB writes, the optional
    ``--metrics`` suite — runs on a thread pool overlapped with the next
    chunk's device execution.
    """
    from packppi_tpu.utils.platform import configure_platform
    configure_platform(getattr(args, "platform", None))
    import jax

    from packppi_tpu.cli._directory import (bucket_indices, load_directory,
                                            resolve_n_devices, run_chunks,
                                            sharding_env)
    from packppi_tpu.data import stack_batch
    from packppi_tpu.geometry import atom14_coords_from_torsions
    from packppi_tpu.models import NetworkConfig, SampleConfig, TorsionalDiffusion
    from packppi_tpu.ops.clash import compute_residue_clash
    from packppi_tpu.sampling import proximal_optimize
    from packppi_tpu.structure import to_pdb
    from packppi_tpu.train import load_model_params

    outdir = Path(args.outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    proteins, feats, _ = load_directory(args.input)

    n_samples = max(1, getattr(args, "n_samples", 1))
    n_devices = resolve_n_devices(args)
    # fixed row budget per executable: batch_size rows per device
    budget = max(args.batch_size, 1) * n_devices
    per_chunk = max(1, budget // n_samples)                      # complexes/step
    rows = -(-per_chunk * n_samples // n_devices) * n_devices    # sampler rows
    rows_b = -(-per_chunk // n_devices) * n_devices              # winner rows

    fused = (not getattr(args, "no_fused", False)
             and jax.default_backend().startswith(("tpu", "axon")))
    geometry = getattr(args, "geometry", "global")
    fm = (False if not fused
          else (True if geometry == "local" else "geom_lanes"))
    net_cfg = NetworkConfig(compute_dtype=getattr(args, "precision", "bfloat16"),
                            fused_messages=fm, fused_chain=fused,
                            geometry_mode=geometry)
    model = TorsionalDiffusion.create(net_cfg, SampleConfig())
    key = jax.random.key(args.seed)
    init_batch = stack_batch(feats[:1])
    if args.ckpt:
        template = jax.eval_shape(lambda: model.init(jax.random.key(0), init_batch))
        params = load_model_params(args.ckpt, template)
    else:
        print("WARNING: no --ckpt given; sampling with randomly initialized weights")
        key, k_init = jax.random.split(key)
        params = model.init(k_init, init_batch)

    import jax.numpy as jnp

    use_proximal = bool(getattr(args, "use_proximal", False))

    def _pack_chunk(p, k, b):
        """One device dispatch per chunk: sample -> per-complex winner
        selection -> optional proximal refinement (per-row accept rule) ->
        atom14 coordinates. No host round-trips between stages (the r3
        rewrite of the sample/host-argmin/restack/refine sequence)."""
        sc = model.sample(p, k, b, n_steps=args.n_steps,
                          corrector_steps=getattr(args, "corrector_steps", 0))
        clash = (compute_residue_clash(b, sc) * b.residue_mask).sum(-1)

        # winner = least-clashing of each complex's n_samples rows; the
        # winner-batch rows are every n_samples-th input row (all of a
        # complex's sample rows share features). Tail rows pad to the fixed
        # rows_b budget with repeats of the last complex (same layout the
        # host-side restack produced).
        cr = clash[: per_chunk * n_samples].reshape(per_chunk, n_samples)
        win = jnp.argmin(cr, axis=1) + jnp.arange(per_chunk) * n_samples
        win = jnp.concatenate([win, jnp.repeat(win[-1:], rows_b - per_chunk, 0)])
        base = jnp.concatenate([
            jnp.arange(per_chunk) * n_samples,
            jnp.full((rows_b - per_chunk,), (per_chunk - 1) * n_samples,
                     dtype=jnp.int32)])
        wb = jax.tree.map(lambda x: jnp.take(x, base, axis=0), b)
        sc_win = jnp.take(sc, win, axis=0)

        if use_proximal:
            res = proximal_optimize(
                wb, sc_win, model.sample_cfg.violation_tolerance_factor,
                model.sample_cfg.clash_overlap_tolerance,
                model.sample_cfg.lamda, model.sample_cfg.num_steps)
            accept = res.row_losses[-1] < res.row_losses[0]          # [rows_b]
            sc_win = jnp.where(accept[:, None, None], res.SC_D, sc_win)

        coords = atom14_coords_from_torsions(wb.X, wb.residue_type, wb.BB_D, sc_win)
        return coords, wb.atom_mask

    # rows shard over 'data'; params/keys replicate; XLA partitions the
    # row-independent sampler with zero collectives on the hot path (the
    # winner-row takes gather across shards once per chunk)
    shard_batch, jit_sharded = sharding_env(n_devices)
    pack_fn = jit_sharded(_pack_chunk, ("rep", "rep", "batch"),
                          ("batch", "batch"))

    # host work (structure merge + PDB write + optional metric suite) runs on
    # a thread pool OVERLAPPED with the next chunk's device dispatch — the
    # device never waits on file I/O or the Python metric path
    from types import SimpleNamespace

    analysis = None
    if getattr(args, "metrics", False):
        from packppi_tpu.utils.analysis import ProteinAnalysis

        analysis = ProteinAnalysis(getattr(args, "molprobity_loc", None),
                                   tmp_dir=str(outdir / "tmp"))

    def _write_one(i: int, coords_row, mask_row) -> dict:
        path, prot = proteins[i]
        L = len(feats[i]["residue_type"])
        out_prot = _merge_output_structure(
            prot, feats[i], SimpleNamespace(atom_mask=mask_row[None]),
            coords_row[None], L)
        out_path = outdir / path.name
        out_path.write_text(to_pdb(out_prot))
        rec = {"input": str(path), "output": str(out_path)}
        if analysis is not None:
            if feats[i]["SC_D_mask"].sum() == 0:
                # chi metrics are undefined without true side chains
                # (reference guard: src/eval_diffusion.py:43-50)
                rec["metrics"] = {"skipped": "no side chains in input"}
            else:
                try:
                    m = analysis.get_metric(
                        str(path), str(out_path),
                        strict_parity=not getattr(args, "no_strict_parity",
                                                  False)) or {}
                    rec["metrics"] = {k: (float(v) if isinstance(v, (int, float, np.floating))
                                          else v) for k, v in m.items()}
                except Exception as e:  # metric failure must not void the write
                    rec["metrics"] = {"error": f"{type(e).__name__}: {e}"}
        return rec

    def _dispatch(padded, bucket):
        nonlocal key
        row_feats = [feats[i] for i in padded for _ in range(n_samples)]
        row_feats += [row_feats[-1]] * (rows - len(row_feats))
        batch = shard_batch(stack_batch(row_feats, target_len=bucket))
        key, k = jax.random.split(key)
        coords, masks = pack_fn(params, k, batch)
        return np.asarray(coords), np.asarray(masks)

    def _submit(pool, futures, chunk, out):
        coords, masks = out
        for row, i in enumerate(chunk):
            futures.append(pool.submit(_write_one, i, coords[row], masks[row]))

    t0 = time.perf_counter()
    results = run_chunks(bucket_indices(feats), per_chunk, _dispatch, _submit)
    elapsed = time.perf_counter() - t0
    print(f"packed {len(results)} complexes in {elapsed:.2f}s on {n_devices} "
          f"device(s) ({elapsed / max(len(results), 1):.3f}s each)")
    (outdir / "summary.json").write_text(json.dumps(
        {"n": len(results), "seconds": elapsed, "n_devices": n_devices,
         "n_samples": n_samples,
         "use_proximal": bool(getattr(args, "use_proximal", False)),
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
