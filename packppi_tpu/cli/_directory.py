"""Shared directory-mode machinery for the packing/proximal CLIs.

Both ``packppi-pack --input dir/`` and ``packppi-prox --input dir/`` run the
same pipeline skeleton: threaded parse+featurize, length-bucketed fixed-shape
chunks of ``batch_size * n_devices`` rows, one jitted dispatch per chunk with
rows sharded over the ``data`` mesh axis, and host work (structure merge, PDB
writes, metric suites) on a thread pool overlapped with the next chunk's
device execution. The reference has no directory mode at all (its CLIs are
single-structure; reference: src/proximal_optimize.py); this is the
TPU-native scale-out, factored here so the two CLIs cannot drift.
"""
from __future__ import annotations

import dataclasses
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np


def merge_output_structure(prot, feats, batch, coords, L):
    """Rebuilt coordinates for modeled residues; residues the model cannot
    represent (incomplete backbone -> residue_mask 0) pass through unchanged
    so the output keeps the input's residue count."""
    rm = feats["residue_mask"].astype(bool)
    pos = np.where(rm[:, None, None], np.asarray(coords[0, :L]),
                   np.nan_to_num(prot.atom_positions))
    mask = np.where(rm[:, None], np.asarray(batch.atom_mask[0, :L]), prot.atom_mask)
    return dataclasses.replace(prot, atom_positions=pos, atom_mask=mask)


def load_directory(input_path, require_chis: bool = False):
    """Parse + featurize every ``*.pdb`` under ``input_path``.

    Returns ``(proteins, feats, skipped)`` where ``proteins`` is a list of
    ``(path, Protein)`` aligned with ``feats``; with ``require_chis``,
    structures without a single side-chain chi are diverted to ``skipped``
    (the proximal objective is undefined for them).
    """
    from packppi_tpu.structure import from_pdb_file
    from packppi_tpu.structure.featurize import featurize

    pdbs = sorted(Path(input_path).glob("*.pdb"))
    if not pdbs:
        raise SystemExit(f"no PDBs in {input_path}")

    # parse is pure-Python (GIL-bound, effectively serial under threads);
    # the pool exists for featurize, whose numpy kernels do release the GIL
    with ThreadPoolExecutor(max_workers=8) as tp:
        parsed = list(tp.map(lambda p: from_pdb_file(p, mse_to_met=True), pdbs))
        all_feats = list(tp.map(featurize, parsed))

    if not require_chis:
        return list(zip(pdbs, parsed)), all_feats, []

    proteins, feats, skipped = [], [], []
    for p, prot, f in zip(pdbs, parsed, all_feats):
        if f["SC_D_mask"].sum() == 0:
            skipped.append(str(p))
            continue
        proteins.append((p, prot))
        feats.append(f)
    if skipped:
        print(f"skipping {len(skipped)} structure(s) without side-chain chis")
    if not feats:
        raise SystemExit("no structure in the directory has side chains")
    return proteins, feats, skipped


def resolve_n_devices(args) -> int:
    import jax

    n = getattr(args, "n_devices", None) or jax.device_count()
    if n < 1:
        # negative/zero would silently poison the chunk arithmetic
        # downstream (negative row budgets -> opaque repeat errors)
        raise SystemExit(f"--n_devices must be >= 1 (got {n})")
    if n > jax.device_count():
        print(f"WARNING: --n_devices {n} > available "
              f"{jax.device_count()}; clamping")
        n = jax.device_count()
    return n


def sharding_env(n_devices: int):
    """``(shard_batch, jit_sharded)`` for a data-mesh dispatch: rows shard
    over 'data', everything else replicates. ``jit_sharded(fn, in_spec,
    out_spec)`` takes tuples of ``"batch"`` / ``"rep"`` per argument/output.
    On one device both are no-ops (plain ``jax.jit``)."""
    import jax

    if n_devices <= 1:
        return (lambda b: b), (lambda fn, in_spec, out_spec: jax.jit(fn))

    from packppi_tpu.parallel import batch_sharding, make_mesh, replicated

    mesh = make_mesh(n_devices, model_parallel=1)
    rep, b_shard = replicated(mesh), batch_sharding(mesh)
    shard_batch = lambda b: jax.device_put(b, jax.tree.map(lambda _: b_shard, b))
    to = lambda spec: tuple(b_shard if s == "batch" else rep for s in spec)

    def jit_sharded(fn, in_spec, out_spec):
        return jax.jit(fn, in_shardings=to(in_spec), out_shardings=to(out_spec))

    return shard_batch, jit_sharded


def bucket_indices(feats) -> dict:
    """Structure indices grouped by padded length bucket."""
    from packppi_tpu.data.batch import bucket_length

    by_bucket: dict[int, list[int]] = {}
    for i, f in enumerate(feats):
        by_bucket.setdefault(bucket_length(len(f["residue_type"])), []).append(i)
    return by_bucket


def run_chunks(by_bucket: dict, per_chunk: int, dispatch, submit_writes,
               max_workers: int = 8) -> list:
    """The shared chunk loop: for each length bucket, take ``per_chunk``
    structures at a time, pad the tail chunk with repeats of its last member
    (fixed shapes -> one executable per bucket), call
    ``dispatch(padded_indices, bucket)`` on device, then hand the results to
    ``submit_writes(pool, futures, chunk_indices, out)`` which enqueues host
    work on the overlapped writer pool. Returns the gathered write records.
    """
    futures = []
    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        for bucket, members in sorted(by_bucket.items()):
            for s in range(0, len(members), per_chunk):
                chunk = members[s:s + per_chunk]
                padded = chunk + [chunk[-1]] * (per_chunk - len(chunk))
                out = dispatch(padded, bucket)
                submit_writes(pool, futures, chunk, out)
        # one bad structure (or a missing metric binary) must not discard
        # the whole run's records after the device work already finished —
        # failures become per-record errors and summary.json still writes
        results = []
        for f in futures:
            try:
                results.append(f.result())
            except Exception as e:  # noqa: BLE001 — recorded, not hidden
                print(f"writer task failed: {type(e).__name__}: {e}")
                results.append({"error": f"{type(e).__name__}: {e}"})
        return results
