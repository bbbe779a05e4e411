#!/usr/bin/env python
"""Rosetta side-chain repacking baseline (comparison harness).

PackRotamersMover repacking with extended rotamer sampling (-ex1..-ex4),
best-of-N decoys by total REU, parallel over a process pool — the same
baseline protocol as the reference comparison (reference:
scripts/pyrosetta_packer.py). Requires a local PyRosetta install; this
framework only *scores against* the baseline, so the dependency stays
optional.
"""
from __future__ import annotations

import argparse
import multiprocessing as mp
from pathlib import Path


def repack_one(task):
    in_pdb, outdir, n_decoys = task
    try:
        import pyrosetta
        from pyrosetta import rosetta
    except ImportError:
        return (in_pdb, None, "pyrosetta not installed")

    pyrosetta.init("-ex1 -ex2 -ex3 -ex4 -multi_cool_annealer 10 -no_his_his_pairE "
                   "-linmem_ig 10 -mute all", silent=True)
    scorefxn = pyrosetta.get_fa_scorefxn()

    best_pose, best_score = None, float("inf")
    for _ in range(n_decoys):
        pose = pyrosetta.pose_from_pdb(str(in_pdb))
        tf = rosetta.core.pack.task.TaskFactory()
        tf.push_back(rosetta.core.pack.task.operation.InitializeFromCommandline())
        tf.push_back(rosetta.core.pack.task.operation.RestrictToRepacking())
        packer = rosetta.protocols.minimization_packing.PackRotamersMover(scorefxn)
        packer.task_factory(tf)
        packer.apply(pose)
        score = scorefxn(pose)
        if score < best_score:
            best_pose, best_score = pose, score

    out = Path(outdir) / Path(in_pdb).name
    best_pose.dump_pdb(str(out))
    return (in_pdb, best_score, str(out))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input_dir", required=True, help="directory of PDBs to repack")
    p.add_argument("--outdir", default="rosetta_repacked")
    p.add_argument("--n_decoys", type=int, default=3)
    p.add_argument("--workers", type=int, default=4)
    args = p.parse_args()

    Path(args.outdir).mkdir(parents=True, exist_ok=True)
    tasks = [(str(f), args.outdir, args.n_decoys)
             for f in sorted(Path(args.input_dir).glob("*.pdb"))]
    with mp.Pool(args.workers) as pool:
        for in_pdb, score, out in pool.imap_unordered(repack_one, tasks):
            print(f"{in_pdb}: REU={score} -> {out}")


if __name__ == "__main__":
    main()
