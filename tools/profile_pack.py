"""Op-level xprof attribution of the 30-step SAMPLER (pack) pipeline.

Reuses profile_train_step's trace parser; profiles R full packs of the
T1124 fixture under any NetworkConfig knobs. The r4 re-profile of this
workload produced the attribution that named the lane-packed
gather+geometry kernel lever (PERF.md "End-of-r4 sampler re-profile");
this tool reproduces that table on demand so every kernel A/B can be
followed by a fresh "what remains" breakdown.

Usage:
    python tools/profile_pack.py --packs 8
    python tools/profile_pack.py --fused_messages geom_lanes --packs 8
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from profile_train_step import parse_trace  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--packs", type=int, default=8)
    p.add_argument("--n_steps", type=int, default=30)
    p.add_argument("--compute_dtype", default="bfloat16")
    p.add_argument("--fused_messages", default="True",
                   help="False | True | geom | geom_lanes")
    p.add_argument("--fused_chain", default="True")
    p.add_argument("--fixture", default=str(REPO / "tests/fixtures/t1124.pdb"))
    p.add_argument("--trace_dir", default="/tmp/pack_trace")
    p.add_argument("--top", type=int, default=40)
    args = p.parse_args()

    from packppi_tpu.utils.platform import enable_compilation_cache
    enable_compilation_cache()
    import jax

    from packppi_tpu.data import stack_batch
    from packppi_tpu.geometry import atom14_coords_from_torsions
    from packppi_tpu.models import NetworkConfig, SampleConfig, TorsionalDiffusion
    from packppi_tpu.structure import from_pdb_file
    from packppi_tpu.structure.featurize import featurize

    fm = {"False": False, "True": True}.get(args.fused_messages,
                                            args.fused_messages)
    fc = args.fused_chain in ("True", "true", "1")
    feats = featurize(from_pdb_file(args.fixture, mse_to_met=True))
    batch = stack_batch([feats])
    model = TorsionalDiffusion.create(
        NetworkConfig(compute_dtype=args.compute_dtype, fused_messages=fm,
                      fused_chain=fc), SampleConfig())
    params = model.init(jax.random.key(0), batch)

    @jax.jit
    def pack(params, key, batch):
        sc = model.sample(params, key, batch, n_steps=args.n_steps)
        coords = atom14_coords_from_torsions(batch.X, batch.residue_type,
                                             batch.BB_D, sc)
        return coords.sum()

    float(pack(params, jax.random.key(1), batch))  # compile + warm
    t0 = time.perf_counter()
    for k in range(args.packs):
        s = pack(params, jax.random.key(k), batch)
    float(s)
    wall = (time.perf_counter() - t0) / args.packs
    print(f"wall per pack (warm, incl. per-call transport): {wall * 1e3:.1f} ms")

    with jax.profiler.trace(args.trace_dir):
        for k in range(args.packs):
            s = pack(params, jax.random.key(k), batch)
        float(s)
    # 'steps' = packs: the tables read as us/pack
    parse_trace(args.trace_dir, args.packs, args.top)


if __name__ == "__main__":
    main()
