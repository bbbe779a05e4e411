"""Interleaved same-process A/B: geom_lanes edge chain FOLDED into the
message kernel vs the separate fused_chain kernel. Cross-run noise on the
tunnel is ~±0.4 ms, so both variants are measured alternately in one
process (shared compile cache, same floor), 3 rounds each."""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from packppi_tpu.utils.platform import configure_platform

configure_platform(os.environ.get("PACKPPI_BENCH_PLATFORM"))
import jax

import packppi_tpu.models.ipmp as ipmp
from packppi_tpu.data import stack_batch
from packppi_tpu.geometry import atom14_coords_from_torsions
from packppi_tpu.models import NetworkConfig, SampleConfig, TorsionalDiffusion
from packppi_tpu.structure import from_pdb_file
from packppi_tpu.structure.featurize import featurize


def _timeit(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main():
    feats = featurize(from_pdb_file(
        Path(__file__).parent.parent / "tests/fixtures/t1124.pdb",
        mse_to_met=True))
    batch = stack_batch([feats])
    tiny = jax.jit(lambda s: s + 1.0)
    float(tiny(jax.numpy.zeros(())))
    floor = min(_timeit(lambda: float(tiny(jax.numpy.zeros(()))))
                for _ in range(5))

    runners = {}
    for name, fold in [("folded", True), ("separate", False)]:
        ipmp.FOLD_EDGE_CHAIN = fold
        model = TorsionalDiffusion.create(
            NetworkConfig(compute_dtype="bfloat16",
                          fused_messages="geom_lanes", fused_chain=True),
            SampleConfig())
        params = model.init(jax.random.key(0), batch)

        def make(model=model, params=params):
            def pack(params, key, batch):
                sc = model.sample(params, key, batch, n_steps=30)
                return atom14_coords_from_torsions(
                    batch.X, batch.residue_type, batch.BB_D, sc).sum()

            @jax.jit
            def pack_repeat(params, key, batch, keys):
                def body(acc, k):
                    return acc + pack(params, k, batch), None
                out, _ = jax.lax.scan(body, pack(params, key, batch), keys)
                return out
            return pack_repeat, params
        runners[name] = make()
        R = 16
        keys = jax.random.split(jax.random.key(42), R - 1)
        float(runners[name][0](runners[name][1], jax.random.key(1), batch,
                               keys))  # compile (traced under this fold)

    R = 16
    keys = jax.random.split(jax.random.key(42), R - 1)
    best = {n: 1e9 for n in runners}
    for rnd in range(3):
        for name, (fn, params) in runners.items():
            for k in range(3):
                best[name] = min(best[name], _timeit(
                    lambda: float(fn(params, jax.random.key(k), batch, keys))))
    for name, t in best.items():
        print(json.dumps({"config": name,
                          "t1124_pack_s": round(max(t - floor, 1e-9) / R, 5)}),
              flush=True)


if __name__ == "__main__":
    main()
