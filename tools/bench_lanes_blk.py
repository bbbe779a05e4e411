"""blk sweep for the lane-major geometry kernel (geom_lanes): the AoS
variant was VMEM-forced to blk=64; the lane-major kernel holds fewer
intermediates, so larger message-matmul blocks may fit and win."""
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
    import packppi_tpu.models.ipmp  # noqa: F401  (env var read at call time)

    feats = featurize(from_pdb_file(
        Path(__file__).parent.parent / "tests/fixtures/t1124.pdb",
        mse_to_met=True))
    batch = stack_batch([feats])
    tiny = jax.jit(lambda s: s + 1.0)
    float(tiny(jax.numpy.zeros(())))
    floor = min(_timeit(lambda: float(tiny(jax.numpy.zeros(()))))
                for _ in range(5))

    for blk in [64, 96, 128]:
        os.environ["PACKPPI_GEOM_LANES_BLK"] = str(blk)
        model = TorsionalDiffusion.create(
            NetworkConfig(compute_dtype="bfloat16",
                          fused_messages="geom_lanes", fused_chain=True),
            SampleConfig())
        params = model.init(jax.random.key(0), batch)

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

        R = 16
        keys = jax.random.split(jax.random.key(42), R - 1)
        try:
            float(pack_repeat(params, jax.random.key(1), batch, keys))
            total = min(_timeit(lambda: float(
                pack_repeat(params, jax.random.key(k), batch, keys)))
                for k in range(5))
            print(json.dumps({"blk": blk,
                              "t1124_pack_s": round(max(total - floor, 1e-9) / R, 5)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"blk": blk,
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
