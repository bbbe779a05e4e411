"""FLOP and MFU accounting for the headline workloads (PERF.md).

Uses XLA's own compiled-executable cost analysis to count the FLOPs of
(a) one denoising network evaluation, (b) the full 30-step pack, and
(c) one diffusion train step on T1124, then divides by measured wall time
to report achieved FLOP/s and MFU against the chip's peak.

Usage: python tools/flops_report.py [--platform cpu] (one JSON line)
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# peak dense matmul throughput, FLOP/s
PEAKS = {
    "tpu v5e": {"bf16": 394e12, "f32": 98.5e12},  # v5e (TPU v5 lite) per chip
}


def _timeit(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    from packppi_tpu.utils.platform import configure_platform, enable_compilation_cache
    configure_platform(args.platform)
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from packppi_tpu.data import stack_batch
    from packppi_tpu.geometry import atom14_coords_from_torsions
    from packppi_tpu.models import NetworkConfig, SampleConfig, TorsionalDiffusion
    from packppi_tpu.structure import from_pdb_file
    from packppi_tpu.structure.featurize import featurize

    feats = featurize(from_pdb_file(REPO / "tests/fixtures/t1124.pdb",
                                    mse_to_met=True))
    batch = stack_batch([feats])
    model = TorsionalDiffusion.create(
        NetworkConfig(compute_dtype="bfloat16", fused_messages=True), SampleConfig())
    params = model.init(jax.random.key(0), batch)

    B, L = batch.residue_mask.shape

    def net_eval(params, batch, sc, t):
        score, _ = model.apply(params, batch, sc, t, deterministic=True)
        return score.sum()

    def pack(params, key, batch):
        sc = model.sample(params, key, batch, n_steps=30)
        return atom14_coords_from_torsions(
            batch.X, batch.residue_type, batch.BB_D, sc).sum()

    def train_step(params, key, batch):
        return jax.value_and_grad(lambda p: model.loss(p, key, batch))(params)[0]

    sc0 = jnp.asarray(batch.SC_D)
    t0 = jnp.full((B, L), 0.5)

    out = {}
    for name, fn, fargs in [
        ("network_eval", net_eval, (params, batch, sc0, t0)),
        ("pack_30steps", pack, (params, jax.random.key(0), batch)),
        ("train_step", train_step, (params, jax.random.key(0), batch)),
    ]:
        jitted = jax.jit(fn)
        compiled = jitted.lower(*fargs).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0))
        float(jnp.asarray(jitted(*fargs)).sum())  # warm
        secs = min(_timeit(lambda: float(jnp.asarray(jitted(*fargs)).sum()))
                   for _ in range(5))
        out[name] = {"flops": flops, "seconds": round(secs, 5),
                     "achieved_flops_per_s": round(flops / secs, 1)}

    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "unknown").lower()
    peak = None
    for k, v in PEAKS.items():
        if k in kind:
            peak = v
            break
    out["device_kind"] = kind
    if peak:
        for name in ("network_eval", "pack_30steps", "train_step"):
            out[name]["mfu_bf16_peak"] = round(
                out[name]["achieved_flops_per_s"] / peak["bf16"], 5)
    print(json.dumps(out))
    (REPO / "cache" / "flops_report.json").write_text(json.dumps(out))


if __name__ == "__main__":
    main()
