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


def _latest_bench_pack_s():
    """Amortized per-pack latency from the newest BENCH_r*.json (the driver
    records bench.py output there each round); None if absent."""
    best = None
    for f in sorted(REPO.glob("BENCH_r*.json")):
        try:
            parsed = json.loads(f.read_text()).get("parsed") or {}
            if parsed.get("metric") == "t1124_pack_latency":
                best = float(parsed["value"])
        except (ValueError, KeyError, TypeError):
            continue
    return best
sys.path.insert(0, str(REPO))

# peak dense matmul throughput, FLOP/s
PEAKS = {
    "tpu v5 lite": {"bf16": 394e12, "f32": 98.5e12},  # v5e per chip
}


def _timeit(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--bench_pack_s", type=float, default=None,
                    help="amortized per-pack seconds from the latest bench.py "
                         "run (default: read BENCH_r*.json, newest round)")
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

    # XLA cost analysis counts a lax.scan body ONCE, so the 30-step pack's
    # true FLOPs are static-encode + 30 x per-step eval, counted separately
    static = model.encode_static(params, batch)

    def step_eval(params, batch, sc, t):
        score, _ = model.apply(params, batch, sc, t, deterministic=True,
                               static=static, skip_last_edge_update=True)
        return score.sum()

    def encode_only(params, batch):
        return jax.tree.map(lambda x: x.sum(), model.encode_static(params, batch))

    def train_step(params, key, batch):
        return jax.value_and_grad(lambda p: model.loss(p, key, batch))(params)[0]

    sc0 = jnp.asarray(batch.SC_D)
    t0 = jnp.full((B, L), 0.5)

    out = {}
    for name, fn, fargs in [
        ("network_eval", net_eval, (params, batch, sc0, t0)),
        ("step_eval", step_eval, (params, batch, sc0, t0)),
        ("encode_static", encode_only, (params, batch)),
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

    # corrected whole-pack FLOPs (scan body counted once by XLA)
    out["pack_30steps"]["flops_corrected"] = (
        out["encode_static"]["flops"] + 30 * out["step_eval"]["flops"])

    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "unknown").lower()
    peak = None
    for k, v in PEAKS.items():
        if k in kind:
            peak = v
            break
    out["device_kind"] = kind
    if peak:
        # per-call timings above include the device-tunnel round trip
        # (~25-30 ms on this dev box); the honest on-chip MFU uses the
        # amortized per-pack latency from bench.py (scan of 16 packs)
        for name in ("network_eval", "pack_30steps", "train_step"):
            f = out[name].get("flops_corrected", out[name]["flops"])
            out[name]["mfu_bf16_peak_tunnel_timed"] = round(
                f / out[name]["seconds"] / peak["bf16"], 5)
        bench_pack_s = args.bench_pack_s or _latest_bench_pack_s()
        if bench_pack_s:
            out["pack_30steps"]["bench_pack_s"] = bench_pack_s
            out["pack_30steps"]["mfu_bf16_peak_amortized"] = round(
                out["pack_30steps"]["flops_corrected"] / bench_pack_s / peak["bf16"], 5)
    print(json.dumps(out))
    (REPO / "cache").mkdir(exist_ok=True)
    (REPO / "cache" / "flops_report.json").write_text(json.dumps(out))


if __name__ == "__main__":
    main()
