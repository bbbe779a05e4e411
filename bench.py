"""Headline benchmark: per-complex side-chain packing latency on T1124.

Measures the full PackPPI-MSC inference pipeline on-device: 30 reverse-
diffusion network evaluations (one lax.scan) + torsion->atom14 coordinate
reconstruction, on the T1124 complex (741 residues, 768 bucket) — the reference's own
worked example (reference: README.md:84-97).

``vs_baseline``: the reference publishes no timing, so the baseline is the
MEASURED runtime of the reference's own sampling loop on this same
workload: 47.10 s for the full 30-eval T1124 sampling, torch CPU
(single-core host), measured by tools/bench_reference.py on 2026-08-16
(see BASELINE.md, which also derives a 0.5-3 s A100-class bound from the
17.4 GFLOP/eval count). vs_baseline = measured reference / measured ours;
``baseline_source`` says exactly what the denominator is.

Prints exactly one JSON line.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))  # repo-root import

# tools/bench_reference.py, T1124 30-step sampling, torch CPU, this host
MEASURED_REFERENCE_SECONDS = 47.10
BASELINE_SOURCE = "measured: reference sampling() on T1124, torch CPU 1-core host (tools/bench_reference.py 2026-08-16); A100-class bound 0.5-3s, see BASELINE.md"


def _timeit(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main() -> None:
    import os

    from packppi_tpu.utils.platform import configure_platform, enable_compilation_cache
    # PACKPPI_PLATFORM=cpu lets the bench run on hosts without the chip
    # (numbers are then NOT the headline TPU figures, just a smoke run)
    configure_platform(os.environ.get("PACKPPI_PLATFORM"))
    enable_compilation_cache()
    import jax

    from packppi_tpu.data import stack_batch
    from packppi_tpu.geometry import atom14_coords_from_torsions
    from packppi_tpu.models import NetworkConfig, SampleConfig, TorsionalDiffusion
    from packppi_tpu.structure import from_pdb_file
    from packppi_tpu.structure.featurize import featurize

    fixture = Path(__file__).parent / "tests/fixtures/t1124.pdb"
    feats = featurize(from_pdb_file(fixture, mse_to_met=True))
    batch = stack_batch([feats])

    # bf16 message/FFN compute (geometry stays f32) + fused Pallas message
    # kernel: measured 56ms (f32) -> 48ms (bf16) -> 45.5ms (fused) on v5e;
    # fused_chain (single-Pallas-pass residual/LN/FFN chains) measured
    # 29.4 -> 23.1 ms (PERF.md "Fused post-message chains")
    model = TorsionalDiffusion.create(
        NetworkConfig(compute_dtype="bfloat16", fused_messages=True,
                      fused_chain=True), SampleConfig())
    params = model.init(jax.random.key(0), batch)

    def pack(params, key, batch):
        sc = model.sample(params, key, batch, n_steps=30)
        coords = atom14_coords_from_torsions(batch.X, batch.residue_type, batch.BB_D, sc)
        return coords.sum()  # scalar fetch: timing sync without bulk transfer

    @jax.jit
    def pack_repeat(params, key, batch, keys):
        # chain R full packs inside one executable so the per-call transport
        # latency (tens of ms through the device tunnel) amortizes away
        def body(acc, k):
            return acc + pack(params, k, batch), None
        out, _ = jax.lax.scan(body, pack(params, key, batch), keys)
        return out

    R = 16
    keys = jax.random.split(jax.random.key(42), R - 1)
    float(pack_repeat(params, jax.random.key(1), batch, keys))  # compile + warm

    # transport-latency floor of a do-nothing round trip
    tiny = jax.jit(lambda s: s + 1.0)
    float(tiny(jax.numpy.zeros(())))
    floor = min(_timeit(lambda: float(tiny(jax.numpy.zeros(())))) for _ in range(5))

    total = min(_timeit(lambda: float(pack_repeat(params, jax.random.key(k), batch, keys)))
                for k in range(5))
    value = max(total - floor, 1e-9) / R  # seconds per full 30-step pack

    # batched throughput at B=8 — a DIAGNOSTIC, not the optimum: measured
    # per-complex latency rises with batch on one chip (the step is
    # VMEM-residency-bound; see PERF.md "Batching anti-scaling"), so the
    # single-chip throughput ceiling is the B=1 line above and scale-out is
    # across devices (directory mode's data mesh), not across batch
    B = 8
    batch8 = stack_batch([feats] * B)
    R8 = 4
    keys8 = jax.random.split(jax.random.key(43), R8 - 1)
    float(pack_repeat(params, jax.random.key(2), batch8, keys8))  # compile + warm
    total8 = min(_timeit(lambda: float(pack_repeat(params, jax.random.key(k), batch8, keys8)))
                 for k in range(3))
    throughput = B * R8 / max(total8 - floor, 1e-9)

    # training throughput (B=4 x L=1024 crops of T1124): R jitted train
    # steps chained through lax.scan-style python loop on donated state —
    # the per-step wall includes optimizer + nonfinite-guard, exactly the
    # production hot loop (train/diffusion_task.make_train_step)
    from packppi_tpu.train.diffusion_task import (init_state, make_optimizer,
                                                  make_train_step)

    batch_t = stack_batch([feats] * 4, target_len=1024)
    optimizer = make_optimizer()
    state = init_state(model, jax.random.key(3), batch_t, optimizer)
    tstep = jax.jit(make_train_step(model, optimizer), donate_argnums=(0,))
    state, l0 = tstep(state, batch_t)
    float(l0)  # compile + warm
    RT = 8
    t0 = time.perf_counter()
    for _ in range(RT):
        state, l0 = tstep(state, batch_t)
    float(l0)
    train_ms = (time.perf_counter() - t0) / RT * 1e3

    # proximal clash optimization (50 Adam steps differentiating through
    # torsions->frames->atom14->clash; Pallas pair kernels on TPU)
    from packppi_tpu.sampling.proximal import proximal_optimize

    prox = jax.jit(lambda b, s: proximal_optimize(b, s).SC_D)
    float(prox(batch, batch.SC_D).sum())  # compile + warm
    t_prox = min(_timeit(lambda: float(prox(batch, batch.SC_D).sum()))
                 for _ in range(3))

    print(json.dumps({
        "metric": "t1124_proximal_50steps",
        "value": round(t_prox, 4),
        "unit": "s",
        # the reference's proximal_optimize.py on this host's CPU: 1701 s
        # (tools/bench_reference.py r2); no GPU figure is published
        "vs_baseline": round(1701.0 / t_prox, 1),
        "baseline_source": "measured: reference proximal_optimize on T1124, torch CPU 1-core host (1701 s); reference publishes no GPU timing and OOMs >1500 residues",
    }))
    print(json.dumps({
        "metric": "t1124_pack_throughput_b8",
        "value": round(throughput, 2),
        "unit": "complex/s",
        "vs_baseline": round(throughput * MEASURED_REFERENCE_SECONDS, 2),
        "baseline_source": BASELINE_SOURCE,
    }))
    print(json.dumps({
        "metric": "train_step_b4_l1024",
        "value": round(train_ms, 2),
        "unit": "ms",
        # no reference timing exists for training; report vs our r3-measured
        # 48 ms/step figure (PERF.md) so the driver sees regressions
        "vs_baseline": round(48.0 / train_ms, 2),
        "baseline_source": "our r3 measurement: ~48 ms/step at B=4/L=1024 on v5e (PERF.md); the reference publishes no training timings",
    }))
    # headline ratio is vs the CONSERVATIVE A100-class bound (0.5 s, the
    # fast end of BASELINE.md's 0.5-3 s derivation), not the 1-core torch
    # CPU measurement — the honest comparison per VERDICT r3; the measured
    # CPU ratio ships alongside in its own field
    print(json.dumps({
        "metric": "t1124_pack_latency",
        "value": round(value, 4),
        "unit": "s",
        "vs_baseline": round(0.5 / value, 2),
        "vs_measured_cpu_reference": round(MEASURED_REFERENCE_SECONDS / value, 2),
        "baseline_source": "A100-class bound, fast end (0.5 s of 0.5-3 s, BASELINE.md); measured torch-CPU reference 47.10 s also reported (vs_measured_cpu_reference)",
    }))


if __name__ == "__main__":
    main()
