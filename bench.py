"""Headline benchmark: per-complex side-chain packing latency on T1124.

Measures the full PackPPI-MSC inference pipeline on-device: 30 reverse-
diffusion network evaluations (one lax.scan) + torsion->atom14 coordinate
reconstruction, on the T1124 complex (741 residues, 768 bucket) — the reference's own
worked example (reference: README.md:84-97). Also measured every round:
the 50-step proximal clash optimization, the production train step, and
the 8,431-residue single-chip workloads (pack + proximal) the reference
cannot run at all (it documents GPU OOM above ~1500 residues,
reference: README.md:117-119).

``vs_baseline``: the reference publishes no timing, so the baseline is the
MEASURED runtime of the reference's own sampling loop on this same
workload: 47.10 s for the full 30-eval T1124 sampling, torch CPU
(single-core host), measured by tools/bench_reference.py on 2026-08-16
(see BASELINE.md, which also derives a 0.5-3 s A100-class bound from the
17.4 GFLOP/eval count). vs_baseline = measured reference / measured ours;
``baseline_source`` says exactly what the denominator is.

All metrics share one methodology (PERF.md "Benchmark methodology"):
R repeats chained inside ONE jitted lax.scan, scalar fetch, minus the
measured transport floor of a do-nothing dispatch — the device tunnel
makes naive per-call timing unreliable.

Prints one JSON line per metric.
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

    # the Pallas kernels lower on TPU backends only — same gate as the
    # pack/serve CLIs; on other backends the bench still runs (unfused)
    on_tpu = jax.default_backend().startswith(("tpu", "axon"))
    # bf16 message/FFN compute (geometry stays f32) + fused Pallas message
    # kernel: measured 56ms (f32) -> 48ms (bf16) -> 45.5ms (fused) on v5e;
    # fused_chain (single-Pallas-pass residual/LN/FFN chains) measured
    # 29.4 -> 23.1 ms (PERF.md "Fused post-message chains"); geom_lanes
    # (lane-major in-kernel geometry) 23.4 -> 21.8 ms (r5, PERF.md
    # "Lane-major geometry kernel")
    model = TorsionalDiffusion.create(
        NetworkConfig(compute_dtype="bfloat16",
                      fused_messages="geom_lanes" if on_tpu else False,
                      fused_chain=on_tpu), SampleConfig())
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

    # single-chip packing throughput = 1 / B=1 latency. B=1 IS the
    # production configuration: per-complex latency rises with batch on one
    # chip (the step is VMEM-residency-bound, PERF.md "Batching
    # anti-scaling"), so directory mode ships batch_size=1 per device
    # (cli/_directory.py) and scale-out is across the data mesh. The B=8
    # line this replaces measured a known-anti-optimal configuration
    # (14.9/s at r4 vs the real ~42/s ceiling).
    throughput = 1.0 / value

    # training throughput (B=4 x L=1024 crops of T1124) at the PRODUCTION
    # trainer config (NetworkConfig() defaults: f32, unfused — what
    # train/loop.py runs). Same scan-chained + floor-subtracted methodology
    # as the pack metric: r4's Python-loop harness paid per-step dispatch
    # through the tunnel and read 52.25 ms while the A/B harness read
    # ~46.7 ms for the same graph (VERDICT r4 "what's weak" #1).
    from packppi_tpu.train.diffusion_task import (init_state, make_optimizer,
                                                  make_train_step)

    model_t = TorsionalDiffusion.create(NetworkConfig(), SampleConfig())
    batch_t = stack_batch([feats] * 4, target_len=1024)
    optimizer = make_optimizer()
    state = init_state(model_t, jax.random.key(3), batch_t, optimizer)
    tstep = make_train_step(model_t, optimizer)

    @jax.jit
    def train_steps(state, batch, dummy):
        def body(s, _):
            s2, loss = tstep(s, batch)
            return s2, loss
        s, losses = jax.lax.scan(body, state, dummy)
        return s, losses.sum()

    RT = 8
    dummy = jax.numpy.zeros(RT)
    s2, _ = train_steps(state, batch_t, dummy)  # compile + warm
    jax.block_until_ready(s2.params)
    total_t = min(_timeit(lambda: float(train_steps(state, batch_t, dummy)[1]))
                  for _ in range(3))
    train_ms = max(total_t - floor, 1e-9) / RT * 1e3

    # proximal clash optimization (50 Adam steps differentiating through
    # torsions->frames->atom14->clash; Pallas pair kernels on TPU)
    from packppi_tpu.sampling.proximal import proximal_optimize

    prox = jax.jit(lambda b, s: proximal_optimize(b, s).SC_D)
    float(prox(batch, batch.SC_D).sum())  # compile + warm
    t_prox = min(_timeit(lambda: float(prox(batch, batch.SC_D).sum()))
                 for _ in range(3))

    # ---- 8,431-residue single-chip workloads (tools/make_large_fixture) --
    # The flagship long-context capability, regression-guarded every round:
    # 24 chains, 64,805 atoms, 9216 bucket — 5.6x past the reference's
    # documented OOM wall. Linear-memory kNN + AABB-culled clash kernels
    # keep peak memory <0.9 GiB (PERF.md "8k-residue single-chip evidence").
    big_pdb = Path("/tmp/bench_t8431.pdb")
    if not big_pdb.exists():
        from tools.make_large_fixture import main as make_fixture
        make_fixture(str(big_pdb), "11")
    feats8k = featurize(from_pdb_file(big_pdb))
    batch8k = stack_batch([feats8k])

    R8K = 4
    keys8k = jax.random.split(jax.random.key(44), R8K - 1)
    float(pack_repeat(params, jax.random.key(5), batch8k, keys8k))  # compile
    total8k = min(_timeit(lambda: float(
        pack_repeat(params, jax.random.key(k), batch8k, keys8k)))
        for k in range(3))
    t_pack8k = max(total8k - floor, 1e-9) / R8K

    float(prox(batch8k, batch8k.SC_D).sum())  # compile + warm
    t_prox8k = min(_timeit(lambda: float(prox(batch8k, batch8k.SC_D).sum()))
                   for _ in range(2))

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
        "metric": "t1124_pack_throughput_b1",
        "value": round(throughput, 2),
        "unit": "complex/s",
        "vs_baseline": round(throughput * MEASURED_REFERENCE_SECONDS, 2),
        "baseline_source": BASELINE_SOURCE + "; B=1 is the production directory-mode configuration (batching anti-scales on one chip, PERF.md) — replaces r2-r4's B=8 diagnostic line",
    }))
    print(json.dumps({
        "metric": "train_step_b4_l1024",
        "value": round(train_ms, 2),
        "unit": "ms",
        # no reference timing exists for training; report vs our r3-measured
        # 48 ms/step figure (PERF.md) so the driver sees regressions. r4's
        # 52.25 ms reading was harness overhead (per-step tunnel dispatch),
        # not a regression — this harness scan-chains and floor-subtracts
        # like every other metric (VERDICT r4 item 2).
        "vs_baseline": round(48.0 / train_ms, 2),
        "baseline_source": "our r3 measurement: ~48 ms/step at B=4/L=1024 on v5e (PERF.md); the reference publishes no training timings; scan-chained+floor-subtracted harness (r5)",
    }))
    print(json.dumps({
        "metric": "t8431_pack",
        "value": round(t_pack8k, 4),
        "unit": "s",
        # baseline = our r4 one-off measurement (PERF.md); the reference
        # cannot run this workload at all (GPU OOM >1500 residues)
        "vs_baseline": round(0.84 / t_pack8k, 2),
        "baseline_source": "our r4 measurement: 0.84 s (PERF.md 8k-residue evidence); reference OOMs >1500 residues (reference README.md:117-119)",
    }))
    print(json.dumps({
        "metric": "t8431_proximal_50steps",
        "value": round(t_prox8k, 4),
        "unit": "s",
        "vs_baseline": round(1.20 / t_prox8k, 2),
        "baseline_source": "our r4 measurement: 1.20 s with AABB tile culling (PERF.md); reference OOMs >1500 residues (reference README.md:117-119)",
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
