"""A/B benchmarks for measured-option decisions (PERF.md methodology:
scan-chained repeats inside one executable, transport-floor subtraction,
min-of-5). Two suites:

  python tools/bench_variants.py sampler   # geometry_mode global vs local
  python tools/bench_variants.py train     # f32 vs bf16 training step

Run on the real chip; prints one JSON line per configuration.
"""
from __future__ import annotations

import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _timeit(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def _floor(jax):
    tiny = jax.jit(lambda s: s + 1.0)
    float(tiny(jax.numpy.zeros(())))
    return min(_timeit(lambda: float(tiny(jax.numpy.zeros(())))) for _ in range(5))


def bench_sampler():
    import os

    from packppi_tpu.utils.platform import configure_platform
    configure_platform(os.environ.get("PACKPPI_BENCH_PLATFORM"))  # enables the compile cache too
    import jax

    from packppi_tpu.data import stack_batch
    from packppi_tpu.geometry import atom14_coords_from_torsions
    from packppi_tpu.models import NetworkConfig, SampleConfig, TorsionalDiffusion
    from packppi_tpu.structure import from_pdb_file
    from packppi_tpu.structure.featurize import featurize

    fixture = os.environ.get(
        "PACKPPI_BENCH_FIXTURE",
        str(Path(__file__).parent.parent / "tests/fixtures/t1124.pdb"))
    R = int(os.environ.get("PACKPPI_BENCH_R", "16"))
    feats = featurize(from_pdb_file(fixture, mse_to_met=True))
    batch = stack_batch([feats])
    floor = _floor(jax)

    # the fused Pallas message kernel is TPU-only; on other backends the
    # smoke run compares the unfused variants
    on_tpu = jax.default_backend().startswith(("tpu", "axon"))
    configs = [
        ("global_bf16_fused", NetworkConfig(compute_dtype="bfloat16", fused_messages=True)),
        ("global_bf16_fused_chain", NetworkConfig(compute_dtype="bfloat16",
                                                  fused_messages=True,
                                                  fused_chain=True)),
        ("geom_lanes_bf16_chain", NetworkConfig(compute_dtype="bfloat16",
                                                fused_messages="geom_lanes",
                                                fused_chain=True)),
        ("geom_gather_bf16_chain", NetworkConfig(compute_dtype="bfloat16",
                                                 fused_messages="geom_gather",
                                                 fused_chain=True)),
        ("local_bf16_fused", NetworkConfig(compute_dtype="bfloat16", fused_messages=True,
                                           geometry_mode="local")),
        ("local_bf16_unfused", NetworkConfig(compute_dtype="bfloat16",
                                             geometry_mode="local")),
    ] if on_tpu else [
        ("global_bf16_unfused", NetworkConfig(compute_dtype="bfloat16")),
        ("local_bf16_unfused", NetworkConfig(compute_dtype="bfloat16",
                                             geometry_mode="local")),
    ]
    for label, cfg in configs:
        model = TorsionalDiffusion.create(cfg, SampleConfig())
        params = model.init(jax.random.key(0), batch)

        def pack(params, key, batch):
            sc = model.sample(params, key, batch, n_steps=30)
            coords = atom14_coords_from_torsions(batch.X, batch.residue_type,
                                                 batch.BB_D, sc)
            return coords.sum()

        @jax.jit
        def pack_repeat(params, key, batch, keys):
            def body(acc, k):
                return acc + pack(params, k, batch), None
            out, _ = jax.lax.scan(body, pack(params, key, batch), keys)
            return out

        keys = jax.random.split(jax.random.key(42), R - 1)
        float(pack_repeat(params, jax.random.key(1), batch, keys))  # compile
        total = min(_timeit(lambda: float(
            pack_repeat(params, jax.random.key(k), batch, keys))) for k in range(5))
        print(json.dumps({"config": label,
                          "t1124_pack_s": round(max(total - floor, 1e-9) / R, 5)}))


def bench_train():
    import os

    from packppi_tpu.utils.platform import configure_platform
    configure_platform(os.environ.get("PACKPPI_BENCH_PLATFORM"))  # enables the compile cache too
    import jax
    import optax

    from __graft_entry__ import _synthetic_batch
    from packppi_tpu.models import NetworkConfig, SampleConfig, TorsionalDiffusion
    from packppi_tpu.train.diffusion_task import init_state, make_train_step

    floor = _floor(jax)
    for B, L in [(1, 3072), (4, 1024)]:
        batch = _synthetic_batch(B=B, L=L)
        for dtype in ["float32", "bfloat16"]:
            model = TorsionalDiffusion.create(
                NetworkConfig(compute_dtype=dtype), SampleConfig())
            opt = optax.adamw(1e-4)
            state = init_state(model, jax.random.key(0), batch, opt)
            step = make_train_step(model, opt)

            @jax.jit
            def steps(state, batch, n_dummy):
                def body(s, _):
                    s2, loss = step(s, batch)
                    return s2, loss
                s, losses = jax.lax.scan(body, state, n_dummy)
                return s, losses.sum()

            R = 8
            dummy = jax.numpy.zeros(R)
            s2, _ = steps(state, batch, dummy)  # compile + warm
            jax.block_until_ready(s2.params)
            total = min(_timeit(lambda: float(steps(state, batch, dummy)[1]))
                        for _ in range(3))
            print(json.dumps({"config": f"train_B{B}_L{L}_{dtype}",
                              "step_s": round(max(total - floor, 1e-9) / R, 5)}))


def bench_train_fused():
    """A/B: training step with the differentiable fused message kernel
    (fused_message_diff custom-VJP remat backward) vs the unfused path."""
    import os

    from packppi_tpu.utils.platform import configure_platform
    configure_platform(os.environ.get("PACKPPI_BENCH_PLATFORM"))
    import jax
    import optax

    from __graft_entry__ import _synthetic_batch
    from packppi_tpu.models import NetworkConfig, SampleConfig, TorsionalDiffusion
    from packppi_tpu.train.diffusion_task import init_state, make_train_step

    floor = _floor(jax)
    for B, L in [(1, 3072), (4, 1024)]:
        batch = _synthetic_batch(B=B, L=L)
        for dtype in ["float32", "bfloat16"]:
            for fused in [False, True]:
                model = TorsionalDiffusion.create(
                    NetworkConfig(compute_dtype=dtype, fused_messages=fused,
                                  fused_messages_train=fused),
                    SampleConfig())
                opt = optax.adamw(1e-4)
                state = init_state(model, jax.random.key(0), batch, opt)
                step = make_train_step(model, opt)

                @jax.jit
                def steps(state, batch, n_dummy):
                    def body(s, _):
                        s2, loss = step(s, batch)
                        return s2, loss
                    s, losses = jax.lax.scan(body, state, n_dummy)
                    return s, losses.sum()

                R = 8
                dummy = jax.numpy.zeros(R)
                s2, _ = steps(state, batch, dummy)
                jax.block_until_ready(s2.params)
                total = min(_timeit(lambda: float(steps(state, batch, dummy)[1]))
                            for _ in range(3))
                print(json.dumps({
                    "config": f"train_B{B}_L{L}_{dtype}_fused{int(fused)}",
                    "step_s": round(max(total - floor, 1e-9) / R, 5)}),
                    flush=True)


def bench_train_mg():
    """A/B: training step with the one-hot MXU gather backward
    (NetworkConfig.mxu_gather_grad -> ops.graph.gather_nodes_mg) vs the
    default scatter-add transpose. The r4 profile put 47% of train-step
    device time in gather forwards + scatter-add backwards."""
    import os

    from packppi_tpu.utils.platform import configure_platform
    configure_platform(os.environ.get("PACKPPI_BENCH_PLATFORM"))
    import jax
    import optax

    from __graft_entry__ import _synthetic_batch
    from packppi_tpu.models import NetworkConfig, SampleConfig, TorsionalDiffusion
    from packppi_tpu.train.diffusion_task import init_state, make_train_step

    floor = _floor(jax)
    for B, L in [(4, 1024), (1, 3072)]:
        batch = _synthetic_batch(B=B, L=L)
        for dtype in ["float32"]:
            for mg in [False, True]:
                model = TorsionalDiffusion.create(
                    NetworkConfig(compute_dtype=dtype, mxu_gather_grad=mg),
                    SampleConfig())
                opt = optax.adamw(1e-4)
                state = init_state(model, jax.random.key(0), batch, opt)
                step = make_train_step(model, opt)

                @jax.jit
                def steps(state, batch, n_dummy):
                    def body(s, _):
                        s2, loss = step(s, batch)
                        return s2, loss
                    s, losses = jax.lax.scan(body, state, n_dummy)
                    return s, losses.sum()

                R = 8
                dummy = jax.numpy.zeros(R)
                s2, loss = steps(state, batch, dummy)
                jax.block_until_ready(s2.params)
                total = min(_timeit(lambda: float(steps(state, batch, dummy)[1]))
                            for _ in range(3))
                print(json.dumps({
                    "config": f"train_B{B}_L{L}_{dtype}_mg{int(mg)}",
                    "loss8": round(float(loss), 8),
                    "step_s": round(max(total - floor, 1e-9) / R, 5)}),
                    flush=True)


def bench_train_fc():
    """A/B: training step with the differentiable fused post-message chains
    (NetworkConfig.fused_chain_train -> ops.pallas_layer.fused_chain_diff,
    custom-VJP jnp-replay backward) vs the unfused flax chains. Both sides
    run dropout=0.0 — the only configuration the fused path admits — so the
    comparison is function-identical. Targets the ~10% of train device time
    the r4 profile charged to LayerNorms + message-MLP act/concat fusions."""
    import os

    from packppi_tpu.utils.platform import configure_platform
    configure_platform(os.environ.get("PACKPPI_BENCH_PLATFORM"))
    import jax
    import optax

    from __graft_entry__ import _synthetic_batch
    from packppi_tpu.models import NetworkConfig, SampleConfig, TorsionalDiffusion
    from packppi_tpu.train.diffusion_task import init_state, make_train_step

    floor = _floor(jax)
    for B, L in [(4, 1024), (1, 3072)]:
        batch = _synthetic_batch(B=B, L=L)
        for fc in [False, True]:
            model = TorsionalDiffusion.create(
                NetworkConfig(dropout=0.0, fused_chain_train=fc),
                SampleConfig())
            opt = optax.adamw(1e-4)
            state = init_state(model, jax.random.key(0), batch, opt)
            step = make_train_step(model, opt)

            @jax.jit
            def steps(state, batch, n_dummy):
                def body(s, _):
                    s2, loss = step(s, batch)
                    return s2, loss
                s, losses = jax.lax.scan(body, state, n_dummy)
                return s, losses.sum()

            R = 8
            dummy = jax.numpy.zeros(R)
            s2, loss = steps(state, batch, dummy)
            jax.block_until_ready(s2.params)
            total = min(_timeit(lambda: float(steps(state, batch, dummy)[1]))
                        for _ in range(3))
            print(json.dumps({
                "config": f"train_B{B}_L{L}_f32_fc{int(fc)}",
                "loss8": round(float(loss), 8),
                "step_s": round(max(total - floor, 1e-9) / R, 5)}),
                flush=True)


def bench_train_mg_sweep():
    """Crossover sweep for the mxu_gather_grad auto policy: the one-hot MXU
    gather backward wins when L is small (the contraction's FLOPs scale with
    rows*L while the scatter's traffic scales with rows) and loses at large
    L. Sweeps L at B=1 plus the batched-crop point; the measured boundary
    feeds ops.graph.MXU_GATHER_GRAD_MAX_L (the "auto" gate)."""
    import os

    from packppi_tpu.utils.platform import configure_platform
    configure_platform(os.environ.get("PACKPPI_BENCH_PLATFORM"))
    import jax
    import optax

    from __graft_entry__ import _synthetic_batch
    from packppi_tpu.models import NetworkConfig, SampleConfig, TorsionalDiffusion
    from packppi_tpu.train.diffusion_task import init_state, make_train_step

    floor = _floor(jax)
    for B, L in [(1, 768), (1, 1024), (1, 1536), (1, 2048), (1, 3072),
                 (4, 1024), (4, 1536)]:
        batch = _synthetic_batch(B=B, L=L)
        for mg in [False, True]:
            model = TorsionalDiffusion.create(
                NetworkConfig(mxu_gather_grad=mg), SampleConfig())
            opt = optax.adamw(1e-4)
            state = init_state(model, jax.random.key(0), batch, opt)
            step = make_train_step(model, opt)

            @jax.jit
            def steps(state, batch, n_dummy):
                def body(s, _):
                    s2, loss = step(s, batch)
                    return s2, loss
                s, losses = jax.lax.scan(body, state, n_dummy)
                return s, losses.sum()

            R = 8
            dummy = jax.numpy.zeros(R)
            s2, _ = steps(state, batch, dummy)
            jax.block_until_ready(s2.params)
            total = min(_timeit(lambda: float(steps(state, batch, dummy)[1]))
                        for _ in range(3))
            print(json.dumps({
                "config": f"train_B{B}_L{L}_mg{int(mg)}",
                "step_s": round(max(total - floor, 1e-9) / R, 5)}),
                flush=True)


def bench_esm():
    """ESM-2 embedding extraction on-device: 650M-shaped encoder, random
    weights (identical FLOP/byte profile to converted weights), bf16 MXU
    matmuls. The reference runs this stage as a torch-hub GPU model per
    SKEMPI entry (reference: src/datamodules/components/helper.py:131-169).
    Params are generated ON DEVICE inside one jit — materializing 650M f32
    weights host-side would push 2.6 GB through the dev tunnel."""
    import os

    from packppi_tpu.utils.platform import configure_platform
    configure_platform(os.environ.get("PACKPPI_BENCH_PLATFORM"))
    import jax
    import jax.numpy as jnp

    from packppi_tpu.models.esm2 import ESM2Config, esm2_forward

    cfg = ESM2Config(compute_dtype="bfloat16")          # 650M geometry
    small = os.environ.get("PACKPPI_BENCH_ESM_SMALL")   # CPU smoke mode
    if small:
        cfg = ESM2Config(hidden_size=64, num_layers=2, num_heads=4,
                         intermediate_size=128, compute_dtype="bfloat16")
    nl, hd, it = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    floor = _floor(jax)

    @jax.jit
    def make_params(key):
        ks = iter(jax.random.split(key, 16))
        n = lambda *s: jax.random.normal(next(ks), s, jnp.float32) * 0.02
        return {
            "embedding": n(cfg.vocab_size, hd),
            "final_ln_scale": jnp.ones(hd), "final_ln_bias": jnp.zeros(hd),
            "layers": {
                "wq": n(nl, hd, hd), "bq": n(nl, hd),
                "wk": n(nl, hd, hd), "bk": n(nl, hd),
                "wv": n(nl, hd, hd), "bv": n(nl, hd),
                "wo": n(nl, hd, hd), "bo": n(nl, hd),
                "w1": n(nl, hd, it), "b1": n(nl, it),
                "w2": n(nl, it, hd), "b2": n(nl, hd),
                "ln1_scale": jnp.ones((nl, hd)), "ln1_bias": jnp.zeros((nl, hd)),
                "ln2_scale": jnp.ones((nl, hd)), "ln2_bias": jnp.zeros((nl, hd)),
            },
        }

    params = make_params(jax.random.key(0))
    n_params = sum(int(x.size) for x in jax.tree.leaves(params))

    R = int(os.environ.get("PACKPPI_BENCH_R", "8"))
    for B, T in ((4, 1024), (1, 512), (1, 2048)):
        if small:
            B, T = max(1, B // 2), T // 8
        ids = jax.random.randint(jax.random.key(1), (R, B, T), 4, 31,
                                 dtype=jnp.int32)
        mask = jnp.ones((B, T), jnp.float32)

        for impl in ("dense", "flash"):
            icfg = dataclasses.replace(cfg, attention_impl=impl)

            @jax.jit
            def fwd_repeat(params, ids, mask):
                def body(acc, ids_r):
                    return acc + esm2_forward(params, ids_r, mask,
                                              icfg).sum(), None
                out, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), ids)
                return out

            float(fwd_repeat(params, ids, mask))  # compile + warm
            total = min(_timeit(lambda: float(fwd_repeat(params, ids, mask)))
                        for _ in range(5))
            per_fwd = max(total - floor, 1e-9) / R
            toks = B * T
            # matmul FLOPs/token: qkvo 8h^2 + ffn 16h^2 per layer,
            # + attention QK^T/AV 4Th per layer
            gf_per_tok = (24 * hd * hd + 4 * T * hd) * nl / 1e9
            print(json.dumps({
                "bench": "esm2_forward", "impl": impl, "B": B, "T": T,
                "params_m": round(n_params / 1e6, 1),
                "fwd_s": round(per_fwd, 5),
                "tokens_per_s": round(toks / per_fwd),
                "tflops": round(toks * gf_per_tok / per_fwd / 1e3, 2),
            }), flush=True)


if __name__ == "__main__":
    suite = sys.argv[1] if len(sys.argv) > 1 else "sampler"
    {"sampler": bench_sampler, "train": bench_train,
     "train_fused": bench_train_fused, "train_mg": bench_train_mg,
     "train_fc": bench_train_fc, "train_mg_sweep": bench_train_mg_sweep,
     "esm": bench_esm}[suite]()
