"""Op-level xprof attribution of the diffusion TRAIN step (VERDICT r3 #1).

Same method as the r3 sampler round (PERF.md "Profile-driven round"):
``jax.profiler.trace`` around R jitted steps (works through the device
tunnel), then the trace.json.gz device-track op durations are aggregated
into a per-op-category table. Matches the reference's training hot loop
(reference: src/models/TorsionalDiffusion.py:126-153).

Usage:
    python tools/profile_train_step.py --batch 4 --target_len 1024 --steps 8
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import re
import sys
import time
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def build_step(batch_size: int, target_len: int, compute_dtype: str):
    import jax

    from packppi_tpu.data import stack_batch
    from packppi_tpu.models import NetworkConfig, SampleConfig, TorsionalDiffusion
    from packppi_tpu.structure import from_pdb_file
    from packppi_tpu.structure.featurize import featurize
    from packppi_tpu.train.diffusion_task import (init_state, make_optimizer,
                                                  make_train_step)

    feats = featurize(from_pdb_file(REPO / "tests/fixtures/t1124.pdb",
                                    mse_to_met=True))
    batch = stack_batch([feats] * batch_size, target_len=target_len)
    model = TorsionalDiffusion.create(
        NetworkConfig(compute_dtype=compute_dtype), SampleConfig())
    optimizer = make_optimizer()
    state = init_state(model, jax.random.key(0), batch, optimizer)
    step = jax.jit(make_train_step(model, optimizer), donate_argnums=(0,))
    return step, state, batch


def run_profile(step, state, batch, steps: int, trace_dir: str):
    import jax

    # compile + warm
    state, loss = step(state, batch)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, loss = step(state, batch)
    float(loss)
    wall = (time.perf_counter() - t0) / steps

    with jax.profiler.trace(trace_dir):
        for _ in range(steps):
            state, loss = step(state, batch)
        float(loss)
    return wall


_CATEGORY_RULES = [
    ("matmul/conv (MXU)", re.compile(r"dot|conv|einsum", re.I)),
    ("gather/scatter", re.compile(r"gather|scatter|take|dynamic-slice|dynamic.update", re.I)),
    ("copy/layout", re.compile(r"copy|transpose|bitcast|reshape|pad", re.I)),
    ("reduce", re.compile(r"reduce|sum|cumsum|sort|top-k|topk", re.I)),
    ("custom-call (pallas)", re.compile(r"custom-call|tpu_custom_call", re.I)),
    ("elementwise fusion", re.compile(r"fusion|loop_", re.I)),
]


def categorize(name: str) -> str:
    for cat, rx in _CATEGORY_RULES:
        if rx.search(name):
            return cat
    return "other"


def parse_trace(trace_dir: str, steps: int, top: int = 40):
    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not files:
        raise SystemExit(f"no trace.json.gz under {trace_dir}")
    with gzip.open(sorted(files)[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])

    proc_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {pid for pid, n in proc_names.items() if "/device:" in n}

    # real XLA ops carry args.long_name (+ usually args.source); step
    # envelope events (named "0".."7") and module envelopes don't
    per_op = defaultdict(float)
    per_src = defaultdict(float)
    per_tf = defaultdict(float)
    total = 0.0
    total_bytes = 0.0
    total_flops = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        args = e.get("args") or {}
        if "long_name" not in args:
            continue
        name = e.get("name", "")
        dur = float(e.get("dur", 0.0))
        if dur <= 0:
            continue
        per_op[(name, args.get("source", "?"), args.get("tf_op", "?"))] += dur
        src = args.get("source", "?")
        per_src[src] += dur
        tf = args.get("tf_op", "?")
        # collapse to the first two path segments of the tf op name
        per_tf["/".join(tf.split("/")[:3])] += dur
        total += dur
        total_bytes += float(args.get("raw_bytes_accessed",
                                      args.get("bytes_accessed", 0)) or 0)
        total_flops += float(args.get("model_flops", 0) or 0)

    print(f"\ndevice XLA-op time: {total / 1e3:.2f} ms over {steps} steps "
          f"({total / steps / 1e3:.3f} ms/step)")
    if total_bytes:
        gb_step = total_bytes / steps / 2**30
        bw = total_bytes / (total / 1e6) / 2**30 if total else 0.0
        print(f"bytes accessed: {gb_step:.2f} GiB/step -> sustained "
              f"{bw:.0f} GiB/s over op time (v5e HBM ~819 GB/s peak); "
              f"roofline floor at peak BW = {total_bytes / steps / 819e9 * 1e3:.1f} ms/step")
    if total_flops:
        print(f"model flops: {total_flops / steps / 1e9:.1f} GF/step -> "
              f"{total_flops / (total / 1e6) / 1e12:.1f} TF/s achieved")

    print(f"\nby source line (top {top}):")
    print(f"{'us/step':>9}  {'share':>6}  source")
    for src, dur in sorted(per_src.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{dur / steps:>9.1f}  {dur / total:>6.1%}  {src}")

    print(f"\nby tf_op prefix (top {top}):")
    print(f"{'us/step':>9}  {'share':>6}  op path")
    for tf, dur in sorted(per_tf.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{dur / steps:>9.1f}  {dur / total:>6.1%}  {tf[:110]}")

    print(f"\ntop {top} individual ops:")
    print(f"{'us/step':>9}  {'share':>6}  op | source | tf_op")
    for (name, src, tf), dur in sorted(per_op.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{dur / steps:>9.1f}  {dur / total:>6.1%}  {name} | {src} | {tf[:80]}")
    return per_op, total


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--target_len", type=int, default=1024)
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--compute_dtype", default="float32",
                   help="training default is float32; bfloat16 is the knob")
    p.add_argument("--trace_dir", default="/tmp/train_trace")
    p.add_argument("--top", type=int, default=40)
    args = p.parse_args()

    from packppi_tpu.utils.platform import enable_compilation_cache
    enable_compilation_cache()

    step, state, batch = build_step(args.batch, args.target_len,
                                    args.compute_dtype)
    wall = run_profile(step, state, batch, args.steps, args.trace_dir)
    print(f"wall per step (pre-trace, warm): {wall * 1e3:.2f} ms")
    parse_trace(args.trace_dir, args.steps, args.top)


if __name__ == "__main__":
    main()
