"""Measure the reference pipeline's latency on this host (torch CPU).

Replaces the previously ASSUMED 3.0 s A100 baseline with measurements:

1. full ``TDiffusionModule.sampling`` (30 network evals) on T1124 — the same
   workload bench.py times for this framework on one TPU chip;
2. a single network eval (for per-eval extrapolation to GPU-class hardware);
3. the 50-step proximal optimizer.

Reference code runs unmodified via the same stub loader as the pipeline
golden (reference: src/models/TorsionalDiffusion.py:254-280). Results are
recorded in BASELINE.md and cited by bench.py's ``vs_baseline``.

Usage: python tools/bench_reference.py  (prints one JSON line)
"""
from __future__ import annotations

import json
import time
from pathlib import Path

import torch

from gen_pipeline_golden import AttrDict, build_torch_batch, load_reference

REPO_ROOT = Path(__file__).resolve().parent.parent


def main():
    torch.set_num_threads(torch.get_num_threads())  # default = all cores
    td_mod, optimize_mod, _ = load_reference()

    from packppi_tpu.data import stack_batch
    from packppi_tpu.structure import from_pdb_file
    from packppi_tpu.structure.featurize import featurize

    feats = featurize(from_pdb_file(REPO_ROOT / "tests/fixtures/t1124.pdb",
                                    mse_to_met=True))
    L = len(feats["residue_type"])
    batch = stack_batch([feats], target_len=L)
    tb = build_torch_batch(batch)

    torch.manual_seed(0)
    cfg_enc = AttrDict(node_in=35, edge_in=468, node_features=128,
                       edge_features=128, time_embedding_type="sinusoidal",
                       time_embedding_dim=16, num_positional_embeddings=16,
                       num_rbf=16, top_k=32, af2_relpos=True)
    cfg_model = AttrDict(hidden_dim=128, num_mpnn_layers=3, n_points=8,
                         dropout=0.1, act="relu", position_scale=1.0,
                         use_ipmp=True, k_neighbors=32)
    cfg_sample = AttrDict(annealed_temp=3, mode="ode",
                          violation_tolerance_factor=12.0,
                          clash_overlap_tolerance=0.5, lamda=1.0,
                          num_steps=50, eval_epochs=1,
                          sample_during_training=True)
    module = td_mod.TDiffusionModule(optimizer=None, scheduler=None,
                                     encoder_cfg=cfg_enc, model_cfg=cfg_model,
                                     sample_cfg=cfg_sample)
    module.eval()

    # single network eval (warm + min of 5)
    t = torch.full((L,), 0.5)
    sc = tb.SC_D.clone()
    with torch.no_grad():
        module.network(tb, sc, t)
        eval_times = []
        for _ in range(5):
            t0 = time.perf_counter()
            module.network(tb, sc, t)
            eval_times.append(time.perf_counter() - t0)
    per_eval = min(eval_times)

    # full 30-step sampling (warm from above; min of 3)
    samp_times = []
    for k in range(3):
        torch.manual_seed(k)
        t0 = time.perf_counter()
        with torch.no_grad():
            module.sampling(tb, use_proximal=False)
        samp_times.append(time.perf_counter() - t0)
    sampling_s = min(samp_times)

    # proximal refinement (50 Adam steps with autograd through clash)
    torch.manual_seed(0)
    with torch.no_grad():
        sc_sampled = module.sampling(tb, use_proximal=False)
    t0 = time.perf_counter()
    optimize_mod.proximal_optimizer(tb, sc_sampled, 12.0, 0.5, 1.0, 50)
    proximal_s = time.perf_counter() - t0

    out = {
        "host_cpu_threads": torch.get_num_threads(),
        "t1124_residues": L,
        "reference_network_eval_s": round(per_eval, 4),
        "reference_sampling_30steps_s": round(sampling_s, 4),
        "reference_proximal_50steps_s": round(proximal_s, 4),
    }
    print(json.dumps(out))
    (REPO_ROOT / "cache" / "reference_timing.json").write_text(json.dumps(out))


if __name__ == "__main__":
    main()
