"""Convert reference (PyTorch) checkpoints to packppi-tpu flax params.

Maps a reference ``TDiffusionModule`` state_dict (reference:
src/models/TorsionalDiffusion.py:39-68) onto the flax parameter tree of
``ChiScoreNetwork``. Linear weights transpose (torch [out,in] -> flax
kernel [in,out]); LayerNorm weight->scale. Forward-output parity is proven
by tests/test_convert.py against golden activations.

Usage:
    python tools/convert_checkpoint.py --torch_ckpt model.ckpt --out params_dir
(also importable: ``convert_diffusion_state_dict``)
"""
from __future__ import annotations

import argparse

import numpy as np


def _linear(sd, prefix):
    return {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def _layernorm(sd, prefix):
    return {"scale": np.asarray(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def _mlp(sd, prefix, n_layers):
    """Reference MLP (W_in, W_inter*, W_out) -> flax MLP Dense_0..k."""
    out = {"Dense_0": _linear(sd, f"{prefix}.W_in")}
    for i in range(n_layers - 2):
        out[f"Dense_{i + 1}"] = _linear(sd, f"{prefix}.W_inter.{i}")
    out[f"Dense_{n_layers - 1}"] = _linear(sd, f"{prefix}.W_out")
    return out


def _message_mlp(sd, prefix, hidden: int = 128):
    """Reference message MLP (input [h_i | h_E | h_j | geometry]) -> our
    FactoredMessageMLP: the input kernel splits by origin (rows permute so
    Dense_e sees [h_E | geometry]); bias lives on the edge branch."""
    w = np.ascontiguousarray(sd[f"{prefix}.W_in.weight"].T)  # [456, hidden]
    bias = np.asarray(sd[f"{prefix}.W_in.bias"])
    h = hidden
    return {
        "Dense_i": {"kernel": w[:h]},
        "Dense_e": {"kernel": np.concatenate([w[h:2 * h], w[3 * h:]], 0), "bias": bias},
        "Dense_j": {"kernel": w[2 * h:3 * h]},
        "Dense_1": _linear(sd, f"{prefix}.W_inter.0"),
        "Dense_2": _linear(sd, f"{prefix}.W_out"),
    }


def convert_diffusion_state_dict(sd: dict, num_mpnn_layers: int = 3) -> dict:
    """Reference TDiffusionModule state_dict -> {'params': ...} flax tree."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: dict = {}

    params["ProteinEncoder_0"] = {
        "Dense_0": _linear(sd, "encoder.node_embedding"),
        "LayerNorm_0": _layernorm(sd, "encoder.norm_nodes"),
        "Dense_1": _linear(sd, "encoder.edge_embedding"),
        "LayerNorm_1": _layernorm(sd, "encoder.norm_edges"),
    }

    stack = {}
    for i in range(num_mpnn_layers):
        p = f"mpnn.mpnn_layers.{i}"
        stack[f"InvariantPointLayer_{i}"] = {
            "Dense_0": _linear(sd, f"{p}.points_fn_node"),
            "MLP_0": _message_mlp(sd, f"{p}.node_message_fn"),
            "LayerNorm_0": _layernorm(sd, f"{p}.norm.0"),
            "MLP_1": _mlp(sd, f"{p}.node_dense", 2),
            "LayerNorm_1": _layernorm(sd, f"{p}.norm.1"),
            "Dense_1": _linear(sd, f"{p}.points_fn_edge"),
            "MLP_2": _message_mlp(sd, f"{p}.edge_message_fn"),
            "LayerNorm_2": _layernorm(sd, f"{p}.norm.2"),
            "MLP_3": _mlp(sd, f"{p}.edge_dense", 2),
            "LayerNorm_3": _layernorm(sd, f"{p}.norm.3"),
        }
    params["MessagePassingStack_0"] = stack

    params["MLP_0"] = _mlp(sd, "decoder_score.0", 2)
    params["MLP_1"] = _mlp(sd, "decoder_score.2", 2)
    return {"params": params}


def _embedding(sd, prefix):
    return {"embedding": np.asarray(sd[f"{prefix}.weight"])}


def convert_affinity_state_dict(sd: dict, num_mpnn_layers: int = 3) -> dict:
    """Reference AffinityPrediction ('network' mode) state_dict -> flax tree
    for AffinityNet (the frozen 'pret.' backbone converts separately with
    convert_diffusion_state_dict on the pre-checkpoint)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: dict = {}

    params["mutation_encoder"] = {
        "Dense_0": _linear(sd, "mutation_encoder.node_embedding"),
        "LayerNorm_0": _layernorm(sd, "mutation_encoder.norm_nodes"),
        "Dense_1": _linear(sd, "mutation_encoder.edge_embedding"),
        "LayerNorm_1": _layernorm(sd, "mutation_encoder.norm_edges"),
    }

    stack = {}
    for i in range(num_mpnn_layers):
        p = f"mutation_mpnn.mpnn_layers.{i}"
        stack[f"InvariantPointLayer_{i}"] = {
            "Dense_0": _linear(sd, f"{p}.points_fn_node"),
            "MLP_0": _message_mlp(sd, f"{p}.node_message_fn"),
            "LayerNorm_0": _layernorm(sd, f"{p}.norm.0"),
            "MLP_1": _mlp(sd, f"{p}.node_dense", 2),
            "LayerNorm_1": _layernorm(sd, f"{p}.norm.1"),
            "Dense_1": _linear(sd, f"{p}.points_fn_edge"),
            "MLP_2": _message_mlp(sd, f"{p}.edge_message_fn"),
            "LayerNorm_2": _layernorm(sd, f"{p}.norm.2"),
            "MLP_3": _mlp(sd, f"{p}.edge_dense", 2),
            "LayerNorm_3": _layernorm(sd, f"{p}.norm.3"),
        }
    params["mutation_mpnn"] = stack

    params["mut_bias"] = _embedding(sd, "mut_bias")
    params["seq_embedding"] = _embedding(sd, "seq_embedding")
    # mutation_fusion Sequential: [Linear, ReLU, Linear]
    params["Dense_0"] = _linear(sd, "mutation_fusion.0")
    params["Dense_1"] = _linear(sd, "mutation_fusion.2")
    # ddg_predictor Sequential: [Linear, ReLU, Linear, ReLU, Linear]
    params["DdgHead_0"] = {
        "Dense_0": _linear(sd, "ddg_predictor.0"),
        "Dense_1": _linear(sd, "ddg_predictor.2"),
        "Dense_2": _linear(sd, "ddg_predictor.4"),
    }
    return {"params": params}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--torch_ckpt", required=True,
                   help=".ckpt/.pt file with a state_dict (Lightning or plain)")
    p.add_argument("--out", required=True, help="output orbax checkpoint dir")
    p.add_argument("--num_mpnn_layers", type=int, default=3)
    p.add_argument("--model", default="diffusion", choices=["diffusion", "affinity"])
    args = p.parse_args()

    import torch

    blob = torch.load(args.torch_ckpt, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob)
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    if args.model == "affinity":
        params = convert_affinity_state_dict(sd, args.num_mpnn_layers)
    else:
        params = convert_diffusion_state_dict(sd, args.num_mpnn_layers)

    from packppi_tpu.train import save_params
    save_params(args.out, params)
    n_weights = sum(np.asarray(x).size for x in _leaves(params))
    print(f"converted {len(sd)} tensors ({n_weights} weights) -> {args.out}")


def _leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _leaves(v)
        else:
            yield v


if __name__ == "__main__":
    main()
