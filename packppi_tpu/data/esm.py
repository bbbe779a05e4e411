"""ESM-2 sequence-embedding pathway for PackPPI-AP's 'esm' mode.

The reference extracts per-residue ESM-2 650M embeddings with chains joined
by 20 ``<pad>`` tokens and optional ``<mask>``-ing (reference:
src/datamodules/components/helper.py:131-169, loaded via torch.hub). Here
extraction runs on the TPU-native JAX ESM-2 (models/esm2.py) — the HF
checkpoint (facebook/esm2_t33_650M_UR50D), when present locally, is
converted once and inference is jit-compiled on-device; a torch backend is
kept for cross-checking. In fully-offline deployments, embeddings are
treated as PRECOMPUTED inputs (``load_precomputed``), which is also how
the esm-mode trainer consumes them.
"""
from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

from packppi_tpu.chem import RESTYPES

ESM_MODEL_NAME = "facebook/esm2_t33_650M_UR50D"
ESM_DIM = 1280
_PAD_RUN = 20


def build_chain_separated_sequence(residue_types: np.ndarray,
                                   chain_indices: np.ndarray,
                                   mask_positions: Optional[np.ndarray] = None) -> str:
    """Sequence string with '<pad>'*20 between chains and '<mask>' at masked
    positions (reference formatting preserved)."""
    parts = []
    uniq = sorted(set(int(c) for c in chain_indices))
    for j, c in enumerate(uniq):
        sel = np.flatnonzero(chain_indices == c)
        for i in sel:
            if mask_positions is not None and mask_positions[i]:
                parts.append("<mask>")
            else:
                idx = int(residue_types[i])
                parts.append(RESTYPES[idx] if idx < len(RESTYPES) else "X")
        if j != len(uniq) - 1:
            parts.append("<pad>" * _PAD_RUN)
    return "".join(parts)


def chain_grouped_order(chain_indices: np.ndarray) -> np.ndarray:
    """Original-residue indices in the order
    :func:`build_chain_separated_sequence` emits them (sorted chain ids,
    original order within each chain). Needed to un-scramble extracted
    embeddings whenever chain_indices is not non-decreasing — featurize
    zeroes the chain id of residues with incomplete backbones
    (structure/featurize.py: ``chain_indices * residue_mask``), so a single
    unresolved residue mid-chain becomes a leading 'chain 0' token and
    every later residue would otherwise receive its neighbor's embedding."""
    ci = np.asarray(chain_indices)
    return np.concatenate([np.flatnonzero(ci == c)
                           for c in sorted(set(int(x) for x in ci))])


def residue_keep_indices(chain_indices: np.ndarray) -> np.ndarray:
    """Token indices (after the cls token is stripped) that correspond to
    residues in the sequence built by :func:`build_chain_separated_sequence`.

    Each ``<pad>``/``<mask>`` is ONE token to the ESM tokenizer, so the
    token stream after cls is: chain-0 residues, 20 pads, chain-1 residues,
    20 pads, ..., last chain, eos. Note the reference instead keeps tokens
    ``[1 : L+1]`` verbatim (reference:
    src/datamodules/components/helper.py:164-166), which for multi-chain
    inputs assigns pad-token embeddings to later-chain residues and drops
    the last chain's tail — a misalignment we deliberately fix (documented
    in PARITY.md "Known deltas")."""
    keep: list[int] = []
    uniq = sorted(set(int(c) for c in chain_indices))
    pos = 0
    for j, c in enumerate(uniq):
        n = int((np.asarray(chain_indices) == c).sum())
        keep.extend(range(pos, pos + n))
        pos += n + (_PAD_RUN if j != len(uniq) - 1 else 0)
    return np.asarray(keep, dtype=np.int64)


_extractor_cache = {}


def get_esm_extractor(model_name: str = ESM_MODEL_NAME, device: str = "cpu",
                      backend: str = "jax"):
    """Lazily construct a local-only ESM-2 extractor; None when the weights
    are not available offline.

    ``backend="jax"`` (default): the HF checkpoint's state dict is converted
    once (models/esm2.convert_hf_esm) and inference runs jit-compiled on the
    default JAX device — on TPU, the 33-layer 650M transformer is a scan of
    bf16-capable MXU matmuls (models/esm2.py), where the reference runs the
    torch model on GPU. ``backend="torch"`` keeps a torch-CPU path for
    cross-checking. Both use the in-repo fixed ESM alphabet tokenizer, so no
    tokenizer download is needed."""
    cache_key = (model_name, backend, device)
    if cache_key in _extractor_cache:
        return _extractor_cache[cache_key]
    try:
        from transformers import EsmModel

        model = EsmModel.from_pretrained(model_name, local_files_only=True).eval()
    except Exception:
        _extractor_cache[cache_key] = None
        return None

    from packppi_tpu.models.esm2 import (ESM2Config, convert_hf_esm,
                                         make_extractor, tokenize)

    if backend == "jax":
        hc = model.config
        cfg = ESM2Config(vocab_size=hc.vocab_size, hidden_size=hc.hidden_size,
                         num_layers=hc.num_hidden_layers,
                         num_heads=hc.num_attention_heads,
                         intermediate_size=hc.intermediate_size,
                         layer_norm_eps=hc.layer_norm_eps,
                         token_dropout=hc.token_dropout,
                         mask_token_id=hc.mask_token_id,
                         pad_token_id=hc.pad_token_id,
                         attention_impl="auto")
        run_tokens = make_extractor(convert_hf_esm(model.state_dict(), cfg), cfg)
        del model
    else:
        model = model.to(device)

        def run_tokens(ids):
            import torch

            t = torch.tensor(ids[None].astype(np.int64), device=device)
            with torch.inference_mode():
                out = model(input_ids=t, attention_mask=torch.ones_like(t))
            return out.last_hidden_state[0].cpu().numpy()

    def extract(residue_types, chain_indices, mask_positions=None):
        seq = build_chain_separated_sequence(residue_types, chain_indices, mask_positions)
        reps = run_tokens(tokenize(seq))[1:-1]  # drop cls/eos
        # keep residue positions only (pads between chains are dropped);
        # reps[keep] rows follow the emitted (chain-grouped) order — map
        # them back so row i is residue i even when chain_indices is not
        # non-decreasing (masked residues become chain 0, see
        # chain_grouped_order)
        keep = residue_keep_indices(chain_indices)
        perm = chain_grouped_order(chain_indices)
        out = np.empty((len(perm), reps.shape[-1]), np.float32)
        out[perm] = reps[keep]
        return out

    _extractor_cache[cache_key] = extract
    return extract


def load_precomputed(path: str, entry_key: str) -> Optional[dict]:
    """Precomputed embeddings from ``<path>/<entry_key>.npz`` — arrays
    keyed 'wt'/'mut' ([L, 1280] each), the format the esm-mode trainer's
    cache writes and ``packppi-ddg --esm_dir`` consumes. (A bare .npy was
    once accepted but can never satisfy the wt+mut contract, so it was a
    dead path.)"""
    npz = Path(path) / f"{entry_key}.npz"
    if npz.exists():
        with np.load(npz) as z:
            return {k: z[k].astype(np.float32) for k in z.files}
    return None
