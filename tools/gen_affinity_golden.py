"""Golden generator for affinity-network parity: reference torch modules
(randomly initialized, fixed seed) run the full ddG forward on a real
mutation batch; the test converts the state_dict and asserts our AffinityNet
reproduces the prediction.
"""
import sys
from pathlib import Path

import numpy as np
import torch

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT / "tools"))

from gen_network_golden import load_reference  # noqa: E402


def main():
    layers, encoder_mod, mpnn_mod = load_reference()
    from packppi_tpu.data.skempi import parse_mutation, skempi_features, stack_affinity_batch
    from packppi_tpu.structure import from_pdb_file

    prot = from_pdb_file(REPO_ROOT / "tests/fixtures/1brs.pdb", mse_to_met=True)
    feats = skempi_features(prot, [parse_mutation("KA25A"), parse_mutation("DD35A")], ddg=4.85)
    batch = stack_affinity_batch([feats], target_len=len(feats["residue_type"]))

    torch.manual_seed(11)
    enc = encoder_mod.ProteinEncoder(node_in=35, edge_in=468, node_features=128,
                                     edge_features=128,
                                     time_embedding_type="sinusoidal",
                                     time_embedding_dim=0,
                                     num_positional_embeddings=16, num_rbf=16,
                                     top_k=32, af2_relpos=True)
    mp = mpnn_mod.MpnnNet(node_features=128, edge_features=128, hidden_dim=128,
                          num_mpnn_layers=3, n_points=8, dropout=0.1, act="relu",
                          position_scale=1.0, use_ipmp=True, k_neighbors=32)
    mut_bias = torch.nn.Embedding(2, 128, padding_idx=0)
    seq_embedding = torch.nn.Embedding(21, 128)
    fusion = torch.nn.Sequential(torch.nn.Linear(3 * 128, 128), torch.nn.ReLU(),
                                 torch.nn.Linear(128, 128))
    ddg_head = torch.nn.Sequential(torch.nn.Linear(128, 128), torch.nn.ReLU(),
                                   torch.nn.Linear(128, 128), torch.nn.ReLU(),
                                   torch.nn.Linear(128, 1))
    for m in (enc, mp, fusion, ddg_head):
        m.eval()
    enc.eval()

    t = lambda x: torch.from_numpy(np.asarray(x))
    B, L = batch.residue_mask.shape
    X = t(batch.X).float()
    mut_mask = t(batch.mut_mask).long()

    # mutation-local subgraph (reference: src/models/AffinityPrediction.py:124-145)
    X_ca = X[:, :, 1, :]
    dmat = torch.cdist(X_ca, X_ca)
    local = ((dmat < 10.0) & (mut_mask.unsqueeze(1) > 0)).any(dim=2).float()

    rng = np.random.default_rng(5)
    h_pret_wt = torch.from_numpy(rng.normal(size=(B, L, 128)).astype(np.float32))
    h_pret_mt = torch.from_numpy(rng.normal(size=(B, L, 128)).astype(np.float32))

    def encode(variant, h_pret):
        S = t(getattr(batch, "residue_type" + variant)).long()
        sc_sincos = t(getattr(batch, "SC_D_sincos" + variant)).float()
        sc_mask = t(getattr(batch, "SC_D_mask" + variant)).float()
        with torch.no_grad():
            h_mut, h_E, E_idx, _ = enc(X, S, t(batch.BB_D_sincos).float(),
                                       sc_sincos * sc_mask[..., None],
                                       t(batch.chain_indices).long(), local,
                                       t(batch.residue_index).long(), None)
            h = fusion(torch.cat([h_pret, h_mut, seq_embedding(S)], -1))
            h = h + mut_bias(mut_mask)
            return mp(h, h_E, E_idx, X, S, local)

    with torch.no_grad():
        h_wt = encode("", h_pret_wt)
        h_mt = encode("_mut", h_pret_mt)
        ddg = ddg_head((h_mt - h_wt).max(dim=1)[0]).squeeze(-1)
        ddg_inv = ddg_head((h_wt - h_mt).max(dim=1)[0]).squeeze(-1)

    sd = {}
    for prefix, m in [("mutation_encoder", enc), ("mutation_mpnn", mp),
                      ("mut_bias", mut_bias), ("seq_embedding", seq_embedding),
                      ("mutation_fusion", fusion), ("ddg_predictor", ddg_head)]:
        for k, v in m.state_dict().items():
            sd[f"{prefix}.{k}"] = v.numpy()

    np.savez_compressed(
        REPO_ROOT / "tests/golden/affinity_golden.npz",
        h_pret_wt=h_pret_wt.numpy(), h_pret_mt=h_pret_mt.numpy(),
        local_mask=local.numpy(),
        h_wt=h_wt.numpy(), h_mt=h_mt.numpy(),
        ddg=ddg.numpy(), ddg_inv=ddg_inv.numpy(),
        **{f"sd::{k}": v for k, v in sd.items()},
    )
    print(f"wrote affinity golden ({len(sd)} tensors), ddg={float(ddg[0]):.4f}")


if __name__ == "__main__":
    main()
