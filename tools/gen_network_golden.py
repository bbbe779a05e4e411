"""Golden forward-activation generator for network-level parity tests.

Builds the reference torch network (encoder + IPMP stack + score decoder,
randomly initialized with a fixed seed), runs it on a real unpadded batch
(1BRS chain D), and saves the state_dict + inputs + outputs. The test
converts the state_dict to flax params and asserts our network reproduces
the reference's outputs — proving both architectural parity and checkpoint
convertibility.
"""
import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import torch

REFERENCE_ROOT = Path("/root/reference")
REPO_ROOT = Path(__file__).resolve().parent.parent


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference():
    for pkg in ("src", "src.utils", "src.models"):
        mod = types.ModuleType(pkg)
        mod.__path__ = []
        sys.modules.setdefault(pkg, mod)
    r = REFERENCE_ROOT / "src"
    _load("src.utils.stereo_chemical_props", r / "utils/stereo_chemical_props.py")
    _load("src.utils.residue_constants", r / "utils/residue_constants.py")
    _load("src.utils.rigid_utils", r / "utils/rigid_utils.py")
    _load("src.utils.features", r / "utils/features.py")
    _load("src.models.components", r / "models/components/__init__.py")
    layers = _load("src.models.components.layers", r / "models/components/layers.py")
    encoder = _load("src.models.components.encoder", r / "models/components/encoder.py")
    mpnn = _load("src.models.components.mpnn", r / "models/components/mpnn.py")
    return layers, encoder, mpnn


def main():
    layers, encoder_mod, mpnn_mod = load_reference()
    from packppi_tpu.data import stack_batch
    from packppi_tpu.structure import from_pdb_file
    from packppi_tpu.structure.featurize import featurize

    feats = featurize(from_pdb_file(REPO_ROOT / "tests/fixtures/1brs.pdb",
                                    chain_id="D", mse_to_met=True))
    batch = stack_batch([feats], target_len=len(feats["residue_type"]))

    torch.manual_seed(7)
    enc = encoder_mod.ProteinEncoder(node_in=35, edge_in=468, node_features=128,
                                     edge_features=128,
                                     time_embedding_type="sinusoidal",
                                     time_embedding_dim=16,
                                     num_positional_embeddings=16, num_rbf=16,
                                     top_k=32, af2_relpos=True)
    mp = mpnn_mod.MpnnNet(node_features=128, edge_features=128, hidden_dim=128,
                          num_mpnn_layers=3, n_points=8, dropout=0.1, act="relu",
                          position_scale=1.0, use_ipmp=True, k_neighbors=32)
    dec1 = layers.MLP(128, 64, 32, 2)
    dec2 = layers.MLP(32, 16, 4, 2)
    for m in (enc, mp, dec1, dec2):
        for p in m.parameters():
            if p.dim() > 1:
                torch.nn.init.xavier_uniform_(p)
        m.eval()

    t = lambda x: torch.from_numpy(np.asarray(x))
    X = t(batch.X).float()
    S = t(batch.residue_type).long()
    sc_noised = t(batch.SC_D).float()
    sc_sincos = torch.stack((torch.sin(sc_noised), torch.cos(sc_noised)), -1)
    sc_sincos = sc_sincos * t(batch.SC_D_mask).float()[..., None]
    tt = torch.full((batch.X.shape[0] * batch.X.shape[1],), 0.37)

    with torch.no_grad():
        h_V, h_E, E_idx, _ = enc(X, S, t(batch.BB_D_sincos).float(), sc_sincos,
                                 t(batch.chain_indices).long(),
                                 t(batch.residue_mask).float(),
                                 t(batch.residue_index).long(), tt.clone())
        h_out = mp(h_V, h_E, E_idx, X, S, t(batch.residue_mask).float())
        score = dec2(torch.relu(dec1(h_out)))

    sd = {}
    for prefix, m in [("encoder", enc), ("mpnn", mp),
                      ("decoder_score.0", dec1), ("decoder_score.2", dec2)]:
        for k, v in m.state_dict().items():
            sd[f"{prefix}.{k}"] = v.numpy()

    np.savez_compressed(
        REPO_ROOT / "tests/golden/network_golden.npz",
        t_value=np.float32(0.37),
        h_V=h_V.numpy(), h_E=h_E.numpy(), E_idx=E_idx.numpy(),
        h_out=h_out.numpy(), score=score.numpy(),
        **{f"sd::{k}": v for k, v in sd.items()},
    )
    print(f"wrote network golden ({len(sd)} tensors)")


if __name__ == "__main__":
    main()
