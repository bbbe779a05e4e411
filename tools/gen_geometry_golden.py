"""Generate golden outputs for the geometry/featurization parity tests.

Feeds identical inputs (parsed from the public T1124 fixture) to the
*reference* implementation (torch CPU) and records its outputs:
backbone/side-chain dihedrals and the torsions->atom14 coordinate
reconstruction. The tests then assert our jnp/numpy implementations match.

Requires /root/reference to exist; the generated npz is committed.
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


def load_reference_modules():
    for pkg in ("src", "src.utils", "src.models", "src.datamodules",
                "src.datamodules.components"):
        mod = types.ModuleType(pkg)
        mod.__path__ = []
        sys.modules.setdefault(pkg, mod)
    r = REFERENCE_ROOT / "src"
    _load("src.utils.stereo_chemical_props", r / "utils/stereo_chemical_props.py")
    _load("src.utils.residue_constants", r / "utils/residue_constants.py")
    _load("src.utils.rigid_utils", r / "utils/rigid_utils.py")
    features = _load("src.utils.features", r / "utils/features.py")
    components = _load("src.models.components", r / "models/components/__init__.py")
    clash = _load("src.models.components.clash", r / "models/components/clash.py")
    return features, components, clash


def main():
    features, components, clash = load_reference_modules()
    from packppi_tpu.structure import from_pdb_file
    from packppi_tpu.structure.featurize import featurize

    prot = from_pdb_file(REPO_ROOT / "tests/fixtures/t1124.pdb", mse_to_met=True)
    feats = featurize(prot)

    # dihedral goldens must see the raw coordinates (missing atoms = NaN),
    # exactly as the reference dataset transform does before scrubbing
    X_nan = torch.from_numpy(prot.atom_positions).float()
    X = torch.from_numpy(feats["X"]).float()
    S = torch.from_numpy(feats["residue_type"]).long()
    ridx = torch.from_numpy(feats["residue_index"]).long()

    # reference dihedrals on identical inputs
    sys.path.insert(0, str(REFERENCE_ROOT))
    helper = _load("ref_helper_standalone", REFERENCE_ROOT / "src/datamodules/components/helper.py") \
        if False else None
    # helper.py imports interface.py (freesasa) - recreate the two dihedral
    # calls through the reference's own primitives instead:
    rc = sys.modules["src.utils.residue_constants"]

    def ref_calc_dihedrals(p, eps=1e-8):
        def _norm(t):
            return torch.nan_to_num(torch.div(t, torch.norm(t, dim=-1, keepdim=True)))
        uvecs = _norm(p[..., 1:, :] - p[..., :-1, :])
        uvec_2, uvec_1, uvec_0 = uvecs[..., :-2, :], uvecs[..., 1:-1, :], uvecs[..., 2:, :]
        nvec_2 = _norm(torch.cross(uvec_2, uvec_1, dim=-1))
        nvec_1 = _norm(torch.cross(uvec_1, uvec_0, dim=-1))
        cos_d = torch.clamp(torch.sum(nvec_2 * nvec_1, dim=-1), -1 + eps, 1 - eps)
        return torch.sign(torch.sum(uvec_2 * nvec_1, dim=-1)) * torch.acos(cos_d)

    # SC dihedrals exactly as reference helper.calc_sc_dihedrals
    chi_idx = torch.from_numpy(np.array(rc.chi_atom_indices_atom14, dtype=np.int32))[S]
    chi_mask = torch.from_numpy(np.array(rc.chi_mask_atom14, dtype=np.float32))[S]
    chi_pos = torch.gather(X_nan, -2, chi_idx[..., None].expand(*chi_idx.shape, 3).long())
    sc_d = torch.nan_to_num(ref_calc_dihedrals(chi_pos)) * chi_mask
    sc_mask = (sc_d != 0.0).float()

    # reference get_atom14_coords on identical inputs (batched)
    BB_D = torch.from_numpy(feats["BB_D"]).float()[None]
    SC_D = torch.from_numpy(feats["SC_D"]).float()[None]
    coords = components.get_atom14_coords(X[None], S[None], BB_D, SC_D)

    # reference clash losses on the reconstructed coordinates
    class B:  # minimal batch shim for compute_residue_clash
        pass
    atom_mask = torch.from_numpy(feats["atom_mask"]).float()[None]
    info = clash.find_sc_violations(
        atom14_pred_positions=coords,
        atom14_atom_exists=atom_mask,
        residue_type=S[None],
        residue_index=ridx[None],
        violation_tolerance_factor=12.0,
        clash_overlap_tolerance=0.5,
    )
    per_atom_clash = (info["between_residues"]["clashes_per_atom_loss_sum"]
                      + info["within_residues"]["per_atom_loss_sum"])

    np.savez_compressed(
        REPO_ROOT / "tests/golden/geometry_golden.npz",
        sc_d=sc_d.numpy(),
        sc_mask=sc_mask.numpy(),
        atom14_coords=coords[0].numpy(),
        per_atom_clash=per_atom_clash[0].numpy(),
    )
    print("wrote tests/golden/geometry_golden.npz")


if __name__ == "__main__":
    main()


def gen_bb_golden():
    """Golden for backbone dihedrals: replicate the reference's
    calc_bb_dihedrals (reference: src/datamodules/components/helper.py:39-74)
    in torch on identical inputs."""
    import torch.nn.functional as F

    load_reference_modules()
    from packppi_tpu.structure import from_pdb_file
    from packppi_tpu.structure.featurize import featurize

    prot = from_pdb_file(REPO_ROOT / "tests/fixtures/t1124.pdb", mse_to_met=True)
    feats = featurize(prot)
    X = torch.from_numpy(prot.atom_positions).float()
    # the reference computes dihedral adjacency BEFORE residue-mask zeroing,
    # so feed the offset-but-unmasked index (featurize does the same inside)
    from packppi_tpu.structure.featurize import apply_chain_residue_offsets
    import numpy as _np
    chains = _np.asarray(prot.chain_id)
    _, first = _np.unique(chains, return_index=True)
    order = chains[_np.sort(first)]
    cmap = {c: i + 1 for i, c in enumerate(order)}
    cidx = _np.array([cmap[c] for c in chains], _np.int64)
    ridx_raw = apply_chain_residue_offsets(prot.residue_index.astype(_np.int64), cidx)
    residue_index = torch.from_numpy(ridx_raw).long()

    def _norm(t):
        return torch.nan_to_num(torch.div(t, torch.norm(t, dim=-1, keepdim=True)))

    def calc_dihedrals(p, eps=1e-8):
        uvecs = _norm(p[..., 1:, :] - p[..., :-1, :])
        uvec_2, uvec_1, uvec_0 = uvecs[..., :-2, :], uvecs[..., 1:-1, :], uvecs[..., 2:, :]
        nvec_2 = _norm(torch.cross(uvec_2, uvec_1, dim=-1))
        nvec_1 = _norm(torch.cross(uvec_1, uvec_0, dim=-1))
        cos_d = torch.clamp(torch.sum(nvec_2 * nvec_1, dim=-1), -1 + eps, 1 - eps)
        return torch.sign(torch.sum(uvec_2 * nvec_1, dim=-1)) * torch.acos(cos_d)

    bb = X[:, :3].reshape(3 * X.shape[0], 3)
    d = calc_dihedrals(bb)
    d = F.pad(d, [1, 2], value=torch.nan).reshape(X.shape[0], 3)
    mask = torch.ones_like(d)
    pre = torch.cat((torch.tensor([0.0]),
                     (residue_index[1:] - 1 == residue_index[:-1]).float()))
    post = torch.cat(((residue_index[:-1] + 1 == residue_index[1:]).float(),
                      torch.tensor([0.0])))
    mask = torch.stack((pre, post, post), dim=-1)
    # pre-omega reorder + mask overwrite (the reference's quirk)
    d[:, 2] = torch.cat((torch.tensor([torch.nan]), d[:-1, 2]))
    d[:, [0, 1, 2]] = d[:, [2, 0, 1]]
    mask[:, 1] = mask[:, 0]
    mask = mask * torch.isfinite(d).float()

    np.savez_compressed(REPO_ROOT / "tests/golden/bb_dihedrals_golden.npz",
                        bb_d=torch.nan_to_num(d).numpy(), bb_mask=mask.numpy())
    print("wrote bb dihedrals golden")


if __name__ == "__main__" and "--bb" in sys.argv:
    gen_bb_golden()
