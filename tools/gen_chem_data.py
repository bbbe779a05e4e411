"""One-time extractor for chemical literature data.

PackPPI-TPU needs the same literature chemistry (Engh & Huber bond geometry,
AlphaFold2-style rigid-group atom positions, chi-angle definitions) as the
reference implementation so that metrics and coordinates agree bit-for-bit.
These numbers are physical constants from the literature; this script reads
them out of the reference checkout (if present) and re-emits them as a plain
JSON data file consumed by ``packppi_tpu.chem``. It also dumps golden derived
arrays used by the parity tests.

Run manually:  python tools/gen_chem_data.py
(The generated files are committed; the reference checkout is only needed to
regenerate them.)
"""
import json
import sys
from pathlib import Path

import numpy as np

REFERENCE_ROOT = Path("/root/reference")
REPO_ROOT = Path(__file__).resolve().parent.parent


def _load_reference_constants():
    """Import the reference residue_constants without triggering its package
    __init__ (which pulls in pytorch_lightning, absent here)."""
    import importlib.util
    import types

    for name in ("src", "src.utils"):
        mod = types.ModuleType(name)
        mod.__path__ = []
        sys.modules.setdefault(name, mod)

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    load("src.utils.stereo_chemical_props", REFERENCE_ROOT / "src/utils/stereo_chemical_props.py")
    return load("src.utils.residue_constants", REFERENCE_ROOT / "src/utils/residue_constants.py")


def main() -> None:
    rc = _load_reference_constants()  # reference: src/utils/residue_constants.py

    # ---- raw literature tables -> JSON -------------------------------------
    bonds, _, bond_angles = rc.load_stereo_chemical_props()

    data = {
        "restypes": rc.restypes,
        "restype_1to3": rc.restype_1to3,
        "atom37_types": rc.atom_types,
        "atom14_names": rc.restype_name_to_atom14_names,
        "residue_atoms": rc.residue_atoms,
        "van_der_waals_radius": rc.van_der_waals_radius,
        "chi_angles_atoms": rc.chi_angles_atoms,
        "chi_angles_mask": rc.chi_angles_mask,
        "chi_pi_periodic": rc.chi_pi_periodic,
        "chi_pseudo_pi_periodic": rc.chi_pseudo_pi_periodic,
        "renaming_swaps": rc.residue_atom_renaming_swaps,
        "pseudo_renaming_swaps": rc.residue_atom_pseudo_renaming_swaps,
        # rigid-group atom positions: resname -> [[atom, group, x, y, z], ...]
        "rigid_group_atom_positions": {
            res: [[a, int(g), float(p[0]), float(p[1]), float(p[2])] for a, g, p in entries]
            for res, entries in rc.rigid_group_atom_positions.items()
        },
        # bond lengths: resname -> [[a1, a2, length, stddev], ...]
        "bonds": {
            res: [[b.atom1_name, b.atom2_name, float(b.length), float(b.stddev)] for b in bs]
            for res, bs in bonds.items()
        },
        # bond angles (radians): resname -> [[a1, a2, a3, angle, stddev], ...]
        "bond_angles": {
            res: [[a.atom1_name, a.atom2_name, a.atom3name, float(a.angle_rad), float(a.stddev)] for a in angs]
            for res, angs in bond_angles.items()
        },
        # hydrogen-bond chemistry + coarse-grained groupings + alternate
        # compact encodings (reference: src/utils/residue_constants.py:356-401,422-454)
        "hbond_donor_atoms": rc.hbond_donor_atoms,
        "hbond_acceptor_atoms": rc.hbond_acceptor_atoms,
        "cg_atoms": rc.cg_atoms,
        "atom16_types": rc.atom16,
        "atom16_names": rc.restype_name_to_atom16_names,
        "atom7_groups": rc.atom7,
        "atom8_groups": rc.atom8,
    }

    out = REPO_ROOT / "packppi_tpu" / "chem" / "chem_data.json"
    out.write_text(json.dumps(data, indent=1))
    print(f"wrote {out} ({out.stat().st_size} bytes)")

    # ---- golden derived arrays for parity tests ----------------------------
    bounds = rc.make_atom14_dists_bounds(overlap_tolerance=0.5, bond_length_tolerance_factor=12.0)
    golden = {
        "restype_rigid_group_default_frame": rc.restype_rigid_group_default_frame,
        "restype_atom14_to_rigid_group": rc.restype_atom14_to_rigid_group,
        "restype_atom14_mask": rc.restype_atom14_mask,
        "restype_atom14_rigid_group_positions": rc.restype_atom14_rigid_group_positions,
        "chi_atom_indices_atom14": np.asarray(rc.chi_atom_indices_atom14, np.int32),
        "chi_mask_atom14": np.asarray(rc.chi_mask_atom14, np.float32),
        "bounds_lower_05_12": bounds["lower_bound"],
        "bounds_upper_05_12": bounds["upper_bound"],
        "sc_atom14_mask_0": rc.sc_atom14_mask(0),
        "sc_atom14_mask_1": rc.sc_atom14_mask(1),
        "sc_atom14_mask_2": rc.sc_atom14_mask(2),
        "sc_atom14_mask_3": rc.sc_atom14_mask(3),
        "restype_atom_radius_atom14": np.asarray(rc._get_restype_atom_radius_atom14(), np.float32),
    }
    gout = REPO_ROOT / "tests" / "golden" / "chem_golden.npz"
    np.savez_compressed(gout, **golden)
    print(f"wrote {gout} ({gout.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
