"""PDB parser edge cases: insertion codes, duplicate residue numbers,
altLoc conformers, waters, MODEL records, MSE conversion — native and
Python paths must agree on every case."""
import os

import numpy as np
import pytest

from packppi_tpu.structure import from_pdb_string


def _atom(serial, name, resname, chain, resseq, x, y=0.0, z=0.0,
          icode=" ", altloc=" ", occ=1.0, bfac=10.0, element=None,
          record="ATOM"):
    element = element or name[0]
    pad_name = name if len(name) == 4 else f" {name}"
    return (f"{record:<6}{serial:>5} {pad_name:<4}{altloc:>1}{resname:>3} "
            f"{chain:>1}{resseq:>4}{icode:>1}   "
            f"{x:>8.3f}{y:>8.3f}{z:>8.3f}{occ:>6.2f}{bfac:>6.2f}"
            f"          {element:>2}  ")


def _gly(serial, chain, resseq, x, **kw):
    lines = []
    for i, name in enumerate(["N", "CA", "C", "O"]):
        lines.append(_atom(serial + i, name, "GLY", chain, resseq, x + i * 0.5, **kw))
    return lines


def _parse_both(text, **kw):
    os.environ["PACKPPI_NATIVE"] = "0"
    try:
        py = from_pdb_string(text, **kw)
    finally:
        os.environ["PACKPPI_NATIVE"] = "1"
    nat = from_pdb_string(text, **kw)
    np.testing.assert_array_equal(py.aaindex, nat.aaindex)
    np.testing.assert_array_equal(py.residue_index, nat.residue_index)
    np.testing.assert_array_equal(py.atom_mask, nat.atom_mask)
    m = py.atom_mask.astype(bool)
    np.testing.assert_allclose(py.atom_positions[m], nat.atom_positions[m], atol=1e-4)
    return py


def test_insertion_codes_offset_numbering():
    lines = _gly(1, "A", 10, 0.0) + _gly(5, "A", 10, 5.0, icode="A") + _gly(9, "A", 11, 10.0)
    prot = _parse_both("\n".join(lines))
    # residue 10A bumps the global offset: 10, 11(+dedup...), 12
    assert len(prot.aaindex) == 3
    assert prot.residue_index.tolist() == [10, 11, 12]


def test_duplicate_residue_numbers_bump():
    # same resseq twice without icode is physically bogus but appears in the
    # wild via chain breaks; the second occurrence bumps to the next free slot
    lines = _gly(1, "A", 5, 0.0) + _gly(5, "B", 5, 5.0) + _gly(9, "B", 5, 9.0, icode="Z")
    prot = _parse_both("\n".join(lines))
    # chain A: 5; chain B: 5, then 5+insertion_offset(1)=6 (free, no bump)
    assert prot.residue_index.tolist() == [5, 5, 6]


def test_altloc_keeps_highest_occupancy():
    lines = _gly(1, "A", 1, 0.0)
    lines.append(_atom(5, "CA", "GLY", "A", 1, 99.0, altloc="B", occ=0.3))
    prot = _parse_both("\n".join(lines))
    assert len(prot.aaindex) == 1
    np.testing.assert_allclose(prot.atom_positions[0, 1, 0], 0.5, atol=1e-3)

    lines2 = _gly(1, "A", 1, 0.0)
    lines2.append(_atom(5, "CA", "GLY", "A", 1, 99.0, altloc="B", occ=0.9))
    # first CA written with occ 1.0 wins; lower the first to 0.5
    lines2[1] = _atom(2, "CA", "GLY", "A", 1, 0.5, altloc="A", occ=0.5)
    prot2 = _parse_both("\n".join(lines2))
    np.testing.assert_allclose(prot2.atom_positions[0, 1, 0], 99.0, atol=1e-3)


def test_waters_and_nonstandard_skipped():
    lines = _gly(1, "A", 1, 0.0)
    lines.append(_atom(5, "O", "HOH", "A", 100, 50.0))
    lines.append(_atom(6, "C1", "LIG", "A", 101, 60.0, element="C"))
    prot = _parse_both("\n".join(lines))
    assert len(prot.aaindex) == 1


def test_model_selection():
    m1 = _gly(1, "A", 1, 0.0)
    m2 = _gly(1, "A", 1, 77.0)
    text = "\n".join(["MODEL     1"] + m1 + ["ENDMDL", "MODEL     2"] + m2 + ["ENDMDL"])
    p0 = _parse_both(text, model_idx=0)
    p1 = _parse_both(text, model_idx=1)
    np.testing.assert_allclose(p0.atom_positions[0, 0, 0], 0.0, atol=1e-3)
    np.testing.assert_allclose(p1.atom_positions[0, 0, 0], 77.0, atol=1e-3)


def test_mse_to_met():
    # MSE is deposited as HETATM in real wwPDB files (the reference's
    # BioPython parser iterates hetero residues; ours must accept the
    # HETATM record type too or MSE silently vanishes)
    lines = []
    for i, (name, el) in enumerate([("N", "N"), ("CA", "C"), ("C", "C"), ("O", "O"), ("CB", "C"), ("CG", "C"), ("SE", "SE")]):
        lines.append(_atom(i + 1, name, "MSE", "A", 1, float(i), element=el,
                           record="HETATM"))
    prot = _parse_both("\n".join(lines), mse_to_met=True)
    from packppi_tpu.chem import RESTYPES
    assert RESTYPES[prot.aaindex[0]] == "M"
    # SE mapped into the SD slot (atom14 index 6 for MET)
    from packppi_tpu.chem import ATOM14_NAMES
    sd_slot = ATOM14_NAMES["MET"].index("SD")
    assert prot.atom_mask[0, sd_slot] == 1.0

    skipped = _parse_both("\n".join(lines), mse_to_met=False)
    assert len(skipped.aaindex) == 0  # MSE is non-standard without conversion


def test_empty_and_garbage_lines():
    text = "\n".join(["REMARK whatever", "", "ATOM  garbage", *_gly(1, "A", 1, 0.0), "END"])
    prot = _parse_both(text)
    assert len(prot.aaindex) == 1


def test_hetatm_ligands_and_waters_still_dropped():
    """Accepting HETATM records must not admit ligands or waters: the
    non-standard and water filters run after record parsing (reference
    order: src/utils/protein.py:100-121)."""
    lines = [
        *_gly(1, "A", 1, 0.0),
        _atom(10, "O", "HOH", "A", 90, 30.0, record="HETATM"),
        _atom(11, "C1", "NAG", "A", 91, 40.0, record="HETATM"),
    ]
    prot = _parse_both("\n".join(lines))
    assert len(prot.aaindex) == 1  # only the glycine survives
