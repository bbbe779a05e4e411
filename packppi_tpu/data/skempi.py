"""SKEMPI-v2 mutation data layer for PackPPI-AP.

Entry loading, ddG computation (RT ln K at 298.15 K), mutation application
with wild-type consistency validation, complex-grouped k-fold CV splitting,
and the wild+mutant twin feature schema — semantics matching the reference
(reference: src/datamodules/skempi_datamodule.py:51-138,
src/datamodules/components/skempi_dataset.py:72-262), including quirks kept
for parity: the mutant chi mask is measured on the wild-type coordinates
with mutant atom indexing, and mutant chis are zeroed.
"""
from __future__ import annotations

import math
import random
from pathlib import Path
from typing import NamedTuple, Optional

import numpy as np

from packppi_tpu.chem import ATOM14_NAMES, CHEM, RESTYPE_1TO3, RESTYPES
from packppi_tpu.data.batch import ProteinBatch, bucket_length, pad_features
from packppi_tpu.structure.featurize import featurize, sc_dihedrals
from packppi_tpu.structure.protein import Protein
from packppi_tpu.utils.logging import get_logger

log = get_logger(__name__)

RT_KCAL = (8.314 / 4184) * (273.15 + 25.0)


def parse_mutation(name: str) -> dict:
    """'KI15G' -> wild type K, chain I, residue 15, mutant G."""
    return {
        "wt": name[0],
        "chain": name[1],
        "resseq": int(name[2:-1]),
        "mt": name[-1],
        "icode": " ",
        "name": name,
    }


def load_skempi_entries(data_dir: str, pdb_dirname: str,
                        meta_filename: str = "skempi_v2.csv",
                        block_list: Optional[list] = None) -> list[dict]:
    """Parse skempi_v2.csv (';'-separated) into per-mutation entries with
    ddG in kcal/mol; rows with missing affinities or PDBs are skipped."""
    import pandas as pd

    block_list = block_list or []
    df = pd.read_csv(Path(data_dir) / meta_filename, sep=";")
    dg_wt = RT_KCAL * np.log(df["Affinity_wt_parsed"])
    dg_mut = RT_KCAL * np.log(df["Affinity_mut_parsed"])
    ddg = dg_mut - dg_wt

    entries = []
    for i, row in df.iterrows():
        pdbcode, group1, group2 = row["#Pdb"].split("_")
        if pdbcode in block_list or not np.isfinite(ddg[i]):
            continue
        muts = [parse_mutation(m) for m in row["Mutation(s)_cleaned"].split(",")]
        ligand, receptor = (group1, group2) if muts[0]["chain"] in group1 else (group2, group1)
        pdb_path = Path(data_dir) / pdb_dirname / f"{pdbcode.upper()}.pdb"
        if not pdb_path.exists():
            continue
        entries.append({
            "id": int(i),
            "complex": row["#Pdb"],
            "mutstr": row["Mutation(s)_cleaned"],
            "num_muts": len(muts),
            "pdb_id": pdbcode,
            "group_ligand": list(ligand),
            "group_receptor": list(receptor),
            "mutations": muts,
            "ddG": float(ddg[i]),
            "pdb_path": str(pdb_path),
        })
    return entries


def cv_split(entries: list[dict], num_folds: int = 3, fold_index: int = 0,
             seed: int = 42) -> dict[str, list[dict]]:
    """Complex-grouped cross-validation split (no complex spans folds)."""
    by_complex: dict[str, list[dict]] = {}
    for e in entries:
        by_complex.setdefault(e["complex"], []).append(e)
    # sorted-then-seeded-shuffle reproduces the reference's fold membership
    # exactly: it also sorts complex keys before random.Random(seed).shuffle
    # (reference: src/datamodules/skempi_datamodule.py:111-112)
    names = sorted(by_complex)
    random.Random(seed).shuffle(names)
    fold_size = math.ceil(len(names) / num_folds)
    folds = [names[k * fold_size:(k + 1) * fold_size] for k in range(num_folds)]
    val_names = folds.pop(fold_index)
    train_names = [n for f in folds for n in f]
    return {
        "train": [e for n in train_names for e in by_complex[n]],
        "valid": [e for n in val_names for e in by_complex[n]],
    }


def apply_mutations(protein: Protein, mutations: list[dict], strict: bool = True):
    """Mutant residue types + atom masks on the wild-type structure.

    Raises ValueError when the structure's residue disagrees with the
    mutation's declared wild type (hard data-integrity check).
    """
    residue_type_mut = protein.aaindex.copy()
    atom_mask_mut = protein.atom_mask.copy()
    chains = np.asarray(protein.chain_id)

    for mut in mutations:
        if mut["chain"] not in chains or mut["mt"] not in RESTYPES:
            log.warning(f"ignoring mutation {mut['name']}: chain or type not applicable")
            continue
        # NOTE matching runs against the parser's insertion-OFFSET numbering
        # (reference parity: both protein.py readers bump resseq past icode
        # residues, and the reference matches the same shifted index —
        # src/datamodules/components/skempi_dataset.py:130; its no-match
        # failure mode is an opaque list-index crash). A silent drop here
        # would keep the entry's nonzero ddG with an all-zero mut_mask —
        # corrupted training data — so strict mode raises instead.
        sel = (chains == mut["chain"]) & (protein.residue_index == mut["resseq"])
        if not sel.any():
            msg = (f"mutation {mut['name']}: residue not found (chain "
                   f"{mut['chain']} resseq {mut['resseq']} after insertion-"
                   f"code offsets)")
            if strict:
                raise ValueError(msg)
            log.warning(f"ignoring {msg}")
            continue
        wt_found = RESTYPES[int(protein.aaindex[sel][0])]
        if wt_found != mut["wt"]:
            msg = (f"mutation {mut['name']} inconsistent with structure "
                   f"wild-type {wt_found}")
            if strict:
                raise ValueError(msg)
            log.warning(msg)
            continue
        mt_idx = RESTYPES.index(mut["mt"])
        residue_type_mut[sel] = mt_idx
        names = ATOM14_NAMES[RESTYPE_1TO3[mut["mt"]]]
        atom_mask_mut[sel] = np.array([1.0 if a else 0.0 for a in names], np.float32)

    return residue_type_mut, atom_mask_mut


def skempi_features(protein: Protein, mutations: list[dict], ddg: float = 0.0,
                    strict: bool = True) -> dict[str, np.ndarray]:
    """Wild-type features + mutant twins + mut_mask + ddg."""
    feats = featurize(protein)
    residue_type_mut, atom_mask_mut = apply_mutations(protein, mutations, strict)

    rm = feats["residue_mask"]
    mut_mask = (protein.aaindex != residue_type_mut).astype(np.int64) * rm.astype(np.int64)

    # mutant chis: zeroed at mutation sites; the mask is measured on WT
    # coordinates with mutant atom indexing (reference quirk preserved)
    sc_d_mut = feats["SC_D"].copy()
    sc_sincos_mut = feats["SC_D_sincos"].copy()
    sel = mut_mask.astype(bool)
    sc_d_mut[sel] = 0.0
    sc_sincos_mut[sel] = 0.0
    _, sc_mask_mut = sc_dihedrals(protein.atom_positions, residue_type_mut)
    sc_mask_mut = sc_mask_mut * rm[:, None]

    pi_mut = CHEM.chi_pi_periodic[residue_type_mut].astype(bool)

    feats.update({
        "ddg": np.float32(ddg),
        "mut_mask": mut_mask,
        "residue_type_mut": (residue_type_mut * rm).astype(np.int64),
        "atom_mask_mut": np.nan_to_num(atom_mask_mut * rm[:, None]).astype(np.float32),
        "SC_D_mut": np.nan_to_num(sc_d_mut),
        "SC_D_sincos_mut": np.nan_to_num(sc_sincos_mut),
        "SC_D_mask_mut": sc_mask_mut,
        "chi_1pi_periodic_mask_mut": sc_mask_mut.astype(bool) & pi_mut,
        "chi_2pi_periodic_mask_mut": sc_mask_mut.astype(bool) & ~pi_mut,
    })
    return feats


class AffinityBatch(NamedTuple):
    """ProteinBatch fields + mutant twins + labels."""

    # common / wild-type (same layout as ProteinBatch)
    X: np.ndarray
    atom_mask: np.ndarray
    residue_type: np.ndarray
    residue_mask: np.ndarray
    residue_index: np.ndarray
    chain_indices: np.ndarray
    BB_D: np.ndarray
    BB_D_sincos: np.ndarray
    BB_D_mask: np.ndarray
    SC_D: np.ndarray
    SC_D_sincos: np.ndarray
    SC_D_mask: np.ndarray
    chi_1pi_periodic_mask: np.ndarray
    chi_2pi_periodic_mask: np.ndarray
    # mutant twins
    residue_type_mut: np.ndarray
    atom_mask_mut: np.ndarray
    SC_D_mut: np.ndarray
    SC_D_sincos_mut: np.ndarray
    SC_D_mask_mut: np.ndarray
    chi_1pi_periodic_mask_mut: np.ndarray
    chi_2pi_periodic_mask_mut: np.ndarray
    # labels
    ddg: np.ndarray       # [B]
    mut_mask: np.ndarray  # [B, L]

    def wild(self) -> ProteinBatch:
        return ProteinBatch(**{f: getattr(self, f) for f in ProteinBatch._fields})

    def mutant(self) -> ProteinBatch:
        d = {f: getattr(self, f) for f in ProteinBatch._fields}
        for f in ("residue_type", "atom_mask", "SC_D", "SC_D_sincos", "SC_D_mask",
                  "chi_1pi_periodic_mask", "chi_2pi_periodic_mask"):
            d[f] = getattr(self, f + "_mut")
        return ProteinBatch(**d)


def stack_affinity_batch(feats_list: list[dict], target_len: Optional[int] = None) -> AffinityBatch:
    max_len = max(len(f["residue_type"]) for f in feats_list)
    target = target_len if target_len is not None else bucket_length(max_len)
    padded = []
    for f in feats_list:
        ddg = f.pop("ddg")
        p = pad_features(f, target)
        p["ddg"] = ddg
        f["ddg"] = ddg
        padded.append(p)
    fields = {}
    for name in AffinityBatch._fields:
        if name == "ddg":
            arr = np.asarray([p["ddg"] for p in padded], np.float32)
        else:
            arr = np.stack([p[name] for p in padded])
        if arr.dtype == np.int64:
            arr = arr.astype(np.int32)
        elif arr.dtype == np.float64:
            arr = arr.astype(np.float32)
        fields[name] = arr
    return AffinityBatch(**fields)
