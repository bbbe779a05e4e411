"""Build a large multi-chain complex from real crystal structures.

Concatenates T1124 (739 res, chains A+B), a translated copy of T1124
(chains C+D), and 2FTL (280 res, chains E+F) into one 1758-residue
6-chain complex with real side-chain coordinates — the >1500-residue
end-to-end CLI workload recorded in PERF.md. Copies are translated apart
along x so no artificial inter-complex contacts are introduced.

Usage: python tools/make_large_fixture.py [out.pdb] [n_t1124_copies]

With ``n_t1124_copies`` (default 2), the complex is n translated T1124
copies + one 2FTL — e.g. 11 copies builds the ~8.4k-residue single-chip
memory-evidence workload (VERDICT r4: linear-memory kNN + clash).
"""
from __future__ import annotations

import string
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def main(out_path: str = "/tmp/large_complex.pdb", n_t1124: str = "2"):
    import dataclasses

    from packppi_tpu.structure import from_pdb_file, to_pdb

    specs = [("t1124", (120.0 * i, 0.0, 0.0)) for i in range(int(n_t1124))]
    specs.append(("2ftl", (120.0 * int(n_t1124), 0.0, 0.0)))
    parts = []
    for name, shift in specs:
        prot = from_pdb_file(REPO / f"tests/fixtures/{name}.pdb", mse_to_met=True)
        prot = dataclasses.replace(
            prot, atom_positions=prot.atom_positions + np.asarray(shift))
        parts.append(prot)

    # relabel chains A.. sequentially and renumber without collisions
    letters = iter(string.ascii_uppercase)
    chain_map = {}
    fields = {k: [] for k in ("atom_positions", "aaindex", "atom_mask",
                              "residue_index", "chain_id", "b_factors")}
    for pi, prot in enumerate(parts):
        for cid in dict.fromkeys(prot.chain_id):  # preserve order
            chain_map[(pi, cid)] = next(letters)
        sel = np.arange(len(prot.aaindex))
        fields["atom_positions"].append(prot.atom_positions[sel])
        fields["aaindex"].append(prot.aaindex[sel])
        fields["atom_mask"].append(prot.atom_mask[sel])
        fields["residue_index"].append(prot.residue_index[sel])
        fields["chain_id"].append(
            np.asarray([chain_map[(pi, c)] for c in prot.chain_id[sel]]))
        fields["b_factors"].append(prot.b_factors[sel])

    import packppi_tpu.structure.protein as P
    merged = P.Protein(**{k: np.concatenate(v) for k, v in fields.items()})
    Path(out_path).write_text(to_pdb(merged))
    print(f"{out_path}: {len(merged.aaindex)} residues, "
          f"{len(set(merged.chain_id.tolist()))} chains, "
          f"{int(merged.atom_mask.sum())} atoms")


if __name__ == "__main__":
    main(*sys.argv[1:])
