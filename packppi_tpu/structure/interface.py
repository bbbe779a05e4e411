"""Protein-protein interface detection (host-side numpy).

A residue is an interface residue if any of its heavy atoms lies within
``radius`` (default 10 A) of an atom from a different chain — the same
residue-level neighbor-search contract as the reference (reference:
src/utils/interface.py:11-55, via BioPython NeighborSearch), implemented as
chunked dense distance checks on the atom14 arrays (no external C library).
"""
from __future__ import annotations

import numpy as np

from packppi_tpu.structure.protein import Protein


def interface_residue_mask(protein: Protein, radius: float = 10.0,
                           chunk: int = 2048) -> np.ndarray:
    """[num_res] float mask of residues contacting another chain.

    Returns all-zeros for single-chain structures.
    """
    chains = np.asarray(protein.chain_id)
    if len(np.unique(chains)) == 1:
        return np.zeros(len(chains), np.float32)

    mask = protein.atom_mask.astype(bool)                      # [L, 14]
    pos = np.nan_to_num(protein.atom_positions).astype(np.float32)

    flat_pos = pos[mask]                                       # [A, 3]
    flat_res = np.repeat(np.arange(len(chains)), mask.sum(-1)) # [A]
    flat_chain = chains[flat_res]

    out = np.zeros(len(chains), bool)
    r2 = radius * radius
    for start in range(0, len(flat_pos), chunk):
        sl = slice(start, start + chunk)
        d2 = ((flat_pos[sl, None, :] - flat_pos[None, :, :]) ** 2).sum(-1)
        cross = flat_chain[sl, None] != flat_chain[None, :]
        hit = ((d2 < r2) & cross).any(-1)
        np.logical_or.at(out, flat_res[sl], hit)
    return out.astype(np.float32)
