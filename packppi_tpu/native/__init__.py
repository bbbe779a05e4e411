"""Native host runtime: C++ PDB parser + SASA via ctypes.

The shared library builds on first use (g++ -O3) and caches next to the
source. Set ``PACKPPI_NATIVE=0`` to force the pure-Python paths; all native
functions have Python fallbacks with identical outputs (tested).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).parent / "src" / "pdbio.cpp"
_LIB = Path(__file__).parent / "src" / "libpackppi_io.so"
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def native_enabled() -> bool:
    return os.environ.get("PACKPPI_NATIVE", "1") != "0"


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             str(_SRC), "-o", str(_LIB)],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _load_failed
    if _lib is not None or _load_failed or not native_enabled():
        return _lib
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            _load_failed = True
            return None
    try:
        lib = ctypes.CDLL(str(_LIB))
        lib.ppi_parse_pdb.restype = ctypes.c_int
        lib.ppi_sasa.restype = None
        _lib = lib
    except OSError:
        _load_failed = True
    return _lib


def _chem_blobs():
    from packppi_tpu.chem import ATOM14_NAMES, RESTYPE_1TO3, RESTYPES

    resnames = "".join(RESTYPE_1TO3[r] for r in RESTYPES).encode()
    atoms = "".join(
        f"{a:<4}" for r in RESTYPES for a in ATOM14_NAMES[RESTYPE_1TO3[r]]
    ).encode()
    return resnames, atoms


def parse_pdb_native(pdb_str: str, model_idx: int = 0,
                     chain_id=None, discard_water: bool = True,
                     mse_to_met: bool = False, ignore_non_std: bool = True):
    """Native twin of structure.protein.from_pdb_string; returns the Protein
    field arrays or None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None

    if chain_id is None:
        chain_filter = b""
    elif isinstance(chain_id, str):
        chain_filter = chain_id.encode()
    else:
        chain_filter = ",".join(chain_id).encode()

    text = pdb_str.encode()
    max_res = max(pdb_str.count("\n") + 1, 8)
    positions = np.empty((max_res, 14, 3), np.float32)
    atom_mask = np.empty((max_res, 14), np.float32)
    bfac = np.empty((max_res, 14), np.float32)
    aaindex = np.empty(max_res, np.int32)
    residx = np.empty(max_res, np.int32)
    chains = np.empty(max_res, np.uint8)
    resnames, atoms = _chem_blobs()

    n = lib.ppi_parse_pdb(
        text, ctypes.c_long(len(text)), model_idx,
        int(discard_water), int(mse_to_met), int(ignore_non_std),
        chain_filter, resnames, atoms, max_res,
        positions.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        atom_mask.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        bfac.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        aaindex.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        residx.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        chains.ctypes.data_as(ctypes.POINTER(ctypes.c_char)),
    )
    if n < 0:
        return None
    return {
        "atom_positions": positions[:n].astype(np.float64),
        "atom_mask": atom_mask[:n].astype(np.float64),
        "b_factors": bfac[:n].astype(np.float64),
        "aaindex": aaindex[:n].astype(np.int64),
        "residue_index": residx[:n].astype(np.int64),
        "chain_id": np.array([chr(c) for c in chains[:n]]),
    }


def sasa_native(positions: np.ndarray, radii: np.ndarray,
                n_points: int = 100, probe: float = 1.4) -> Optional[np.ndarray]:
    """Per-atom Shrake-Rupley SASA; None if the native library is missing."""
    lib = get_lib()
    if lib is None:
        return None
    pos = np.ascontiguousarray(positions, np.float32)
    rad = np.ascontiguousarray(radii, np.float32)
    out = np.empty(len(rad), np.float32)
    lib.ppi_sasa(
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        rad.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(rad), n_points, ctypes.c_float(probe),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out.astype(np.float64)
