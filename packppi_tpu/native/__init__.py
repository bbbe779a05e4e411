"""Native host runtime: C++ PDB parser + SASA via ctypes.

The shared library is always compiled locally on first use (g++ -O3) into a
cache path keyed by the source hash — no prebuilt binary ships in the repo,
so the loaded code is exactly what the local toolchain produced from the
audited source. Set ``PACKPPI_NATIVE=0`` to force the pure-Python paths; all
native functions have Python fallbacks with identical outputs (tested).
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).parent / "src" / "pdbio.cpp"
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def native_enabled() -> bool:
    return os.environ.get("PACKPPI_NATIVE", "1") != "0"


def _lib_path() -> Path:
    """Cache path keyed by the source digest: any source edit changes the
    target path, so a stale or foreign-arch binary can never be picked up."""
    digest = hashlib.sha256(_SRC.read_bytes()).hexdigest()[:16]
    root = os.environ.get(
        "PACKPPI_CACHE", os.path.join(os.path.expanduser("~"), ".cache", "packppi_tpu"))
    p = Path(root) / "native"
    p.mkdir(parents=True, exist_ok=True)
    return p / f"libpackppi_io-{digest}.so"


def _build(lib_path: Path) -> bool:
    try:
        # per-process tmp name: concurrent cold-start builders must not
        # write the same file, or the atomic rename could publish a
        # partially written object
        tmp = lib_path.with_suffix(f".so.tmp.{os.getpid()}")
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             str(_SRC), "-o", str(tmp)],
            check=True, capture_output=True, timeout=120)
        os.replace(tmp, lib_path)  # atomic: concurrent builders race safely
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building locally if needed) the native library; None if unavailable."""
    global _lib, _load_failed
    if _lib is not None or _load_failed or not native_enabled():
        return _lib
    lib_path = _lib_path()
    if not lib_path.exists() and not _build(lib_path):
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(str(lib_path))
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
