"""Chemical constants layer (L0).

Literature chemistry (rigid-group atom geometry, Engh & Huber bond tables,
chi-angle definitions) loaded from ``chem_data.json`` and compiled into dense
numpy tables indexed by residue type. Semantics match the reference framework
(reference: src/utils/residue_constants.py) so downstream coordinates and
metrics agree; the table construction code here is original and
self-contained.
"""
from packppi_tpu.chem.tables import (  # noqa: F401
    ATOM7_GROUPS,
    ATOM8_GROUPS,
    ATOM14_NAMES,
    ATOM16_NAMES,
    ATOM16_TYPES,
    ATOM37_TYPES,
    CHEM,
    NUM_ATOM14,
    NUM_ATOM37,
    NUM_RESTYPES,
    RESTYPE_1TO3,
    RESTYPE_3TO1,
    RESTYPE_ORDER,
    RESTYPES,
    CG_ATOMS,
    HBOND_ACCEPTORS_ATOM14,
    HBOND_ACCEPTORS_ATOM37,
    HBOND_DONORS_ATOM14,
    HBOND_DONORS_ATOM37,
    ChemTables,
    make_atom14_dists_bounds,
    sc_atom14_mask,
)
