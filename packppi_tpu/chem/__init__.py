"""Chemical constants layer (L0).

Literature chemistry (rigid-group atom geometry, Engh & Huber bond tables,
chi-angle definitions) loaded from ``chem_data.json`` and compiled into dense
numpy tables indexed by residue type. Semantics match the reference framework
(reference: src/utils/residue_constants.py) so downstream coordinates and
metrics agree; the table construction code here is original and
self-contained.
"""
from packppi_tpu.chem.tables import (  # noqa: F401
    ATOM14_NAMES,
    ATOM37_TYPES,
    CHEM,
    NUM_ATOM14,
    NUM_ATOM37,
    NUM_RESTYPES,
    RESTYPE_1TO3,
    RESTYPE_3TO1,
    RESTYPE_ORDER,
    RESTYPES,
    ChemTables,
    make_atom14_dists_bounds,
    sc_atom14_mask,
)
