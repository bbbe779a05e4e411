"""Structure I/O (L2): Protein container + dependency-free PDB reader/writer."""
from packppi_tpu.structure.protein import (  # noqa: F401
    Protein,
    from_pdb_file,
    from_pdb_string,
    to_pdb,
)
