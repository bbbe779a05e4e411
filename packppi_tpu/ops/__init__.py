"""Shared compute ops (L5 support): graph gathers, kNN, clash losses."""
from packppi_tpu.ops.graph import (  # noqa: F401
    gather_edges,
    gather_nodes,
    masked_knn,
)
from packppi_tpu.ops.clash import (  # noqa: F401
    between_residue_clash,
    compute_residue_clash,
    sc_violation_loss,
    within_residue_violations,
)
from packppi_tpu.ops.pallas_clash import (  # noqa: F401
    between_residue_clash_pallas,
    sc_clash_screen,
)
from packppi_tpu.ops.pallas_attention import flash_mha  # noqa: F401
