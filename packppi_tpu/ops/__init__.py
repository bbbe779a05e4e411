"""Shared compute ops (L5 support): graph gathers, kNN, clash losses."""
from packppi_tpu.ops.graph import (  # noqa: F401
    gather_edges,
    gather_nodes,
    masked_knn,
)
