"""Distribution layer: device meshes, sharding rules, pipeline schedule."""
from packppi_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
    seq_batch_shardings,
)
from packppi_tpu.parallel.pipeline import pipeline_apply  # noqa: F401
