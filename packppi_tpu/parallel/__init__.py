"""Distribution layer: device meshes and sharding rules."""
from packppi_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
    seq_batch_shardings,
)
