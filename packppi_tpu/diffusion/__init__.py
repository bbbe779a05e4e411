"""SO(2) torsional diffusion math (L6)."""
from packppi_tpu.diffusion.so2 import (  # noqa: F401
    SO2Schedule,
    SO2Tables,
    brute_force_score,
    brute_force_density,
)
