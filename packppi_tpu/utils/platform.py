"""Runtime platform selection.

The image's TPU PJRT plugin ignores the standard ``JAX_PLATFORMS``
environment variable, so CLIs call :func:`configure_platform` (honoring
``PACKPPI_PLATFORM``) before any jax computation.
"""
from __future__ import annotations

import os
from typing import Optional


def configure_platform(platform: Optional[str] = None) -> None:
    platform = platform or os.environ.get("PACKPPI_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
