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

        # keep the CPU backend registered alongside a forced accelerator:
        # host-side metric paths pin eager work to it so writer threads
        # never contend with the accelerator dispatch queue
        # (utils.analysis.get_metric)
        if platform not in ("cpu",) and "cpu" not in platform.split(","):
            platform = f"{platform},cpu"
        jax.config.update("jax_platforms", platform)
    enable_compilation_cache()


def enable_compilation_cache(cache_dir: Optional[str] = None) -> None:
    """Persistent XLA compilation cache: repeat invocations of the CLIs and
    bench skip the (minutes-long on a tunneled TPU) compile step."""
    import jax

    cache_dir = cache_dir or os.environ.get(
        "PACKPPI_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "packppi_tpu", "xla"))
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # tunnel-compiled ops cost ~0.5s each regardless of size; cache all
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    except Exception:
        pass
