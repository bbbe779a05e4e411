"""Training harness (L9): train state, pjit steps, checkpoints, loops."""
from packppi_tpu.train.checkpoints import load_model_params, load_params, save_params  # noqa: F401
