"""Sampling-time machinery: reverse diffusion lives on the model; proximal
clash-removal optimization lives here."""
from packppi_tpu.sampling.proximal import find_clash_mask, proximal_optimize  # noqa: F401
