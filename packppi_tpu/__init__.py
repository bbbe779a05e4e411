"""PackPPI-TPU: a TPU-native protein side-chain packing, clash-optimization
and binding-affinity framework (jax / XLA / Pallas / pjit).

Three user-facing modules, mirroring the reference framework's capability
surface (reference: README.md:12-13):

* **MSC** - side-chain conformation modeling of protein complexes with a
  joint SO(2) torsional diffusion model (``packppi_tpu.models``,
  ``packppi_tpu.sampling``).
* **Prox** - proximal-gradient clash removal for sampled or experimental
  side chains (``packppi_tpu.sampling.proximal``).
* **AP** - mutation binding-affinity (ddG) prediction on top of the frozen
  diffusion encoder (``packppi_tpu.models.affinity``).
"""

__version__ = "0.1.0"
