"""Neural network stack (L5/L8): encoder, IPMP message passing, score head."""
from packppi_tpu.models.layers import MLP, SinusoidalTimeEmbedding  # noqa: F401
from packppi_tpu.models.encoder import ProteinEncoder  # noqa: F401
from packppi_tpu.models.ipmp import InvariantPointLayer, MessagePassingStack, VanillaMPNNLayer  # noqa: F401
from packppi_tpu.models.diffusion_net import ChiScoreNetwork, NetworkConfig  # noqa: F401
from packppi_tpu.models.torsional_diffusion import SampleConfig, TorsionalDiffusion  # noqa: F401
