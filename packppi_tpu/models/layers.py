"""Basic building blocks: MLPs and time embeddings (flax.linen).

Hyperparameter conventions match the reference blocks so trained weights are
layout-compatible (reference: src/models/components/layers.py:10-33,248-282).
"""
from __future__ import annotations

import math
from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

_ACTS: dict[str, Callable] = {
    "relu": nn.relu,
    "gelu": nn.gelu,
    "elu": nn.elu,
    "selu": nn.selu,
    "celu": nn.celu,
    "leaky_relu": nn.leaky_relu,
    "silu": nn.silu,
    "sigmoid": nn.sigmoid,
}

_XAVIER = nn.initializers.xavier_uniform()


def Dense(features: int, use_bias: bool = True, dtype=None, name=None) -> nn.Dense:
    """Dense with Xavier-uniform kernels (the reference's global init).

    ``dtype`` sets the computation dtype (params stay float32); pass
    jnp.bfloat16 for the mixed-precision inference path.
    """
    return nn.Dense(features, use_bias=use_bias, kernel_init=_XAVIER,
                    dtype=dtype, name=name)


class MLP(nn.Module):
    """num_layers linear maps; activation after all but the last.

    ``num_layers=2`` is in->out, ``num_layers=3`` adds one hidden layer, etc.
    """

    num_inter: int
    num_out: int
    num_layers: int
    act: str = "relu"
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        act = _ACTS[self.act]
        x = act(Dense(self.num_inter, self.use_bias, self.dtype)(x))
        for _ in range(self.num_layers - 2):
            x = act(Dense(self.num_inter, self.use_bias, self.dtype)(x))
        return Dense(self.num_out, self.use_bias, self.dtype)(x)


class SinusoidalTimeEmbedding(nn.Module):
    """Transformer-style sin/cos embedding of diffusion time.

    Time in [0, 1] is pre-scaled by ``scale`` (=10000) so the frequency bands
    are exercised, matching the reference embedding exactly.
    """

    dim: int = 16
    max_positions: int = 10000
    scale: float = 10000.0

    @nn.compact
    def __call__(self, t):
        # t: [...] arbitrary batch shape
        half = self.dim // 2
        freqs = jnp.exp(-math.log(self.max_positions) / (half - 1) * jnp.arange(half, dtype=jnp.float32))
        ang = (t * self.scale)[..., None] * freqs
        emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], -1)
        if self.dim % 2 == 1:
            emb = jnp.pad(emb, [(0, 0)] * (emb.ndim - 1) + [(0, 1)])
        return emb


class SigmaEmbedding(nn.Module):
    """Noise-level conditioning block: embed sigma and fuse with features by
    pre-concat or post-add (kept for experiment parity; the mainline model
    conditions on time through the encoder's node features instead).
    (reference: src/models/components/layers.py:211-245)
    """

    hidden_dim: int
    sigma_dim: int = 16
    operation: str = "pre_concat"  # pre_concat | post_add

    @nn.compact
    def __call__(self, x, sigma):
        emb = SinusoidalTimeEmbedding(self.sigma_dim)(sigma)
        emb = jnp.broadcast_to(emb, (*x.shape[:-1], self.sigma_dim))
        if self.operation == "post_add":
            h = MLP(x.shape[-1], self.hidden_dim, 2)(x)
            return h + Dense(self.hidden_dim)(emb)
        h = jnp.concatenate([x, emb], -1)
        return MLP(x.shape[-1], self.hidden_dim, 2)(h)


class GaussianFourierEmbedding(nn.Module):
    """Random-Fourier-feature time embedding (frozen weights)."""

    dim: int = 16
    scale: float = 10000.0

    @nn.compact
    def __call__(self, t):
        w = self.param("W", nn.initializers.normal(self.scale), (self.dim // 2,))
        ang = t[..., None] * jax.lax.stop_gradient(w) * 2 * jnp.pi
        return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], -1)
