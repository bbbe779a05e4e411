"""PackPPI-AP: binding-affinity change (ddG) prediction on mutations.

Architecture mirrors the reference (reference:
src/models/AffinityPrediction.py:20-194): a *frozen* pretrained diffusion
backbone supplies geometric features at t=0; a separate mutation encoder +
IPMP stack runs on a mutation-local subgraph (residues with CA within 10 A
of any mutation); per-residue fusion of [pretrained || mutation || sequence]
features plus a learned mutation-flag bias; the ddG head max-pools the
(mutant - wild) difference. Training uses the antisymmetric loss
(f(wt, mt) ~ ddG and f(mt, wt) ~ -ddG).

Three modes: 'network' (full), 'linear' (frozen backbone + head only),
'esm' (precomputed ESM-2 embeddings + head).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from packppi_tpu.data.batch import ProteinBatch
from packppi_tpu.data.skempi import AffinityBatch
from packppi_tpu.models.diffusion_net import NetworkConfig
from packppi_tpu.models.encoder import ProteinEncoder
from packppi_tpu.models.ipmp import MessagePassingStack
from packppi_tpu.models.layers import Dense
from packppi_tpu.models.torsional_diffusion import TorsionalDiffusion


def local_subgraph_mask(X_ca: jnp.ndarray, mut_mask: jnp.ndarray,
                        radius: float = 10.0,
                        residue_mask: Optional[jnp.ndarray] = None,
                        max_mutations: int = 32) -> jnp.ndarray:
    """Residues whose CA is within ``radius`` of any mutated residue's CA
    (reference: src/models/AffinityPrediction.py:124-145). ``residue_mask``
    excludes padding rows — their CA sits at the origin, which would
    otherwise join the subgraph whenever a mutated CA lies within
    ``radius`` of (0,0,0), making predictions depend on the padding
    bucket.

    Distances are computed to the (at most ``max_mutations``) gathered
    mutated CAs only — [B, L, M] instead of the reference's [B, L, L]
    all-pairs matrix, so the memory stays linear in L for
    multi-thousand-residue complexes. Identical to the dense formula
    whenever the batch has <= ``max_mutations`` simultaneous mutations
    (SKEMPI's deepest entries mutate < 10 positions; tested); beyond the
    cap the farthest-listed mutations would be dropped, so the cap is a
    loud contract, not a silent heuristic."""
    M = min(max_mutations, mut_mask.shape[-1])
    # indices of (up to M) mutated residues; surplus slots pick mut_mask==0
    # rows whose distance rows are then nulled by the gathered weight
    w, midx = jax.lax.top_k(mut_mask.astype(jnp.float32), M)   # [B, M]
    mut_ca = jnp.take_along_axis(X_ca, midx[..., None], axis=1,
                                 mode="clip")                  # [B, M, 3]
    d = jnp.sqrt(jnp.sum(
        (X_ca[:, :, None, :] - mut_ca[:, None, :, :]) ** 2, -1) + 1e-12)
    near = (d < radius) & (w[:, None, :] > 0)                  # [B, L, M]
    local = near.any(-1).astype(jnp.float32)
    if residue_mask is not None:
        local = local * residue_mask
    return local


class DdgHead(nn.Module):
    hidden_dim: int = 128

    @nn.compact
    def __call__(self, h):
        h = nn.relu(Dense(self.hidden_dim)(h))
        h = nn.relu(Dense(self.hidden_dim)(h))
        return Dense(1)(h)


class AffinityNet(nn.Module):
    """Trainable part of PackPPI-AP (the diffusion backbone stays outside,
    frozen). ``h_pret`` inputs are the frozen backbone's per-residue
    features (or ESM embeddings in 'esm' mode)."""

    cfg: NetworkConfig = NetworkConfig()
    mode: str = "network"  # network | linear | esm
    # The reference max-pools (h_mt - h_wt) over ALL rows, padding included
    # (reference: src/models/AffinityPrediction.py:189-190), so predictions
    # vary with the padding bucket. strict_parity=True preserves that
    # behavior bit-for-bit; False masks padding out of the pool (each
    # channel's max is taken over real residues only), making predictions
    # padding-invariant. Requires ``pool_mask`` (ignored when parity is on).
    strict_parity: bool = True

    @nn.compact
    def __call__(self, wild: Optional[ProteinBatch], mut: Optional[ProteinBatch],
                 h_pret_wt, h_pret_mt, mut_mask, deterministic: bool = True,
                 pool_mask=None):
        c = self.cfg
        if self.mode == "network":
            # message/FFN compute dtype flows into the trainable submodules
            # too (the frozen backbone gets it via its own NetworkConfig) —
            # the mutation stack carries the same [B, L, K, H] streams
            dtype = jnp.bfloat16 if c.compute_dtype == "bfloat16" else None
            # shared trainable submodules, applied to both variants
            encoder = ProteinEncoder(
                node_features=c.node_features, edge_features=c.edge_features,
                time_embedding_dim=0,  # mutation encoder has no time channel
                num_rbf=c.num_rbf, top_k=c.top_k, dtype=dtype,
                name="mutation_encoder")
            seq_embed = nn.Embed(21, c.hidden_dim, name="seq_embedding")
            mut_bias = nn.Embed(2, c.hidden_dim, name="mut_bias")
            fuse1, fuse2 = Dense(c.hidden_dim), Dense(c.hidden_dim)
            stack = MessagePassingStack(
                hidden_dim=c.hidden_dim, num_layers=c.num_mpnn_layers,
                n_points=c.n_points, dropout=c.dropout, act=c.act,
                position_scale=c.position_scale, use_ipmp=c.use_ipmp,
                k_neighbors=c.k_neighbors, edge_dim=c.edge_features,
                dtype=dtype, name="mutation_mpnn")

            local = local_subgraph_mask(wild.X[:, :, 1, :], mut_mask,
                                        residue_mask=wild.residue_mask)
            mut_flag = jnp.clip(mut_mask.astype(jnp.int32), 0, 1)
            bias = mut_bias(mut_flag) * (mut_flag > 0)[..., None]  # padding_idx-0

            def encode(batch, h_pret):
                sc_sincos = batch.SC_D_sincos * batch.SC_D_mask[..., None]
                h_mut, h_E, idx = encoder(
                    batch.X, batch.residue_type, batch.BB_D_sincos, sc_sincos,
                    batch.chain_indices, local, batch.residue_index, None)
                seq = seq_embed(batch.residue_type)
                h = fuse2(nn.relu(fuse1(jnp.concatenate([h_pret, h_mut, seq], -1))))
                h = h + bias
                # enter the stack in the stream dtype (same pattern as
                # ChiScoreNetwork.__call__ — else the bf16 knob is inert
                # for the trainable message streams)
                if dtype is not None:
                    h, h_E = h.astype(dtype), h_E.astype(dtype)
                return stack(h, h_E, idx, batch.X, local, deterministic)

            h_wt = encode(wild, h_pret_wt)
            h_mt = encode(mut, h_pret_mt)
        else:  # linear / esm: pooled head over the provided features
            h_wt, h_mt = h_pret_wt, h_pret_mt

        head = DdgHead(h_wt.shape[-1] if self.mode == "esm" else c.hidden_dim)
        if self.strict_parity or pool_mask is None:
            pool = lambda d: jnp.max(d, axis=1)
        else:
            neg = jnp.asarray(-1e9, h_wt.dtype)
            valid = (pool_mask > 0)[..., None]
            pool = lambda d: jnp.max(jnp.where(valid, d, neg), axis=1)
        ddg = head(pool(h_mt - h_wt)).squeeze(-1)
        ddg_inv = head(pool(h_wt - h_mt)).squeeze(-1)
        return ddg, ddg_inv


@dataclasses.dataclass(frozen=True)
class AffinityModel:
    """Bundle: frozen diffusion backbone + trainable affinity net."""

    backbone: TorsionalDiffusion
    net: AffinityNet
    mode: str = "network"

    @staticmethod
    def create(cfg: NetworkConfig = NetworkConfig(), mode: str = "network",
               strict_parity: bool = True) -> "AffinityModel":
        from packppi_tpu.models.torsional_diffusion import SampleConfig
        return AffinityModel(
            backbone=TorsionalDiffusion.create(cfg, SampleConfig()),
            net=AffinityNet(cfg, mode, strict_parity),
            mode=mode,
        )

    def _pret(self, backbone_params, batch: ProteinBatch):
        """Frozen per-residue geometric features at t=0."""
        t = jnp.zeros(batch.residue_mask.shape)
        _, h_V = self.backbone.apply(backbone_params, batch, batch.SC_D, t)
        return jax.lax.stop_gradient(h_V)

    def init(self, key, batch: AffinityBatch, backbone_params=None):
        wild, mut = batch.wild(), batch.mutant()
        if self.mode == "esm":
            h_wt = h_mt = jnp.zeros((*wild.residue_mask.shape, 1280))
            return self.net.init(key, None, None, h_wt, h_mt, jnp.asarray(batch.mut_mask))
        h_wt = self._pret(backbone_params, wild)
        h_mt = self._pret(backbone_params, mut)
        return self.net.init(key, wild, mut, h_wt, h_mt, jnp.asarray(batch.mut_mask))

    def predict(self, params, backbone_params, batch: AffinityBatch,
                deterministic: bool = True, rngs=None):
        wild, mut = batch.wild(), batch.mutant()
        h_wt = self._pret(backbone_params, wild)
        h_mt = self._pret(backbone_params, mut)
        return self.net.apply(params, wild, mut, h_wt, h_mt,
                              jnp.asarray(batch.mut_mask), deterministic,
                              wild.residue_mask, rngs=rngs)

    def predict_esm(self, params, esm_wt, esm_mt, deterministic: bool = True,
                    residue_mask=None):
        """``residue_mask`` [B, L] marks real rows of the padded embeddings;
        only consulted when strict_parity is off (masked ddG pooling)."""
        return self.net.apply(params, None, None, esm_wt, esm_mt, None,
                              deterministic, residue_mask)

    def loss_esm(self, params, esm_wt, esm_mt, ddg, weights=None,
                 residue_mask=None):
        """Antisymmetric MSE over precomputed ESM embeddings ('esm' mode).

        ``weights`` (optional, [B]) turns the batch mean into a weighted
        mean — sharded eval pads ragged batches to the device count with
        zero-weight rows, keeping the metric exact."""
        pred, pred_inv = self.predict_esm(params, esm_wt, esm_mt,
                                          residue_mask=residue_mask)
        y = jnp.asarray(ddg)
        if weights is None:
            return 0.5 * (jnp.mean((pred - y) ** 2) + jnp.mean((pred_inv + y) ** 2))
        w = weights / jnp.maximum(weights.sum(), 1e-9)
        return 0.5 * (jnp.sum(w * (pred - y) ** 2) + jnp.sum(w * (pred_inv + y) ** 2))

    def loss(self, params, backbone_params, key, batch: AffinityBatch,
             deterministic: bool = False):
        """Antisymmetric MSE (reference: src/models/AffinityPrediction.py:189-194).

        ``deterministic=True`` disables dropout — validation/test must use
        it (the reference evaluates under Lightning eval mode); the default
        False is the training path."""
        ddg, ddg_inv = self.predict(params, backbone_params, batch,
                                    deterministic=deterministic,
                                    rngs={"dropout": key})
        y = jnp.asarray(batch.ddg)
        return 0.5 * (jnp.mean((ddg - y) ** 2) + jnp.mean((ddg_inv + y) ** 2))
