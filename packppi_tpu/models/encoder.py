"""Protein graph encoder: kNN graph + geometric node/edge features.

Feature semantics mirror the reference encoder (reference:
src/models/components/encoder.py:59-246): AF2 clipped relative-position
one-hots (65 bins), 16-bin RBFs of the 25 pairwise {N, CA, C, O, Cb}
distances, a same-chain flag, inter-residue phi/psi dihedrals, and node
features from sequence one-hots + dihedral sin/cos + a sinusoidal time
embedding.

TPU-first differences:

* neighbor coordinates are gathered FIRST and all 25 atomic-distance RBFs
  are computed on the [B, L, K, 5, 5] gathered tensor — O(L*K) memory
  instead of the reference's 25 full [B, L, L] distance maps; only the kNN
  search touches an [L, L] matrix;
* the encoder is split into a STATIC part (graph + edge embeddings, fixed
  by the backbone) and a DYNAMIC part (node embeddings, depending on the
  noised chis and diffusion time) so the reverse-diffusion sampler builds
  the graph once for all 30 steps instead of 30 times.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from packppi_tpu.geometry.dihedrals import dihedral_from_four_points
from packppi_tpu.models.layers import Dense, SinusoidalTimeEmbedding
# encoder neighbor gathers run as one-hot contractions: at train time the
# encoder re-encodes every batch, and the narrow payloads (1-15 lanes)
# make the gather emitter lane-starved — measured 56.4 -> 50.2 ms/step at
# B=4/L=1024 with HIGHEST-precision (exact) selection, loss bit-identical
# (PERF.md r4 train round). Inference encodes once per pack; neutral there.
from packppi_tpu.ops.graph import gather_nodes_onehot as gather_nodes
from packppi_tpu.ops.graph import masked_knn


def impute_cb(N, CA, C):
    """Virtual C-beta from backbone geometry (ideal tetrahedral)."""
    b = CA - N
    c = C - CA
    a = jnp.cross(b, c)
    return -0.58273431 * a + 0.56802827 * b - 0.54067466 * c + CA


class ProteinEncoder(nn.Module):
    node_features: int = 128
    edge_features: int = 128
    time_embedding_dim: int = 16  # 0 disables the time channel
    num_rbf: int = 16
    top_k: int = 32
    max_relative_feature: int = 32  # AF2 relpos clip -> 65 one-hot bins
    dtype: object = None  # computation dtype for embeddings (params f32)

    def setup(self):
        self.node_embed = Dense(self.node_features, dtype=self.dtype, name="Dense_0")
        self.node_norm = nn.LayerNorm(dtype=self.dtype, name="LayerNorm_0")
        self.edge_embed = Dense(self.edge_features, dtype=self.dtype, name="Dense_1")
        self.edge_norm = nn.LayerNorm(dtype=self.dtype, name="LayerNorm_1")
        if self.time_embedding_dim > 0:
            self.time_embed = SinusoidalTimeEmbedding(self.time_embedding_dim)

    def _rbf(self, D):
        mu = jnp.linspace(0.0, 20.0, self.num_rbf)
        sigma = 20.0 / self.num_rbf
        return jnp.exp(-(((D[..., None] - mu) / sigma) ** 2))

    def _relpos(self, residue_index, idx):
        # gather-then-subtract: building the [B, L, L] offset matrix first
        # materializes it as a gather operand (take_along_axis cannot fuse
        # its operand's producer) — ~67 MB int32 at L=4096 — where the
        # gathered form stays O(L*K); values are identical
        nbr_index = gather_nodes(residue_index[..., None], idx)[..., 0]
        offset = residue_index[..., :, None] - nbr_index
        clipped = jnp.clip(offset + self.max_relative_feature, 0, 2 * self.max_relative_feature)
        return jax.nn.one_hot(clipped, 2 * self.max_relative_feature + 1, dtype=jnp.float32)

    def _atomic_rbfs(self, N, CA, C, O, idx):
        """[B, L, K, 25 * num_rbf] distances between the 5 key atoms of each
        residue pair, computed after the neighbor gather."""
        Cb = impute_cb(N, CA, C)
        atoms = jnp.stack([N, CA, C, O, Cb], axis=-2)          # [B, L, 5, 3]
        nbr = gather_nodes(atoms, idx)                          # [B, L, K, 5, 3]
        # center's atom a x neighbor's atom b, row-major over (a, b)
        d = jnp.sqrt(jnp.sum(
            (atoms[:, :, None, :, None, :] - nbr[:, :, :, None, :, :]) ** 2, -1) + 1e-6)
        rbf = self._rbf(d)                                      # [B, L, K, 5, 5, R]
        return rbf.reshape(*idx.shape, 25 * self.num_rbf)

    def _pairwise_dihedrals(self, N, CA, C, idx):
        """Inter-residue phi/psi: dihedrals mixing atoms of residue i and
        its neighbor j, gathered-first."""
        N_j = gather_nodes(N, idx)
        CA_j = gather_nodes(CA, idx)
        C_j = gather_nodes(C, idx)
        phi = dihedral_from_four_points(C[:, :, None], N_j, CA_j, C_j)
        psi = dihedral_from_four_points(N[:, :, None], CA[:, :, None], C[:, :, None], N_j)
        return jnp.stack([phi, psi], -1)

    def encode_edges(self, X, chain_indices, mask, residue_index):
        """STATIC part: kNN graph + embedded edge features [B, L, K, F].
        Depends only on the backbone — constant through a sampling
        trajectory."""
        N, CA, C, O = X[:, :, 0], X[:, :, 1], X[:, :, 2], X[:, :, 3]
        _, idx = masked_knn(CA, mask, self.top_k)

        relpos = self._relpos(residue_index, idx)
        rbfs = self._atomic_rbfs(N, CA, C, O, idx)
        # gather-then-compare (same O(L*K) rationale as _relpos)
        nbr_chain = gather_nodes(chain_indices[..., None], idx)[..., 0]
        same_chain = (chain_indices[:, :, None] == nbr_chain).astype(jnp.float32)
        e_type = same_chain[..., None] + 1.0
        dihed = self._pairwise_dihedrals(N, CA, C, idx)

        h_E = jnp.concatenate([relpos.astype(jnp.float32), rbfs, e_type, dihed], -1)
        return self.edge_norm(self.edge_embed(h_E)), idx

    def encode_nodes(self, S, BB_D_sincos, SC_D_sincos, t=None):
        """DYNAMIC part: node features from sequence + dihedrals (+time)."""
        node_parts = [
            jax.nn.one_hot(S, 21, dtype=jnp.float32),
            BB_D_sincos.reshape(*S.shape, -1),
            SC_D_sincos.reshape(*S.shape, -1),
        ]
        if self.time_embedding_dim > 0 and t is not None:
            node_parts.append(self.time_embed(t))
        h_V = jnp.concatenate(node_parts, -1)
        return self.node_norm(self.node_embed(h_V))

    def __call__(self, X, S, BB_D_sincos, SC_D_sincos, chain_indices, mask,
                 residue_index=None, t=None, static=None):
        """Returns (h_V [B,L,F], h_E [B,L,K,F], idx [B,L,K]).

        ``static``: optional precomputed (h_E, idx) from encode_edges.
        """
        if static is None:
            h_E, idx = self.encode_edges(X, chain_indices, mask, residue_index)
        else:
            h_E, idx = static
        h_V = self.encode_nodes(S, BB_D_sincos, SC_D_sincos, t)
        return h_V, h_E, idx
