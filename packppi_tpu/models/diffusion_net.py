"""The chi-angle score network: encoder -> IPMP stack -> score decoder.

One flax module = one jitted forward. The reverse-diffusion sampler wraps
this in a lax.scan (packppi_tpu.sampling), the trainer in a pjit step
(packppi_tpu.train). Mirrors the reference's composition (reference:
src/models/TorsionalDiffusion.py:39-109).
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from packppi_tpu.data.batch import ProteinBatch
from packppi_tpu.models.encoder import ProteinEncoder
from packppi_tpu.models.ipmp import MessagePassingStack
from packppi_tpu.models.layers import MLP


@dataclasses.dataclass(frozen=True)
class NetworkConfig:
    node_features: int = 128
    edge_features: int = 128
    hidden_dim: int = 128
    num_mpnn_layers: int = 3
    n_points: int = 8
    dropout: float = 0.1
    act: str = "relu"
    position_scale: float = 1.0
    use_ipmp: bool = True
    k_neighbors: int = 32
    time_embedding_dim: int = 16
    num_rbf: int = 16
    top_k: int = 32
    compute_dtype: str = "float32"  # "bfloat16" for the fast inference path
    # Pallas fused message kernel (inference): False | True | "geom" |
    # "geom_lanes". The "geom" variants additionally compute the
    # point-geometry features inside the kernel — the [B, L, K, 9P] feature
    # tensor never touches HBM. "geom" is the r3 AoS variant (rejected:
    # lane-starved [blk, K, P] math, PERF.md); "geom_lanes" is the r5
    # lane-major rework — every in-kernel geometry intermediate is a
    # [rows, blk*K] tile at full 128-lane occupancy and the neighbor plane
    # gather feeds the kernel lane-major.
    fused_messages: object = False
    # opt-in: route TRAINING through the differentiable fused kernel too
    # (ops.pallas_ipmp.fused_message_diff — custom-VJP remat backward).
    # Measured SLOWER than the unfused train step (13-17% at B1/L3072 on
    # v5e, PERF.md "Fused message kernel in training"), so non-default;
    # requires fused_messages=True ("geom" stays inference-only).
    fused_messages_train: bool = False
    fused_layers: bool = False      # step-fused Pallas IPMP layer (inference;
                                    # supersedes fused_messages when set)
    # storage dtype of the sampler's cached static edge embeddings
    # ("float32" | "bfloat16" | "int8"); int8 = per-channel symmetric
    # quantization, dequantized on read each denoising step
    static_edge_dtype: str = "float32"
    # "global" computes point-geometry features from gathered GLOBAL
    # neighbor points (f32 gather — O(100 A) coordinates are not bf16-safe);
    # "local" caches static per-edge relative frame transforms
    # (ipmp.relative_frame_transforms — the backbone is frozen during
    # sampling) and computes identical features from gathered LOCAL points,
    # which makes the per-step gather stream bf16-safe. Incompatible with
    # fused_messages="geom" / fused_layers (those kernels read global
    # points); values identical at f32 (tested).
    geometry_mode: str = "global"
    # lane-major geometry feature assembly (ipmp.geometry_features_lanes):
    # intermediates run [B, rows, L*K] (full VPU lanes) with a one-hot MXU
    # gather. NON-DEFAULT after the r4 precision audit: with the required
    # HIGHEST-precision selection (default MXU bf16 rounding costs ~0.5 A
    # on global coordinates, measured on-chip) the path measures 31.68 vs
    # 29.31 ms/pack — the apparent win was the unsound bf16 selection.
    # Kept as an exact, tested alternative assembly.
    geometry_lanes: bool = False
    # rematerialize each message-passing layer in the training backward
    # (recompute instead of store activations) — a traffic/memory knob for
    # the gather/scatter-bound train step (PERF.md r4 train round)
    remat_layers: bool = False
    # replace the scatter-add BACKWARD of the message-stack gathers with a
    # blocked one-hot MXU contraction (ops.graph.gather_nodes_mg, custom
    # VJP; forward stays the plain row-gather). The train step is
    # gather/scatter-bound (PERF.md r4); gradients are the same sums up to
    # float reassociation. False | True | "auto" — "auto" (the trainer
    # default) gates on the padded length at the measured crossover
    # (ops.graph.resolve_mxu_gather_grad; r5 sweep in PERF.md): the
    # contraction wins at small L and loses to the scatter at large L.
    # Audited-but-manual knobs, for contrast: compute_dtype stays explicit
    # (bf16 changes numerics — a policy must never silently alter training
    # math), and remat_layers stays explicit (measured slower at every
    # tested shape, PERF.md r4 — it is an OOM-avoidance knob whose need
    # depends on device memory, not a latency crossover a shape gate can
    # encode).
    mxu_gather_grad: object = False
    # COALESCED neighbor gathers (geometry_mode="local" + fused messages
    # only): the j-term and the local point planes share idx and the
    # stream dtype, so each message pass gathers ONE [B, L, K, H+3P]
    # block instead of two narrow ones. Values bit-identical (pure
    # concat/split around the same gather, tested). NON-DEFAULT: measured
    # SLOWER in context (T1124 pack 32.4 vs 29.7 ms local / 29.6 global —
    # the concat+split materializes where two independent gathers overlap
    # with compute), the same in-context reversal as the one-hot j-term
    # gather (PERF.md "End-of-r4 sampler re-profile").
    coalesce_gathers: bool = False
    # run each post-message residual->LN->FFN->LN chain as ONE Pallas pass
    # (ops.pallas_layer.fused_chain): the [rows, H] stream is read/written
    # once and the [rows, 4H] FFN hidden never touches HBM — targets the
    # ops the end-of-r4 re-profile charged at ~20x (LN) / ~3x (FFN) their
    # traffic floor. Inference only (dropout must be off); row-local math,
    # so it composes with any gather/geometry mode. Unlike fused_layers
    # (whole-layer Mosaic pass, rejected — it TOOK OVER the message matmuls
    # and lane-starved geometry), this kernel leaves messages/gathers to
    # XLA and fuses only the op-granularity-bound tail.
    fused_chain: bool = False
    # opt-in: route the TRAINING chains through the differentiable fused
    # chain too (ops.pallas_layer.fused_chain_diff — custom-VJP jnp-replay
    # backward, the fused_message_diff pattern). Requires dropout=0.0: the
    # kernel applies no dropout, so with dropout active the fused and
    # unfused chains would compute different functions. Measured A/B in
    # PERF.md ("Differentiable fused_chain in training").
    fused_chain_train: bool = False


class ChiScoreNetwork(nn.Module):
    cfg: NetworkConfig = NetworkConfig()

    def setup(self):
        c = self.cfg
        if c.geometry_mode == "local" and (
                c.fused_messages in ("geom", "geom_lanes", "geom_gather")
                or c.fused_layers):
            raise ValueError(
                "geometry_mode='local' is incompatible with the global-point "
                "kernels (fused_messages='geom'/'geom_lanes'/'geom_gather' "
                "/ fused_layers)")
        if c.fused_chain_train and c.dropout != 0.0:
            raise ValueError(
                "fused_chain_train requires dropout=0.0: the fused chain "
                "kernel applies no dropout, so with dropout active the "
                "fused and unfused training paths would compute different "
                "functions")
        dtype = jnp.bfloat16 if c.compute_dtype == "bfloat16" else None
        self.encoder = ProteinEncoder(
            node_features=c.node_features,
            edge_features=c.edge_features,
            time_embedding_dim=c.time_embedding_dim,
            num_rbf=c.num_rbf,
            top_k=c.top_k,
            dtype=dtype,
            name="ProteinEncoder_0",
        )
        self.stack = MessagePassingStack(
            hidden_dim=c.hidden_dim,
            num_layers=c.num_mpnn_layers,
            n_points=c.n_points,
            dropout=c.dropout,
            act=c.act,
            position_scale=c.position_scale,
            use_ipmp=c.use_ipmp,
            k_neighbors=c.k_neighbors,
            dtype=dtype,
            edge_dim=c.edge_features,
            geometry_lanes=c.geometry_lanes,
            remat=c.remat_layers,
            mxu_gather_grad=c.mxu_gather_grad,
            coalesce_gathers=c.coalesce_gathers,
            fused_chain=c.fused_chain,
            fused_chain_train=c.fused_chain_train,
            name="MessagePassingStack_0",
        )
        self.dec1 = MLP(c.hidden_dim // 2, c.hidden_dim // 4, 2, dtype=dtype, name="MLP_0")
        self.dec2 = MLP(c.hidden_dim // 8, 4, 2, dtype=dtype, name="MLP_1")

    def encode_static(self, batch: ProteinBatch):
        """Backbone-only graph + edge features — constant during sampling.

        Stored at ``cfg.static_edge_dtype``: the cache is re-read from HBM
        every denoising step, so narrower storage trades a per-step dequant
        for 2-4x less edge traffic (measured in PERF.md)."""
        h_E, idx = self.encoder.encode_edges(batch.X, batch.chain_indices,
                                             batch.residue_mask, batch.residue_index)
        sd = self.cfg.static_edge_dtype
        if sd == "bfloat16":
            h_E = h_E.astype(jnp.bfloat16)
        elif sd == "int8":
            scale = jnp.max(jnp.abs(h_E), axis=(0, 1, 2), keepdims=True) / 127.0
            scale = jnp.maximum(scale, 1e-8)
            h_E = (jnp.round(h_E / scale).astype(jnp.int8), scale)
        # the attention mask's gather is static too; recomputing it inside
        # the sampling scan measured 130 us/step (XLA does not hoist the
        # gather out of the while loop)
        mask_attend = MessagePassingStack.attend_mask(batch.residue_mask, idx)
        if self.cfg.geometry_mode == "local":
            # the backbone is frozen during sampling -> the per-edge relative
            # frame transforms are static; cache them with the edges
            from packppi_tpu.geometry.rigid import bb_frames_from_atom14, scale_translation
            from packppi_tpu.models.ipmp import relative_frame_transforms

            frames = scale_translation(bb_frames_from_atom14(batch.X),
                                       1.0 / self.cfg.position_scale)
            rel = relative_frame_transforms(frames, idx)
            return h_E, idx, mask_attend, rel
        return h_E, idx, mask_attend

    @staticmethod
    def _dequant_static(h_E, dtype):
        if isinstance(h_E, tuple):
            q, scale = h_E
            return q.astype(dtype or jnp.float32) * scale.astype(dtype or jnp.float32)
        # static_edge_dtype is a STORAGE dtype: restore the compute dtype on
        # read. Without this cast a bf16 cache under f32 compute silently
        # became the stream dtype for the whole edge pipeline (while the
        # NARROWER int8 cache correctly dequantized to f32).
        return h_E.astype(dtype or jnp.float32)

    def __call__(self, batch: ProteinBatch, SC_D_noised: jnp.ndarray,
                 t: jnp.ndarray, deterministic: bool = True, static=None,
                 skip_last_edge_update: bool = False):
        """Args:
            batch: padded protein batch.
            SC_D_noised: [B, L, 4] noised chi angles.
            t: [B, L] per-residue diffusion time.

        Returns:
            (score [B, L, 4], h_V [B, L, hidden]).
        """
        c = self.cfg
        dtype = jnp.bfloat16 if c.compute_dtype == "bfloat16" else None
        sc_sincos = jnp.stack([jnp.sin(SC_D_noised), jnp.cos(SC_D_noised)], -1)
        sc_sincos = sc_sincos * batch.SC_D_mask[..., None]

        mask_attend, rel = None, None
        if static is not None:
            mask_attend = static[2] if len(static) > 2 else None
            rel = static[3] if len(static) > 3 else None
            static = (self._dequant_static(static[0], dtype), static[1])
        h_V, h_E, idx = self.encoder(
            batch.X, batch.residue_type, batch.BB_D_sincos, sc_sincos,
            batch.chain_indices, batch.residue_mask, batch.residue_index, t,
            static=static)

        h_V = self.stack(
            h_V.astype(dtype) if dtype else h_V,
            h_E.astype(dtype) if dtype else h_E,
            idx, batch.X, batch.residue_mask, deterministic,
            # the plain fused kernel is differentiable (custom-VJP remat
            # backward, ops.pallas_ipmp.fused_message_diff), so training MAY
            # use it — opt-in via fused_messages_train (measured slower than
            # unfused, PERF.md); the "geom" variant stays inference-only
            fused=(c.fused_messages if deterministic
                   else c.fused_messages is True and c.fused_messages_train),
            skip_last_edge_update=skip_last_edge_update,
            fused_layer=c.fused_layers and deterministic,
            mask_attend=mask_attend,
            geometry_local=c.geometry_mode == "local", rel=rel)

        score = self.dec1(h_V)
        score = nn.relu(score)
        score = self.dec2(score)
        return score.astype(jnp.float32), h_V.astype(jnp.float32)
