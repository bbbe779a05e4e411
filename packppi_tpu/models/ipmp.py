"""Invariant point message passing + vanilla MPNN layers.

IPMP (reference: src/models/components/layers.py:36-148): each node predicts
``n_points`` 3D points in its backbone frame; messages mix neighbor hidden
states with frame-invariant point geometry (local points, cross-frame
projections, point-pair distances). All gathers are dense [B, L, K] ops; the
frame algebra uses the functional Rigid pytree, so the whole layer is one
fused XLA computation.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from packppi_tpu.geometry.rigid import bb_frames_from_atom14, scale_translation
from packppi_tpu.models.layers import MLP
from packppi_tpu.ops.graph import (gather_nodes, gather_nodes_mg,
                                   resolve_mxu_gather_grad)

# With geom_lanes + fused_chain, fold the edge chain into the lanes
# message kernel (chain_weights path). Read at trace time, like
# ops.pallas_layer.INTERPRET. DEFAULT OFF: the interleaved same-process
# A/B (tools/bench_fold.py, r5) measured folded 22.31 vs separate
# 22.02 ms — the eliminated [L*K, H] stream round trip (~1.4 ms at peak
# BW) is outweighed by lost kernel overlap and the VMEM pressure of the
# chain weights + chunked 4H FFN inside the blk=128 message kernel. The
# capability stays (interpret-parity-tested) as the measured closure of
# the last bounded-but-untried lever in PERF.md's irreducibility account.
FOLD_EDGE_CHAIN = False



def geometry_global_points(p_local: jnp.ndarray, frames) -> jnp.ndarray:
    """[B, L, 3P] plane-stacked global points ``[pgx | pgy | pgz]`` where
    ``pg = R @ p_local + t`` (the pre-gather half of ``geometry_features``;
    split out so the fused message path can gather these planes together
    with the per-node message terms in ONE gather per pass)."""
    plx, ply, plz = (p_local[..., c] for c in range(3))         # [B,L,P]
    R, t = frames.rot, frames.trans                             # [B,L,3,3],[B,L,3]

    def rot_row(r0, r1, r2, x, y, z):
        return r0 * x + r1 * y + r2 * z

    e = lambda a: a[..., None]                                  # [B,L,1]
    pgx = rot_row(e(R[..., 0, 0]), e(R[..., 0, 1]), e(R[..., 0, 2]), plx, ply, plz) + e(t[..., 0])
    pgy = rot_row(e(R[..., 1, 0]), e(R[..., 1, 1]), e(R[..., 1, 2]), plx, ply, plz) + e(t[..., 1])
    pgz = rot_row(e(R[..., 2, 0]), e(R[..., 2, 1]), e(R[..., 2, 2]), plx, ply, plz) + e(t[..., 2])
    return jnp.concatenate([pgx, pgy, pgz], -1)


def geometry_edge_features(p_local: jnp.ndarray, nbr: jnp.ndarray,
                           frames) -> jnp.ndarray:
    """Post-gather half of ``geometry_features``: ``nbr`` [B, L, K, 3P] are
    the gathered neighbor global-point planes (``geometry_global_points``
    rows at the edge's j)."""
    B, L, P = p_local.shape[:3]
    K = nbr.shape[2]
    plx, ply, plz = (p_local[..., c] for c in range(3))         # [B,L,P]
    R, t = frames.rot, frames.trans                             # [B,L,3,3],[B,L,3]
    pg = geometry_global_points(p_local, frames)
    pgx, pgy, pgz = pg[..., :P], pg[..., P:2 * P], pg[..., 2 * P:]
    ngx, ngy, ngz = nbr[..., :P], nbr[..., P:2 * P], nbr[..., 2 * P:]

    def rot_row(r0, r1, r2, x, y, z):
        return r0 * x + r1 * y + r2 * z

    # neighbor points in i's frame: R_i^T (p_global[j] - t_i)
    ee = lambda a: a[..., None, None]                           # [B,L,1,1]
    dx = ngx - ee(t[..., 0])
    dy = ngy - ee(t[..., 1])
    dz = ngz - ee(t[..., 2])
    nlx = rot_row(ee(R[..., 0, 0]), ee(R[..., 1, 0]), ee(R[..., 2, 0]), dx, dy, dz)
    nly = rot_row(ee(R[..., 0, 1]), ee(R[..., 1, 1]), ee(R[..., 2, 1]), dx, dy, dz)
    nlz = rot_row(ee(R[..., 0, 2]), ee(R[..., 1, 2]), ee(R[..., 2, 2]), dx, dy, dz)

    eps = 1e-8
    norm_pl = jnp.sqrt(plx * plx + ply * ply + plz * plz + eps)          # [B,L,P]
    norm_nl = jnp.sqrt(nlx * nlx + nly * nly + nlz * nlz + eps)          # [B,L,K,P]
    ddx = pgx[:, :, None] - ngx
    ddy = pgy[:, :, None] - ngy
    ddz = pgz[:, :, None] - ngz
    norm_pair = jnp.sqrt(ddx * ddx + ddy * ddy + ddz * ddz + eps)        # [B,L,K,P]

    flat_pl = jnp.broadcast_to(p_local.reshape(B, L, 1, P * 3), (B, L, K, P * 3))
    flat_nl = jnp.stack([nlx, nly, nlz], -1).reshape(B, L, K, P * 3)
    return jnp.concatenate([
        flat_pl,                                               # i's points (local)
        jnp.broadcast_to(norm_pl[:, :, None], (B, L, K, P)),   # |p_local|
        flat_nl,                                               # j's points in i's frame
        norm_nl,
        norm_pair,                                             # global pair distances
    ], -1)


def relative_frame_transforms(frames, idx):
    """Static per-edge relative transforms: ``R_rel = R_i^T R_j`` ([B, L, K,
    9], row-major planes) and ``t_rel = R_i^T (t_j - t_i)`` ([B, L, K, 3]).

    The backbone never moves during sampling, so these are CONSTANT across
    all denoising steps — ``encode_static`` caches them once per pack when
    ``NetworkConfig.geometry_mode == "local"``. With them, every geometry
    feature becomes a function of LOCAL-frame quantities only (see
    ``geometry_edge_features_local``): the per-step neighbor gather then
    moves O(1-10 A) local points instead of O(100 A) global coordinates,
    which makes a bfloat16 gather stream safe (the precision failure mode
    of bf16 on global coords is documented in PERF.md's rejected Gram-matrix
    clash kernel). One-time cost; computed in AoS form for clarity.
    """
    B, L = idx.shape[:2]
    R, t = frames.rot, frames.trans                              # [B,L,3,3],[B,L,3]
    Rj = gather_nodes(R.reshape(B, L, 9), idx).reshape(*idx.shape, 3, 3)
    tj = gather_nodes(t, idx)                                    # [B,L,K,3]
    # (R_i^T R_j)[a,d] = sum_c R_i[c,a] R_j[c,d]
    rel_rot = jnp.einsum("xlca,xlkcd->xlkad", R, Rj)
    rel_t = jnp.einsum("xlca,xlkc->xlka", R, tj - t[:, :, None])
    return rel_rot.reshape(*idx.shape, 9), rel_t


def geometry_edge_features_local(p_local: jnp.ndarray, nbr_pl: jnp.ndarray,
                                 rel) -> jnp.ndarray:
    """The same 9P geometry features as ``geometry_edge_features``, computed
    entirely in node i's LOCAL frame from the gathered neighbor local-point
    planes ``nbr_pl`` [B, L, K, 3P] and the static relative transforms
    ``rel`` (see ``relative_frame_transforms``):

        nl   = R_rel @ p_local_j + t_rel          (j's points in i's frame)
        |pg_i - ng_j| = |p_local_i - nl|          (norms are R_i-invariant)

    Mathematically identical to the global-frame path (locked by
    tests/test_model.py::test_geometry_local_matches_global); the point is
    the INPUT: ``nbr_pl`` may arrive in bfloat16 (local scale), halving the
    per-step gather traffic. Feature math runs in f32 regardless.
    """
    B, L, P = p_local.shape[:3]
    K = nbr_pl.shape[2]
    f32 = jnp.float32
    plx, ply, plz = (p_local[..., c].astype(f32) for c in range(3))   # [B,L,P]
    pjx = nbr_pl[..., :P].astype(f32)                                 # [B,L,K,P]
    pjy = nbr_pl[..., P:2 * P].astype(f32)
    pjz = nbr_pl[..., 2 * P:].astype(f32)
    rot9, t3 = rel
    r = lambda a: rot9[..., a, None].astype(f32)                      # [B,L,K,1]
    nlx = r(0) * pjx + r(1) * pjy + r(2) * pjz + t3[..., 0, None].astype(f32)
    nly = r(3) * pjx + r(4) * pjy + r(5) * pjz + t3[..., 1, None].astype(f32)
    nlz = r(6) * pjx + r(7) * pjy + r(8) * pjz + t3[..., 2, None].astype(f32)

    eps = 1e-8
    norm_pl = jnp.sqrt(plx * plx + ply * ply + plz * plz + eps)       # [B,L,P]
    norm_nl = jnp.sqrt(nlx * nlx + nly * nly + nlz * nlz + eps)       # [B,L,K,P]
    dx = plx[:, :, None] - nlx
    dy = ply[:, :, None] - nly
    dz = plz[:, :, None] - nlz
    norm_pair = jnp.sqrt(dx * dx + dy * dy + dz * dz + eps)           # [B,L,K,P]

    flat_pl = jnp.broadcast_to(
        p_local.astype(f32).reshape(B, L, 1, P * 3), (B, L, K, P * 3))
    flat_nl = jnp.stack([nlx, nly, nlz], -1).reshape(B, L, K, P * 3)
    return jnp.concatenate([
        flat_pl,
        jnp.broadcast_to(norm_pl[:, :, None], (B, L, K, P)),
        flat_nl,
        norm_nl,
        norm_pair,
    ], -1)


def geometry_features_local(p_local: jnp.ndarray, idx: jnp.ndarray, rel,
                            stream_dtype=None) -> jnp.ndarray:
    """Gather-then-features in the local frame: the gather operand is the
    plane-stacked local points, cast to ``stream_dtype`` (bf16 on the fast
    inference path — safe at local scale, see ``relative_frame_transforms``).
    """
    B, L, P = p_local.shape[:3]
    pl_planes = jnp.concatenate([p_local[..., 0], p_local[..., 1],
                                 p_local[..., 2]], -1)                # [B,L,3P]
    if stream_dtype is not None:
        pl_planes = pl_planes.astype(stream_dtype)
    nbr = gather_nodes(pl_planes, idx)
    return geometry_edge_features_local(p_local, nbr, rel)


def _geom_row_perm(P: int):
    """Row permutation mapping the lane-major plane order to
    ``geometry_edge_features``'s feature order.

    Lane-major rows (axis 1 of [B, 72, N]) are produced grouped by plane:
    [plx(P) | ply(P) | plz(P) | norm_pl(P) | nlx(P) | nly(P) | nlz(P) |
    norm_nl(P) | norm_pair(P)]. The reference layout interleaves point
    components: [pl xyz-interleaved (3P) | norm_pl (P) | nl xyz-interleaved
    (3P) | norm_nl (P) | norm_pair (P)]. Returns ``perm`` with
    ``lane_major_rows[perm] == reference_rows``."""
    import numpy as np
    perm = []
    for p in range(P):                       # pl interleaved: x_p, y_p, z_p
        perm += [p, P + p, 2 * P + p]
    perm += list(range(3 * P, 4 * P))        # norm_pl
    for p in range(P):                       # nl interleaved
        perm += [4 * P + p, 5 * P + p, 6 * P + p]
    perm += list(range(7 * P, 8 * P))        # norm_nl
    perm += list(range(8 * P, 9 * P))        # norm_pair
    return np.asarray(perm)


def geometry_features_lanes(p_local: jnp.ndarray, idx: jnp.ndarray,
                            frames) -> jnp.ndarray:
    """``geometry_features`` in LANE-MAJOR (K-major) form: every
    intermediate is a [B, rows, L*K] tensor whose minor dimension is the
    full edge set, so the VPU runs at 128/128 lanes instead of P=8/128
    (the r3 profile charged ~490 us/step to the plane gathers + feature
    assembly + sqrt fusions of the [B, L, K, P]-layout path; see PERF.md
    "K-major geometry A/B"). The neighbor gather is a one-hot MXU
    contraction over [B, 3P, L] x [B, N, L] (exact selection — one-hot
    weights are exactly 1.0). Output is transposed once and row-permuted
    to the reference feature order: values match ``geometry_features``
    to f32 associativity (tested)."""
    B, L, P = p_local.shape[:3]
    K = idx.shape[-1]
    N = L * K
    R, t = frames.rot, frames.trans                       # [B,L,3,3],[B,L,3]

    pg = geometry_global_points(p_local, frames)          # [B, L, 3P]
    pg_t = pg.swapaxes(1, 2)                              # [B, 3P, L] (small)
    oh = (idx.reshape(B, N, 1)
          == jnp.arange(L, dtype=idx.dtype)[None, None, :]).astype(pg.dtype)
    # HIGHEST precision is REQUIRED for exact selection: the default MXU
    # pass casts f32 operands to bf16, which rounds O(100 A) global
    # coordinates by up to ~0.5 A (measured on-chip; same failure mode as
    # the rejected Gram-matrix clash kernel). bf16x3 decomposition under
    # HIGHEST reproduces f32 exactly, and one-hot weights survive any cast.
    ng = jnp.einsum("bcl,bnl->bcn", pg_t, oh,
                    precision=jax.lax.Precision.HIGHEST)  # [B, 3P, N] gather
    ngx, ngy, ngz = ng[:, :P], ng[:, P:2 * P], ng[:, 2 * P:]

    rep = lambda a: jnp.repeat(a, K, axis=1)[:, None]     # [B,L]->[B,1,N]
    # i's frame, broadcast across its K edges (full-lane rows)
    dx = ngx - rep(t[..., 0])
    dy = ngy - rep(t[..., 1])
    dz = ngz - rep(t[..., 2])
    rr = lambda a, b: rep(R[..., a, b])
    nlx = rr(0, 0) * dx + rr(1, 0) * dy + rr(2, 0) * dz   # [B, P, N]
    nly = rr(0, 1) * dx + rr(1, 1) * dy + rr(2, 1) * dz
    nlz = rr(0, 2) * dx + rr(1, 2) * dy + rr(2, 2) * dz

    # per-point planes of i, broadcast across K: [B,L,P]->[B,P,N]
    repP = lambda a: jnp.repeat(a.swapaxes(1, 2), K, axis=2)
    plx, ply, plz = (repP(p_local[..., c]) for c in range(3))
    pgx, pgy, pgz = (repP(pg[..., c * P:(c + 1) * P]) for c in range(3))

    eps = 1e-8
    norm_pl = jnp.sqrt(plx * plx + ply * ply + plz * plz + eps)
    norm_nl = jnp.sqrt(nlx * nlx + nly * nly + nlz * nlz + eps)
    ddx = pgx - ngx
    ddy = pgy - ngy
    ddz = pgz - ngz
    norm_pair = jnp.sqrt(ddx * ddx + ddy * ddy + ddz * ddz + eps)

    rows = jnp.concatenate([plx, ply, plz, norm_pl, nlx, nly, nlz,
                            norm_nl, norm_pair], axis=1)  # [B, 9P, N]
    rows = rows[:, _geom_row_perm(P)]                     # reference order
    return rows.swapaxes(1, 2).reshape(B, L, K, 9 * P)    # one transpose


def geometry_features(p_local: jnp.ndarray, idx: jnp.ndarray, frames,
                      mxu_gather_grad: bool = False) -> jnp.ndarray:
    """[B, L, K, 9*P] frame-invariant point features (pure function).

    Given per-node predicted points ``p_local`` [B, L, P, 3] in each node's
    backbone frame, produces node i's local points + norms, node j's points
    expressed in i's frame + norms, and global point-pair distances.

    Computed in structure-of-arrays form: every per-edge elementwise op runs
    on [B, L, K, P] component planes instead of [..., P, 3] tensors — a
    trailing dimension of 3 occupies 3 of the VPU's 128 lanes, and the AoS
    version measured 55% of the whole sampling eval. Identical math
    (exactness locked by the converted-weight goldens and
    tests/test_model.py::test_geometry_features_soa_matches_aos).

    Split as gather(geometry_global_points) -> geometry_edge_features so the
    fused message path can fold the gather into its combined per-pass
    gather. Shared by the unfused flax path (InvariantPointLayer) and the
    step-fused Pallas layer path (ops.pallas_layer).
    """
    g = gather_nodes_mg if mxu_gather_grad else gather_nodes
    nbr = g(geometry_global_points(p_local, frames), idx)
    return geometry_edge_features(p_local, nbr, frames)


class _DenseParams(nn.Module):
    """Parameter holder with nn.Dense-compatible leaves (kernel [in, out],
    optional bias) — lets both the jnp path and the fused Pallas kernel use
    the same weights without wrapper modules."""

    in_dim: int
    out_dim: int
    use_bias: bool = True

    def setup(self):
        self.kernel = self.param("kernel", nn.initializers.xavier_uniform(),
                                 (self.in_dim, self.out_dim))
        if self.use_bias:
            self.bias = self.param("bias", nn.initializers.zeros, (self.out_dim,))


class FactoredMessageMLP(nn.Module):
    """First message layer factored by input origin.

    Mathematically identical to one Dense over [h_i | h_E | h_j | geometry]
    followed by the rest of the MLP, but the h_i and h_j contributions are
    computed ONCE PER NODE ([L] matmuls) and broadcast/gathered per edge —
    only the edge-local part ([h_E | geometry], 200 wide instead of 456)
    runs at [L*K] size.

    ``fused=True`` routes through the Pallas kernel
    (ops.pallas_ipmp.fused_message_diff): the whole chain stays in VMEM, no
    HBM intermediates. Differentiable — the custom VJP rematerializes the
    chain in jnp for the backward pass, so training can use it too.
    """

    hidden_dim: int
    edge_dim: int = 128
    geom_dim: int = 72
    act: str = "relu"
    dtype: object = None
    # route the wide per-edge gathers through gather_nodes_mg (one-hot MXU
    # backward instead of XLA's scatter-add transpose) — training knob:
    # False | True | "auto" (gate on L at the measured crossover,
    # ops.graph.resolve_mxu_gather_grad)
    mxu_gather_grad: object = False

    def setup(self):
        H = self.hidden_dim
        self.Dense_i = _DenseParams(H, H, use_bias=False)
        self.Dense_j = _DenseParams(H, H, use_bias=False)
        self.Dense_e = _DenseParams(self.edge_dim + self.geom_dim, H)
        self.Dense_1 = _DenseParams(H, H)
        self.Dense_2 = _DenseParams(H, H)

    def _mm(self, x, kernel):
        if self.dtype is not None:
            return jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype),
                           preferred_element_type=jnp.float32)
        return jnp.dot(x, kernel)

    def per_j_term(self, h_V):
        """The ungathered j-term [B, L, H] — exposed so a caller can gather
        it COALESCED with other same-idx neighbor streams (one wide gather
        instead of several narrow ones; see InvariantPointLayer's
        ``coalesce_gathers``) and hand the result back via ``pjg``."""
        return self._mm(h_V, self.Dense_j.kernel)

    def geom_fused_lanes(self, h_V, h_E, idx, p_local, frames,
                         mask_attend=None, pool: bool = False,
                         interpret: bool = False, chain_weights=None):
        """Fused message path with LANE-MAJOR in-kernel geometry
        (ops.pallas_ipmp.fused_message_geom_lanes): like ``geom_fused`` the
        [B, L, K, 9P] feature tensor never exists in HBM, but the in-kernel
        feature math runs on [rows, blk*K] tiles (full 128-lane occupancy)
        instead of the AoS variant's [blk, K, P=8] tiles — the layout fix
        the end-of-r4 re-profile called for. The neighbor plane gather
        happens OUTSIDE in lane-major form (take_along_axis on the
        transposed planes), so its output feeds the kernel without a
        layout change."""
        from packppi_tpu.ops.pallas_ipmp import (_geom_weight_perm,
                                                 build_node_stack,
                                                 fused_message_geom_lanes)

        B, L, P = p_local.shape[:3]
        N = idx.shape[1] * idx.shape[2]
        per_i = self._mm(h_V, self.Dense_i.kernel)
        per_j = self._mm(h_V, self.Dense_j.kernel)
        pjg = gather_nodes(per_j.astype(h_E.dtype), idx)

        f32 = jnp.float32
        pl_planes = jnp.concatenate([p_local[..., 0], p_local[..., 1],
                                     p_local[..., 2]], -1)       # [B, L, 3P]
        plf = p_local.astype(f32)
        norm_pl = jnp.sqrt(plf[..., 0] ** 2 + plf[..., 1] ** 2
                           + plf[..., 2] ** 2 + 1e-8)            # [B, L, P]
        pg = geometry_global_points(p_local, frames)             # [B, L, 3P]
        stackT = build_node_stack(
            pl_planes.astype(f32), norm_pl, frames.rot.reshape(B, L, 9),
            frames.trans, pg.astype(f32))                        # [B, L, R]
        # neighbor planes via the standard fast ROW gather; the kernel
        # transposes each block to lane-major in VMEM (a lane-dim
        # take_along_axis here measured ~25 ms/step — the v1 lanes
        # kernel's actual 33x regression, misattributed to the kernel)
        ngT = gather_nodes(pg.astype(f32), idx)                  # [B,L,K,3P]
        mask = (mask_attend if mask_attend is not None
                else jnp.ones(idx.shape, jnp.float32))

        He = self.edge_dim
        w_g_perm = self.Dense_e.kernel[He:][_geom_weight_perm(P)]
        cd = self.dtype or jnp.float32

        def one(pi, pj, he, st, ng, mk):
            return fused_message_geom_lanes(
                pi, pj, he, st, ng, mk,
                self.Dense_e.kernel[:He], w_g_perm, self.Dense_e.bias,
                self.Dense_1.kernel, self.Dense_1.bias,
                self.Dense_2.kernel, self.Dense_2.bias,
                chain_weights=chain_weights,
                K=idx.shape[-1], P=P, act_name=self.act, pool=pool,
                # blk swept 64/96/128 on-chip: 22.17/21.90/21.82 ms pack —
                # unlike the AoS geom kernel (VMEM-forced to 64), the
                # lane-major intermediates leave room for full 128-row
                # message-matmul blocks (tools/bench_lanes_blk.py)
                blk=128, compute_dtype=cd, interpret=interpret)

        return jax.vmap(one)(per_i, pjg, h_E, stackT, ngT, mask)

    def geom_fused_gather(self, h_V, h_E, idx, p_local, frames,
                          mask_attend=None, pool: bool = False,
                          interpret: bool = False):
        """``geom_fused_lanes`` with the neighbor GATHERS inside the kernel
        too (ops.pallas_ipmp.fused_message_geom_gather): the j-term and the
        neighbor point planes ride one one-hot MXU contraction per block —
        neither gathered stream ever exists in HBM. The end-of-r5
        attribution put 52% of the remaining pack time in exactly these
        XLA row gathers."""
        from packppi_tpu.ops.pallas_ipmp import (_geom_weight_perm,
                                                 build_node_stack,
                                                 fused_message_geom_gather)

        B, L, P = p_local.shape[:3]
        N = idx.shape[1] * idx.shape[2]
        per_i = self._mm(h_V, self.Dense_i.kernel)
        per_j = self._mm(h_V, self.Dense_j.kernel).astype(h_E.dtype)

        f32 = jnp.float32
        pl_planes = jnp.concatenate([p_local[..., 0], p_local[..., 1],
                                     p_local[..., 2]], -1)
        plf = p_local.astype(f32)
        norm_pl = jnp.sqrt(plf[..., 0] ** 2 + plf[..., 1] ** 2
                           + plf[..., 2] ** 2 + 1e-8)
        pg = geometry_global_points(p_local, frames)
        stackT = build_node_stack(
            pl_planes.astype(f32), norm_pl, frames.rot.reshape(B, L, 9),
            frames.trans, pg.astype(f32))
        mask = (mask_attend if mask_attend is not None
                else jnp.ones(idx.shape, jnp.float32))

        He = self.edge_dim
        w_g_perm = self.Dense_e.kernel[He:][_geom_weight_perm(P)]
        cd = self.dtype or jnp.float32

        def one(pi, he, st, iflat, pj, pgf, mk):
            return fused_message_geom_gather(
                pi, he, st, iflat, pj, pgf, mk,
                self.Dense_e.kernel[:He], w_g_perm, self.Dense_e.bias,
                self.Dense_1.kernel, self.Dense_1.bias,
                self.Dense_2.kernel, self.Dense_2.bias,
                K=idx.shape[-1], P=P, act_name=self.act, pool=pool,
                blk=64, compute_dtype=cd, interpret=interpret)

        return jax.vmap(one)(per_i, h_E, stackT, idx.reshape(B, N),
                             per_j, pg.astype(f32), mask)

    def geom_fused(self, h_V, h_E, idx, p_local, frames, mask_attend=None,
                   pool: bool = False, interpret: bool = False):
        """Fused message path with IN-KERNEL geometry (ops.pallas_ipmp.
        fused_message_geom): the [B, L, K, 9P] geometry feature tensor is
        never materialized in HBM — the kernel reads the per-node point
        planes/frames plus the gathered neighbor global-point planes
        ([B, L, K, 3P] f32, the narrowest frame-invariant-sufficient edge
        stream) and rebuilds the features in VMEM between the block reads
        and the message matmuls.

        Args:
            p_local: [B, L, P, 3] per-node predicted points (node frame).
            frames: backbone Rigid frames (rot [B, L, 3, 3], trans [B, L, 3]).
        """
        from packppi_tpu.ops.pallas_ipmp import _geom_weight_perm, fused_message_geom

        B, L, P = p_local.shape[:3]
        per_i = self._mm(h_V, self.Dense_i.kernel)
        per_j = self._mm(h_V, self.Dense_j.kernel)
        # j-term gathered in the stream dtype (see the note in __call__);
        # the neighbor point planes stay f32 — they are GLOBAL coordinates
        # (O(100 A)) and bf16 there loses Angstrom-scale precision (same
        # failure mode as the rejected Gram-matrix clash kernel, PERF.md)
        pjg = gather_nodes(per_j.astype(h_E.dtype), idx)
        ng = gather_nodes(geometry_global_points(p_local, frames), idx)
        pl_planes = jnp.concatenate([p_local[..., 0], p_local[..., 1],
                                     p_local[..., 2]], -1)        # [B, L, 3P]
        rot9 = frames.rot.reshape(B, L, 9)
        trans3 = frames.trans
        mask = (mask_attend if mask_attend is not None
                else jnp.ones(idx.shape, jnp.float32))

        He = self.edge_dim
        w_g_perm = self.Dense_e.kernel[He:][_geom_weight_perm(P)]
        cd = self.dtype or jnp.float32

        def one(pi, pj, he, plp, ngp, r9, t3, mk):
            return fused_message_geom(
                pi, pj, he, plp, ngp, r9, t3, mk,
                self.Dense_e.kernel[:He], w_g_perm, self.Dense_e.bias,
                self.Dense_1.kernel, self.Dense_1.bias,
                self.Dense_2.kernel, self.Dense_2.bias,
                K=idx.shape[-1], P=P, act_name=self.act, pool=pool,
                # the in-kernel geometry intermediates overflow the 16M
                # scoped-VMEM stack at blk=128 (by 0.1-0.4M depending on the
                # surrounding fusion context); 64 fits with margin
                blk=64,
                compute_dtype=cd, interpret=interpret)

        return jax.vmap(one)(per_i, pjg, h_E, pl_planes, ng, rot9, trans3, mask)

    def __call__(self, h_V, h_E, idx, geom, mask_attend=None,
                 pool: bool = False, fused: bool = False,
                 interpret: bool = False, blk: int = 128, pjg=None):
        from packppi_tpu.models.layers import _ACTS

        per_i = self._mm(h_V, self.Dense_i.kernel)
        per_j = self._mm(h_V, self.Dense_j.kernel)

        # init must not trace the Pallas kernel (fails to lower off-TPU and
        # would compile a throwaway executable on it); all params live in
        # setup, so the jnp branch initializes the identical tree
        if fused and not self.is_initializing():
            from packppi_tpu.ops.pallas_ipmp import fused_message_diff

            He = self.edge_dim
            w_g = self.Dense_e.kernel[He:]
            # gather the j-term in the stream dtype: halves the gather's
            # HBM traffic and the kernel's input read on the bf16 path
            # (f32 path: no-op cast). NOTE a one-hot-contraction gather
            # measured 2x faster standalone but 1.2x SLOWER in the full
            # graph (XLA schedules it differently in context) — keep the
            # plain gather here. A caller may pass ``pjg`` pre-gathered
            # (coalesced with the geometry stream, same dtype/values).
            if pjg is None:
                pjg = gather_nodes(per_j.astype(h_E.dtype), idx)
            mask = (mask_attend if mask_attend is not None
                    else jnp.ones(idx.shape, jnp.float32))
            cd = self.dtype or jnp.float32

            def one(pi, pj, he, gm, mk):
                # the differentiable wrapper: kernel forward, remat jnp
                # backward — inference is the same kernel as before
                return fused_message_diff(
                    pi, pj, he, gm, mk,
                    self.Dense_e.kernel[:He], w_g,
                    self.Dense_e.bias,
                    self.Dense_1.kernel, self.Dense_1.bias,
                    self.Dense_2.kernel, self.Dense_2.bias,
                    K=idx.shape[-1], act_name=self.act, pool=pool,
                    blk=blk, compute_dtype=cd, interpret=interpret)

            return jax.vmap(one)(per_i, pjg, h_E, geom.astype(h_E.dtype), mask)

        act = _ACTS[self.act]
        per_e = self._mm(jnp.concatenate([h_E, geom.astype(h_E.dtype)], -1),
                         self.Dense_e.kernel) + self.Dense_e.bias
        g = (gather_nodes_mg
             if resolve_mxu_gather_grad(self.mxu_gather_grad, h_V.shape[1])
             else gather_nodes)
        x = act(per_i[:, :, None]
                + (pjg if pjg is not None else g(per_j, idx)) + per_e)
        x = act(self._mm(x, self.Dense_1.kernel) + self.Dense_1.bias)
        x = self._mm(x, self.Dense_2.kernel) + self.Dense_2.bias
        if pool:
            if mask_attend is not None:
                x = x * mask_attend[..., None]
            x = jnp.mean(x, axis=-2)
        return x


class InvariantPointLayer(nn.Module):
    hidden_dim: int = 128
    n_points: int = 8
    dropout: float = 0.1
    act: str = "relu"
    edge_update: bool = True
    position_scale: float = 1.0
    dtype: object = None  # message/FFN computation dtype (geometry stays f32)
    edge_dim: int = 128
    geometry_lanes: bool = False  # lane-major geometry (geometry_features_lanes)
    mxu_gather_grad: object = False  # False | True | "auto"  # one-hot MXU gather backwards (training)
    # gather the j-term and the local-geometry point planes as ONE wide
    # [B, L, K, H+3P] gather per message pass instead of two narrow ones
    # (same idx, same stream dtype -> concat/split is value-exact). Local
    # geometry mode + fused messages only. NON-DEFAULT: measured slower
    # in context (see NetworkConfig.coalesce_gathers).
    coalesce_gathers: bool = False
    # run the post-message residual->LN->FFN->LN chains through ONE Pallas
    # pass each (ops.pallas_layer.fused_chain) instead of 6-8 XLA ops —
    # inference path (see NetworkConfig.fused_chain)
    fused_chain: bool = False
    # ... and through the differentiable fused chain in TRAINING too
    # (ops.pallas_layer.fused_chain_diff, custom-VJP jnp-replay backward).
    # Only engages when dropout == 0.0 — the kernel applies no dropout
    # (NetworkConfig validates the combination).
    fused_chain_train: bool = False

    def _geom_and_pjg(self, mlp, h_V, h_E, idx, frames, points_fn, rel, fused):
        """Geometry features + (optionally) the coalesced pre-gathered
        j-term for ``mlp``. Returns ``(geom, pjg_or_None)`` — with
        coalescing active, both neighbor streams ride one gather and the
        values are bit-identical to the two-gather path (pure concat/
        split around the same take_along_axis)."""
        coalesce = (self.coalesce_gathers and rel is not None and bool(fused)
                    and not self.is_initializing()
                    and jnp.dtype(self.dtype or jnp.float32) == h_E.dtype)
        if not coalesce:
            return self._geometry_features(h_V, idx, frames, points_fn, rel), None
        B, L = idx.shape[:2]
        H = self.hidden_dim
        p_local = points_fn(h_V).reshape(B, L, self.n_points, 3)
        pl_planes = jnp.concatenate([p_local[..., 0], p_local[..., 1],
                                     p_local[..., 2]], -1)          # [B,L,3P]
        both = jnp.concatenate([mlp.per_j_term(h_V).astype(h_E.dtype),
                                pl_planes.astype(h_E.dtype)], -1)
        gathered = gather_nodes(both, idx)                          # [B,L,K,H+3P]
        geom = geometry_edge_features_local(p_local, gathered[..., H:], rel)
        return geom, gathered[..., :H]

    def _geometry_features(self, h_V, idx, frames, points_fn, rel=None):
        """[B, L, K, 9*n_points] frame-invariant point features — see the
        module-level ``geometry_features`` for the math + layout notes.
        With ``rel`` (static relative transforms), the local-frame path is
        used instead: the gather moves local points in the stream dtype."""
        B, L = idx.shape[:2]
        p_local = points_fn(h_V).reshape(B, L, self.n_points, 3)
        if rel is not None:
            return geometry_features_local(p_local, idx, rel,
                                           stream_dtype=self.dtype)
        if self.geometry_lanes:
            return geometry_features_lanes(p_local, idx, frames)
        return geometry_features(
            p_local, idx, frames,
            mxu_gather_grad=resolve_mxu_gather_grad(self.mxu_gather_grad, L))

    @nn.compact
    def __call__(self, h_V, h_E, idx, X, mask_V=None, mask_attend=None,
                 deterministic: bool = True, fused: bool = False,
                 do_edge_update: bool = True, fused_layer: bool = False,
                 rel=None):
        frames = scale_translation(bb_frames_from_atom14(X), 1.0 / self.position_scale)

        if fused_layer and not self.is_initializing():
            # step-fused Pallas path: the whole layer (message chains, LNs,
            # FFNs) runs in VMEM; raw params are read from this module's
            # subtree (identical tree to the unfused path, so checkpoints
            # interop). Inference-only (dropout must be deterministic).
            from packppi_tpu.ops.pallas_layer import fused_ipmp_layer

            mv = mask_V if mask_V is not None else jnp.ones(h_V.shape[:2], jnp.float32)
            ma = (mask_attend if mask_attend is not None
                  else jnp.ones(idx.shape, jnp.float32))
            return fused_ipmp_layer(
                self.variables["params"], h_V, h_E, idx, frames, mv, ma,
                n_points=self.n_points, act=self.act, compute_dtype=self.dtype,
                do_edge_update=self.edge_update and do_edge_update)

        kw = dict(edge_dim=self.edge_dim, geom_dim=9 * self.n_points,
                  act=self.act, dtype=self.dtype,
                  mxu_gather_grad=self.mxu_gather_grad)

        # the in-kernel-geometry paths work on global points; with the
        # local-frame rel cache active they fall back to the standard fused
        # kernel over precomputed (local-path) features
        geom_in_kernel = (fused in ("geom", "geom_lanes", "geom_gather")
                          and rel is None and not self.is_initializing())
        B, L = idx.shape[:2]

        points_node = nn.Dense(self.n_points * 3, kernel_init=nn.initializers.xavier_uniform())
        if geom_in_kernel:
            p_local = points_node(h_V).reshape(B, L, self.n_points, 3)
            mlp0 = FactoredMessageMLP(self.hidden_dim, name="MLP_0", **kw)
            gf = {"geom_lanes": mlp0.geom_fused_lanes,
                  "geom_gather": mlp0.geom_fused_gather}.get(fused, mlp0.geom_fused)
            msg = gf(h_V, h_E, idx, p_local, frames, mask_attend, pool=True)
        else:
            mlp0 = FactoredMessageMLP(self.hidden_dim, name="MLP_0", **kw)
            geom, pjg = self._geom_and_pjg(mlp0, h_V, h_E, idx, frames,
                                           points_node, rel, fused)
            msg = mlp0(
                h_V, h_E, idx, geom, mask_attend, pool=True,
                # 'geom' with the local-rel cache active falls back to the
                # STANDARD fused kernel over the precomputed features (the
                # in-kernel-geometry variant needs global points)
                fused=bool(fused),
                # jvp: XLA's training fusion context leaves the custom call
                # less scoped-VMEM headroom — blk=128 overflows the 16M
                # stack by 128K at B4/L1024 (measured); 64 fits
                blk=128 if deterministic else 64, pjg=pjg)

        # LayerNorm promotes bf16 inputs to f32 (f32 scale/bias params), so
        # without the .astype(sd) casts the "bf16" streams silently flow f32
        # between layers — double the HBM traffic on every downstream gather,
        # matmul and mask multiply. Values are unchanged vs casting at the
        # next consumer; the f32 path is a no-op.
        sd = h_V.dtype
        # one Pallas pass per chain instead of 6-8 XLA ops. Both chains gate
        # together so the unfused path's LayerNorm auto-names (0..3) always
        # line up with init's. Training engages only via fused_chain_train
        # AND dropout=0 (the kernel applies no dropout; fused_chain_diff's
        # custom VJP makes the pass differentiable).
        use_fc = (not self.is_initializing()
                  and ((self.fused_chain and deterministic)
                       or (self.fused_chain_train and not deterministic
                           and self.dropout == 0.0)))
        drop = lambda x: nn.Dropout(self.dropout, deterministic=deterministic)(x)
        if use_fc:
            from packppi_tpu.ops.pallas_layer import apply_fused_chain
            fc_params = self.variables["params"]
            h_V = apply_fused_chain(
                fc_params, "LayerNorm_0", "MLP_1", "LayerNorm_1",
                h_V, msg, mask_V, act=self.act, compute_dtype=self.dtype,
                pre_mask=False)
        else:
            h_V = nn.LayerNorm()(h_V + drop(msg.astype(sd))).astype(sd)
            h_V = nn.LayerNorm()(h_V + drop(MLP(self.hidden_dim * 4, self.hidden_dim, 2, act=self.act, dtype=self.dtype, name="MLP_1")(h_V).astype(sd))).astype(sd)
            if mask_V is not None:
                # mask in the stream dtype: a f32 mask would likewise promote
                # the stream (0/1 masks are exact in bf16)
                h_V = h_V * mask_V[..., None].astype(sd)

        if self.edge_update and do_edge_update:
            points_edge = nn.Dense(self.n_points * 3, kernel_init=nn.initializers.xavier_uniform())
            edge_chain_folded = False
            if geom_in_kernel:
                p_local = points_edge(h_V).reshape(B, L, self.n_points, 3)
                mlp2 = FactoredMessageMLP(self.hidden_dim, name="MLP_2", **kw)
                if fused == "geom_lanes" and use_fc and FOLD_EDGE_CHAIN:
                    # fold the edge chain INTO the lanes message kernel:
                    # the [B, L*K, H] message stream never round-trips HBM
                    # between the message and chain kernels, and h_E is
                    # read once instead of twice (values identical — the
                    # kernel reproduces the two-kernel boundary rounding)
                    fcp = self.variables["params"]
                    cw = (fcp["LayerNorm_2"]["scale"],
                          fcp["LayerNorm_2"]["bias"],
                          fcp["MLP_3"]["Dense_0"]["kernel"],
                          fcp["MLP_3"]["Dense_0"]["bias"],
                          fcp["MLP_3"]["Dense_1"]["kernel"],
                          fcp["MLP_3"]["Dense_1"]["bias"],
                          fcp["LayerNorm_3"]["scale"],
                          fcp["LayerNorm_3"]["bias"])
                    h_E = mlp2.geom_fused_lanes(
                        h_V, h_E, idx, p_local, frames, mask_attend,
                        pool=False, chain_weights=cw)
                    e_msg = None
                    edge_chain_folded = True
                else:
                    gf = {"geom_lanes": mlp2.geom_fused_lanes,
                          "geom_gather": mlp2.geom_fused_gather}.get(
                        fused, mlp2.geom_fused)
                    e_msg = gf(h_V, h_E, idx, p_local, frames, mask_attend,
                               pool=False)
            else:
                mlp2 = FactoredMessageMLP(self.hidden_dim, name="MLP_2", **kw)
                geom, pjg = self._geom_and_pjg(mlp2, h_V, h_E, idx, frames,
                                               points_edge, rel, fused)
                e_msg = mlp2(
                    h_V, h_E, idx, geom, mask_attend, pool=False,
                    fused=bool(fused),
                    blk=128 if deterministic else 64, pjg=pjg)
            if edge_chain_folded:
                pass  # chain ran inside the lanes message kernel
            elif use_fc:
                from packppi_tpu.ops.pallas_layer import apply_fused_chain
                h_E = apply_fused_chain(
                    self.variables["params"],
                    "LayerNorm_2", "MLP_3", "LayerNorm_3",
                    h_E, e_msg, mask_attend, act=self.act,
                    compute_dtype=self.dtype, pre_mask=True)
            else:
                # run the residual/LN/FFN chain on a flat [B, L*K, He] stream:
                # 4-D [B, L, K, He] dots push XLA:TPU into a convolution-style
                # emitter with layout-change copies around every FFN matmul,
                # and the LN reductions iterate the 4-D domain (profiled at
                # ~2x the cost of the identical flat chain). Reshapes are
                # contiguous (free); values and the param tree are unchanged.
                B, L, K, He = h_E.shape
                se = h_E.dtype
                h_E = h_E.reshape(B, L * K, He)
                e_msg = e_msg.reshape(B, L * K, He)
                if mask_attend is not None:
                    e_msg = e_msg * mask_attend.reshape(B, L * K, 1).astype(e_msg.dtype)
                h_E = nn.LayerNorm()(h_E + drop(e_msg.astype(se))).astype(se)
                h_E = nn.LayerNorm()(h_E + drop(MLP(self.hidden_dim * 4, self.hidden_dim, 2, act=self.act, dtype=self.dtype, name="MLP_3")(h_E).astype(se))).astype(se)
                if mask_attend is not None:
                    h_E = h_E * mask_attend.reshape(B, L * K, 1).astype(se)
                h_E = h_E.reshape(B, L, K, He)

        return h_V, h_E


class VanillaMPNNLayer(nn.Module):
    """Sum-pooled message passing without geometry (reference:
    src/models/components/layers.py:151-208)."""

    hidden_dim: int = 128
    dropout: float = 0.1
    act: str = "relu"
    edge_update: bool = True
    scale: float = 32.0
    mxu_gather_grad: object = False  # False | True | "auto"

    @nn.compact
    def __call__(self, h_V, h_E, idx, X=None, mask_V=None, mask_attend=None,
                 deterministic: bool = True, do_edge_update: bool = True):
        g = (gather_nodes_mg
             if resolve_mxu_gather_grad(self.mxu_gather_grad, h_V.shape[1])
             else gather_nodes)
        h_V_j = g(h_V, idx)
        h_V_i = jnp.broadcast_to(h_V[:, :, None], h_V_j.shape)
        h_in = jnp.concatenate([h_V_i, h_E, h_V_j], -1)
        msg = MLP(self.hidden_dim, self.hidden_dim, 3, act=self.act)(h_in)
        if mask_attend is not None:
            msg = msg * mask_attend[..., None]
        dh = jnp.sum(msg, -2) / self.scale

        drop = lambda x: nn.Dropout(self.dropout, deterministic=deterministic)(x)
        h_V = nn.LayerNorm()(h_V + drop(dh))
        h_V = nn.LayerNorm()(h_V + drop(MLP(self.hidden_dim * 4, self.hidden_dim, 2, act=self.act)(h_V)))
        if mask_V is not None:
            h_V = h_V * mask_V[..., None]

        if self.edge_update and (do_edge_update or self.is_initializing()):
            # same dead-compute skip as the IPMP branch: the final layer's
            # edge output feeds nothing (init still creates the params so
            # the tree is schedule-independent)
            h_V_j = g(h_V, idx)
            h_V_i = jnp.broadcast_to(h_V[:, :, None], h_V_j.shape)
            h_in = jnp.concatenate([h_V_i, h_E, h_V_j], -1)
            e_msg = MLP(self.hidden_dim, self.hidden_dim, 3, act=self.act)(h_in)
            h_E = nn.LayerNorm()(h_E + drop(e_msg))

        return h_V, h_E


class MessagePassingStack(nn.Module):
    """num_layers of IPMP (geometric) or vanilla MPNN message passing
    (reference: src/models/components/mpnn.py:7-62)."""

    hidden_dim: int = 128
    num_layers: int = 3
    n_points: int = 8
    dropout: float = 0.1
    act: str = "relu"
    position_scale: float = 1.0
    use_ipmp: bool = True
    k_neighbors: int = 32
    dtype: object = None
    edge_dim: int = 128
    geometry_lanes: bool = False
    # rematerialize each layer in the backward (training memory/traffic
    # knob): activations inside a layer are recomputed instead of stored
    remat: bool = False
    # one-hot MXU gather backwards (gather_nodes_mg) on the message-stack
    # gathers — replaces the scatter-add transpose in training
    mxu_gather_grad: object = False  # False | True | "auto"
    # one wide j-term+geometry gather per message pass (local mode + fused)
    coalesce_gathers: bool = False
    # single-Pallas-pass post-message chains (inference; see NetworkConfig)
    fused_chain: bool = False
    # differentiable fused chains in training too (requires dropout=0.0)
    fused_chain_train: bool = False

    @staticmethod
    def attend_mask(mask: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
        """[B, L, K] edge validity: mask_i * mask_j over the neighbor table.
        Static during sampling — callers with a cached graph should compute
        it once and pass it in (the gather costs ~130 us/step if left
        inside the sampling scan)."""
        mask_attend = gather_nodes(mask[..., None], idx).squeeze(-1)
        return mask[..., None] * mask_attend

    @nn.compact
    def __call__(self, h_V, h_E, idx, X, mask, deterministic: bool = True,
                 fused: bool = False, skip_last_edge_update: bool = False,
                 fused_layer: bool = False, mask_attend=None,
                 geometry_local: bool = False, rel=None):
        if mask_attend is None:
            mask_attend = self.attend_mask(mask, idx)
        if geometry_local and rel is None:
            # no cached transforms (training / uncached eval): compute them
            # once per forward — they are shared by all layers and passes
            frames = scale_translation(bb_frames_from_atom14(X),
                                       1.0 / self.position_scale)
            rel = relative_frame_transforms(frames, idx)

        for layer in range(self.num_layers):
            # the final layer's edge update feeds nothing (only h_V is
            # returned); inference skips that dead compute (~1/6 of the
            # stack). Param trees are unaffected: init runs with the update
            # enabled, apply simply does not touch those weights.
            last = layer == self.num_layers - 1
            if self.use_ipmp:
                cls = InvariantPointLayer
                if self.remat and not deterministic:
                    # static_argnums count self as 0; booleans at call
                    # positions 7-10 (deterministic, fused, do_edge_update,
                    # fused_layer) must be static under nn.remat
                    cls = nn.remat(InvariantPointLayer,
                                   static_argnums=(7, 8, 9, 10))
                h_V, h_E = cls(
                    self.hidden_dim, self.n_points, self.dropout, self.act,
                    edge_update=True, position_scale=self.position_scale,
                    dtype=self.dtype, edge_dim=self.edge_dim,
                    geometry_lanes=self.geometry_lanes,
                    mxu_gather_grad=self.mxu_gather_grad,
                    coalesce_gathers=self.coalesce_gathers,
                    fused_chain=self.fused_chain,
                    fused_chain_train=self.fused_chain_train,
                    # explicit name: the remat wrapper must bind the SAME
                    # param path the un-remat'd init created
                    name=f"InvariantPointLayer_{layer}",
                )(h_V, h_E, idx, X, mask, mask_attend, deterministic, fused,
                  not (last and skip_last_edge_update), fused_layer, rel=rel)
            else:
                h_V, h_E = VanillaMPNNLayer(
                    self.hidden_dim, self.dropout, self.act,
                    edge_update=True, scale=float(self.k_neighbors),
                    mxu_gather_grad=self.mxu_gather_grad,
                )(h_V, h_E, idx, X, mask, mask_attend, deterministic,
                  do_edge_update=not (last and skip_last_edge_update))
        return h_V
