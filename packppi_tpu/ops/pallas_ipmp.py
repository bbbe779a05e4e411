"""Pallas TPU kernel: fused IPMP message MLP.

The message computation is the hot op of the whole framework (6 invocations
per network eval, 180 per packing run). Unfused, XLA materializes three
[L*K, hidden] intermediates in HBM per invocation; this kernel keeps the
entire chain

    relu(per_i + per_j + h_E @ W_he + geom @ W_g + b) -> relu(@W1+b1) -> @W2+b2
    (node variant: masked mean over the K neighbors)

in VMEM per node block — HBM traffic drops to the unavoidable input reads
plus an [L, hidden] (node) or [L*K, hidden] (edge) output write.

Matmuls run on the MXU in bf16 with f32 accumulation (same numerics as the
bf16 network path).

Differentiability: ``fused_message_diff`` wraps the kernel in a
``jax.custom_vjp`` whose backward REMATERIALIZES the chain with plain jnp
ops and differentiates that (``_reference_message`` mirrors the kernel math
exactly — same cast points, f32 accumulation). The forward pass stores no
[L*K, H] intermediates in HBM (the remat trade: backward re-reads the
kernel inputs and recomputes ~3 matmuls per invocation instead). Inference
through the wrapper is unchanged — custom_vjp costs nothing without a
gradient. The raw ``fused_message`` / ``fused_message_geom`` entry points
stay forward-only.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _act(name: str):
    """Same activation table as the unfused path (models/layers._ACTS) —
    all are VPU-elementwise and lower fine inside Pallas; a narrower table
    here would break the fused/unfused parity contract for configs like
    act='elu' at kernel-trace time."""
    return {"relu": jax.nn.relu, "gelu": jax.nn.gelu, "silu": jax.nn.silu,
            "elu": jax.nn.elu, "selu": jax.nn.selu, "celu": jax.nn.celu,
            "leaky_relu": jax.nn.leaky_relu, "sigmoid": jax.nn.sigmoid}[name]


def _message_chain(x, w1, b1, w2, b2, act):
    x = act(jnp.dot(x, w1, preferred_element_type=jnp.float32) + b1)
    return jnp.dot(x, w2, preferred_element_type=jnp.float32) + b2


def _fused_kernel(per_i_ref, pj_ref, he_ref, geom_ref, mask_ref,
                  whe_ref, wg_ref, be_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                  out_ref, *, K: int, act_name: str, pool: bool,
                  compute_dtype):
    blk = per_i_ref.shape[0]
    H = per_i_ref.shape[1]
    act = _act(act_name)
    cd = compute_dtype

    he = he_ref[...].astype(cd)                    # [blk*K, He]
    geom = geom_ref[...].astype(cd)                # [blk*K, G]
    x = jnp.dot(he, whe_ref[...].astype(cd), preferred_element_type=jnp.float32)
    x = x + jnp.dot(geom, wg_ref[...].astype(cd), preferred_element_type=jnp.float32)
    x = x + be_ref[...]                            # bias [1, H] broadcasts
    # broadcast node-i term over its K edges; add gathered node-j term
    x = x.reshape(blk, K, H) + per_i_ref[...][:, None, :]
    x = act(x.reshape(blk * K, H) + pj_ref[...].astype(jnp.float32))
    x = _message_chain(x.astype(cd), w1_ref[...].astype(cd), b1_ref[...],
                       w2_ref[...].astype(cd), b2_ref[...], act)

    if pool:
        x = x.reshape(blk, K, H) * mask_ref[...][..., None]
        out_ref[...] = (x.sum(axis=1) / float(K)).astype(out_ref.dtype)
    else:
        out_ref[...] = x.astype(out_ref.dtype)


def _geom_fused_kernel(per_i_ref, pj_ref, he_ref, pl_ref, ng_ref, r_ref,
                       t_ref, mask_ref,
                       whe_ref, wg_ref, be_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                       out_ref, *, K: int, P: int, act_name: str, pool: bool,
                       compute_dtype):
    """Message kernel with the point-geometry features computed IN VMEM.

    The [blk*K, 9P] geometry block never touches HBM: inputs are the tiny
    per-node tensors (local point planes, frame rows) plus the gathered
    neighbor global-point planes, and the feature math runs on [blk, K, P]
    values between the block reads and the message matmuls. ``wg_ref`` rows
    must be pre-permuted to plane-major feature order (see
    ``_geom_weight_perm``).
    """
    blk = per_i_ref.shape[0]
    H = per_i_ref.shape[1]
    act = _act(act_name)
    cd = compute_dtype
    eps = 1e-8

    pl = pl_ref[...]                                   # [blk, 3P] f32 planes
    plx, ply, plz = pl[:, :P], pl[:, P:2 * P], pl[:, 2 * P:]
    R = r_ref[...]                                     # [blk, 9] rows R00..R22
    t = t_ref[...]                                     # [blk, 3]

    # global points of node i (same math/order as geometry_global_points)
    pgx = R[:, 0:1] * plx + R[:, 1:2] * ply + R[:, 2:3] * plz + t[:, 0:1]
    pgy = R[:, 3:4] * plx + R[:, 4:5] * ply + R[:, 5:6] * plz + t[:, 1:2]
    pgz = R[:, 6:7] * plx + R[:, 7:8] * ply + R[:, 8:9] * plz + t[:, 2:3]

    ng = ng_ref[...].reshape(blk, K, 3 * P)            # gathered neighbor planes
    ngx, ngy, ngz = ng[..., :P], ng[..., P:2 * P], ng[..., 2 * P:]

    col = lambda a, c: a[:, c:c + 1][:, :, None]       # [blk,1,1] broadcast
    dx = ngx - col(t, 0)
    dy = ngy - col(t, 1)
    dz = ngz - col(t, 2)
    # R_i^T rows: column c of R
    nlx = col(R, 0) * dx + col(R, 3) * dy + col(R, 6) * dz
    nly = col(R, 1) * dx + col(R, 4) * dy + col(R, 7) * dz
    nlz = col(R, 2) * dx + col(R, 5) * dy + col(R, 8) * dz

    norm_pl = jnp.sqrt(plx * plx + ply * ply + plz * plz + eps)   # [blk,P]
    norm_nl = jnp.sqrt(nlx * nlx + nly * nly + nlz * nlz + eps)   # [blk,K,P]
    ddx = pgx[:, None, :] - ngx
    ddy = pgy[:, None, :] - ngy
    ddz = pgz[:, None, :] - ngz
    norm_pair = jnp.sqrt(ddx * ddx + ddy * ddy + ddz * ddz + eps)

    bc = lambda a: jnp.broadcast_to(a[:, None, :], (blk, K, P))
    geom = jnp.concatenate([
        bc(plx), bc(ply), bc(plz), bc(norm_pl),
        nlx, nly, nlz, norm_nl, norm_pair,
    ], -1).reshape(blk * K, 9 * P)

    x = jnp.dot(he_ref[...].astype(cd), whe_ref[...].astype(cd),
                preferred_element_type=jnp.float32)
    x = x + jnp.dot(geom.astype(cd), wg_ref[...].astype(cd),
                    preferred_element_type=jnp.float32)
    x = x + be_ref[...]
    x = x.reshape(blk, K, H) + per_i_ref[...][:, None, :]
    x = act(x.reshape(blk * K, H) + pj_ref[...].astype(jnp.float32))
    x = _message_chain(x.astype(cd), w1_ref[...].astype(cd), b1_ref[...],
                       w2_ref[...].astype(cd), b2_ref[...], act)

    if pool:
        x = x.reshape(blk, K, H) * mask_ref[...][..., None]
        out_ref[...] = (x.sum(axis=1) / float(K)).astype(out_ref.dtype)
    else:
        out_ref[...] = x.astype(out_ref.dtype)


def _geom_weight_perm(P: int):
    """Row permutation taking Dense_e's geometry rows (feature order
    [flat_pl(xyz-interleaved) | norm_pl | flat_nl(interleaved) | norm_nl |
    norm_pair]) to the kernel's plane-major order
    [plx|ply|plz|norm_pl|nlx|nly|nlz|norm_nl|norm_pair]."""
    import numpy as np
    perm = np.empty(9 * P, dtype=np.int32)
    for c in range(3):
        for p in range(P):
            perm[c * P + p] = 3 * p + c                 # flat_pl
            perm[4 * P + c * P + p] = 4 * P + 3 * p + c  # flat_nl
    perm[3 * P:4 * P] = np.arange(3 * P, 4 * P)          # norm_pl
    perm[7 * P:8 * P] = np.arange(7 * P, 8 * P)          # norm_nl
    perm[8 * P:9 * P] = np.arange(8 * P, 9 * P)          # norm_pair
    return perm


@functools.partial(
    jax.jit,
    static_argnames=("K", "P", "act_name", "pool", "blk", "compute_dtype",
                     "interpret"))
def fused_message_geom(per_i, per_j_gathered, h_E, p_local_planes, ng_planes,
                       rot9, trans3, mask_attend,
                       w_he, w_g_perm, b_e, w1, b1, w2, b2,
                       K: int = 32, P: int = 8, act_name: str = "relu",
                       pool: bool = True, blk: int = 128,
                       compute_dtype=jnp.bfloat16, interpret: bool = False):
    """``fused_message`` with in-kernel geometry over one batch element.

    Args:
        p_local_planes: [L, 3P] f32 local point planes [plx|ply|plz].
        ng_planes: [L, K, 3P] f32 gathered neighbor global-point planes.
        rot9: [L, 9] f32 backbone rotation rows (row-major R00..R22).
        trans3: [L, 3] f32 frame translations.
        w_g_perm: [9P, H] Dense_e geometry rows, pre-permuted with
            ``_geom_weight_perm``.
    Other args/returns as ``fused_message``.
    """
    L, H = per_i.shape
    He = h_E.shape[-1]
    L_pad = -(-L // blk) * blk

    def pad_rows(x, rows):
        return jnp.pad(x, [(0, rows - x.shape[0])] + [(0, 0)] * (x.ndim - 1))

    per_i_p = pad_rows(per_i.astype(jnp.float32), L_pad)
    pj_p = pad_rows(per_j_gathered.reshape(L * K, H), L_pad * K)
    he_p = pad_rows(h_E.reshape(L * K, He), L_pad * K)
    pl_p = pad_rows(p_local_planes.astype(jnp.float32), L_pad)
    ng_p = pad_rows(ng_planes.reshape(L * K, 3 * P).astype(jnp.float32),
                    L_pad * K)
    r_p = pad_rows(rot9.astype(jnp.float32), L_pad)
    t_p = pad_rows(trans3.astype(jnp.float32), L_pad)
    mask_p = pad_rows(mask_attend.astype(jnp.float32), L_pad)

    grid = (L_pad // blk,)
    out_shape = (jax.ShapeDtypeStruct((L_pad, H), jnp.float32) if pool
                 else jax.ShapeDtypeStruct((L_pad * K, H), h_E.dtype))
    out_spec = (pl.BlockSpec((blk, H), lambda r: (r, 0), memory_space=pltpu.VMEM)
                if pool else
                pl.BlockSpec((blk * K, H), lambda r: (r, 0), memory_space=pltpu.VMEM))

    row = lambda cols: pl.BlockSpec((blk, cols), lambda r: (r, 0),
                                    memory_space=pltpu.VMEM)
    erow = lambda cols: pl.BlockSpec((blk * K, cols), lambda r: (r, 0),
                                     memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_geom_fused_kernel, K=K, P=P, act_name=act_name,
                          pool=pool, compute_dtype=compute_dtype),
        grid=grid,
        in_specs=[row(H), erow(H), erow(He), row(3 * P), erow(3 * P),
                  row(9), row(3), pl.BlockSpec((blk, K), lambda r: (r, 0),
                                               memory_space=pltpu.VMEM)]
                 + [full()] * 7,
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(per_i_p, pj_p, he_p, pl_p, ng_p, r_p, t_p, mask_p,
      w_he.astype(jnp.float32), w_g_perm.astype(jnp.float32),
      b_e.astype(jnp.float32).reshape(1, -1),
      w1.astype(jnp.float32), b1.astype(jnp.float32).reshape(1, -1),
      w2.astype(jnp.float32), b2.astype(jnp.float32).reshape(1, -1))

    if pool:
        return out[:L]
    return out[: L * K].reshape(L, K, H)


_LN_EPS = 1e-6  # flax.linen.LayerNorm default (keep with pallas_layer._ln)


def _ln_rows(x, scale, bias):
    m = jnp.mean(x, -1, keepdims=True)
    v = jnp.mean(x * x, -1, keepdims=True) - m * m
    return (x - m) * jax.lax.rsqrt(jnp.maximum(v, 0.0) + _LN_EPS) * scale + bias


def _geom_lanes_kernel(*refs, K: int, P: int, act_name: str,
                       pool: bool, compute_dtype, with_chain: bool = False):
    """Message kernel with LANE-MAJOR in-kernel geometry.

    The r4 ``_geom_fused_kernel`` was rejected because its geometry math ran
    on [blk, K, P] tiles — P=8 of the VPU's 128 lanes — and its AoS
    intermediates overflowed scoped VMEM at blk=128 (PERF.md "Geometry-in-
    kernel fused message"). Here every geometry intermediate is a
    [rows, C] tile with C = blk*K in the LANE dimension (full 128-lane
    occupancy; C is a multiple of 128), the layout the end-of-r4 re-profile
    named as the untried fix (PERF.md:231-234):

      * per-node quantities arrive as ONE row-major [blk, R] stack (see
        ``build_node_stack``) and are lane-expanded across each node's K
        edge lanes by an exact one-hot MXU contraction — bf16x3
        decomposition, see the in-body comment (plain bf16 would round
        global coordinates by ~0.5 A, the measured r4 failure mode;
        HIGHEST-precision f32 measured ~100x too slow at this shape);
      * the gathered neighbor planes arrive from the standard fast XLA
        ROW gather and are transposed to lane-major in VMEM (free);
      * the geometry feature block [9P, C] feeds the message matmul in
        transposed form (W_g^T @ feat_T on the MXU) and ONE [H, C]->[C, H]
        transpose rejoins the standard row-major message chain.

    The [L*K, 9P] feature tensor never touches HBM, and — unlike the AoS
    variant — nothing in VMEM is [.., K, P]-shaped.

    ``with_chain`` (edge passes only): the post-message residual->LN->FFN
    ->LN chain (ops.pallas_layer._chain_kernel semantics, pre_mask) runs in
    the SAME kernel, so the [C, H] message stream never round-trips HBM
    between the message and chain kernels; the kernel reads h_E once and
    writes the updated h_E once. The message->chain boundary rounding of
    the two-kernel path (message output written in the stream dtype) is
    reproduced with an explicit cast, so values are identical. The FFN
    tail is chunked over 1024-row slices to bound the [rows, 4H] hidden.
    """
    if with_chain:
        (per_i_ref, pj_ref, he_ref, nodeT_ref, ngT_ref, mask_ref,
         whe_ref, wgT_ref, be_ref, w1_ref, b1_ref, w2_ref, b2_ref,
         ln2s_ref, ln2b_ref, cf1_ref, cf1b_ref, cf2_ref, cf2b_ref,
         ln3s_ref, ln3b_ref, out_ref) = refs
    else:
        (per_i_ref, pj_ref, he_ref, nodeT_ref, ngT_ref, mask_ref,
         whe_ref, wgT_ref, be_ref, w1_ref, b1_ref, w2_ref, b2_ref,
         out_ref) = refs
    blk = per_i_ref.shape[0]
    H = per_i_ref.shape[1]
    C = blk * K
    act = _act(act_name)
    cd = compute_dtype
    f32 = jnp.float32
    eps = 1e-8

    # one-hot lane expansion: E[b, b*K + k] = 1 -> rep = node^T @ E. The
    # node stack arrives ROW-major ([blk, R] — a lane-dim block of the
    # transposed layout is not a legal Mosaic block shape); the transposed
    # contraction runs natively on the MXU via dot_general. Exactness
    # WITHOUT HIGHEST (which measured ~11-18 us/block here — 20-30 ms/pack,
    # the bulk of the v1 kernel's 33x slowdown): a bf16x3 decomposition —
    # f32 payload split into three bf16 terms (exactly, 3 x 8 mantissa
    # bits >= f32's 24), each expanded by a default-precision bf16 dot
    # (one-hot weights are exactly 1.0), f32-accumulated. Probed exact to
    # 0.0 at 100 A coordinate scale (tools/probe_lanes_cost.py).
    lane_node = jax.lax.broadcasted_iota(jnp.int32, (blk, C), 1) // K
    row_node = jax.lax.broadcasted_iota(jnp.int32, (blk, C), 0)
    E = (lane_node == row_node).astype(jnp.bfloat16)
    x_node = nodeT_ref[...]
    rep = jnp.zeros((nodeT_ref.shape[1], C), f32)
    for _ in range(3):
        hi = x_node.astype(jnp.bfloat16)
        rep = rep + jax.lax.dot_general(
            hi, E, (((0,), (0,)), ((), ())), preferred_element_type=f32)
        x_node = x_node - hi.astype(f32)                         # [R, C]

    plr = rep[0:3 * P]                                           # [3P, C]
    norm_plr = rep[3 * P:4 * P]                                  # [P, C]
    r_row = lambda i: rep[4 * P + i:4 * P + i + 1]               # [1, C]
    t_row = lambda i: rep[4 * P + 9 + i:4 * P + 10 + i]          # [1, C]
    pgr = rep[4 * P + 12:7 * P + 12]                             # [3P, C]

    # neighbor planes arrive ROW-major ([C, 3P] — the fast XLA row-gather
    # emitter's layout; a lane-dim take_along_axis measured ~25 ms/step)
    # and join the lane-major math through one free in-kernel transpose
    ngT = ngT_ref[...].T                                         # [3P, C] f32
    ngx, ngy, ngz = ngT[:P], ngT[P:2 * P], ngT[2 * P:]
    dx = ngx - t_row(0)
    dy = ngy - t_row(1)
    dz = ngz - t_row(2)
    # j's points in i's frame: R_i^T d (columns of the row-major R9)
    nlx = r_row(0) * dx + r_row(3) * dy + r_row(6) * dz
    nly = r_row(1) * dx + r_row(4) * dy + r_row(7) * dz
    nlz = r_row(2) * dx + r_row(5) * dy + r_row(8) * dz
    norm_nl = jnp.sqrt(nlx * nlx + nly * nly + nlz * nlz + eps)
    ddx = pgr[:P] - ngx
    ddy = pgr[P:2 * P] - ngy
    ddz = pgr[2 * P:] - ngz
    norm_pair = jnp.sqrt(ddx * ddx + ddy * ddy + ddz * ddz + eps)

    featT = jnp.concatenate([plr, norm_plr, nlx, nly, nlz, norm_nl,
                             norm_pair], axis=0)                 # [9P, C]
    # W_g^T @ feat_T on the MXU; ONE transpose rejoins row-major layout
    msg_gT = jnp.dot(wgT_ref[...].astype(cd), featT.astype(cd),
                     preferred_element_type=f32)                 # [H, C]
    msg_g = msg_gT.T                                             # [C, H]

    x = jnp.dot(he_ref[...].astype(cd), whe_ref[...].astype(cd),
                preferred_element_type=f32)
    x = x + msg_g + be_ref[...]
    x = x.reshape(blk, K, H) + per_i_ref[...][:, None, :]
    x = act(x.reshape(C, H) + pj_ref[...].astype(f32))
    x = _message_chain(x.astype(cd), w1_ref[...].astype(cd), b1_ref[...],
                       w2_ref[...].astype(cd), b2_ref[...], act)

    if pool:
        x = x.reshape(blk, K, H) * mask_ref[...][..., None]
        out_ref[...] = (x.sum(axis=1) / float(K)).astype(out_ref.dtype)
        return
    if not with_chain:
        out_ref[...] = x.astype(out_ref.dtype)
        return

    # ---- in-kernel edge chain (pallas_layer._chain_kernel, pre_mask) ----
    sd = he_ref.dtype
    rnd = lambda v: v.astype(sd).astype(f32)
    hp = (jax.lax.Precision.HIGHEST
          if jnp.dtype(cd) == jnp.float32 else None)
    ma = mask_ref[...]                                           # [blk, K]
    # the two-kernel boundary: message output rounds to the stream dtype;
    # pre_mask multiplies in that dtype (0/1 mask — exact)
    m = (x.astype(sd).reshape(blk, K, H)
         * ma[..., None].astype(sd)).reshape(C, H)
    x0 = (he_ref[...] + m).astype(f32)
    CH = 1024 if C % 1024 == 0 else C
    for c0 in range(0, C, CH):
        sl = slice(c0, c0 + CH)
        xx = rnd(_ln_rows(x0[sl], ln2s_ref[...], ln2b_ref[...]))
        h = rnd(act(rnd(jnp.dot(xx.astype(cd), cf1_ref[...].astype(cd),
                                preferred_element_type=f32, precision=hp)
                        + cf1b_ref[...])))
        h = rnd(jnp.dot(h.astype(cd), cf2_ref[...].astype(cd),
                        preferred_element_type=f32, precision=hp)
                + cf2b_ref[...])
        y = _ln_rows(xx + h, ln3s_ref[...], ln3b_ref[...])
        bc = CH // K
        y = (y.reshape(bc, K, H)
             * ma[c0 // K:(c0 + CH) // K][..., None]).reshape(CH, H)
        out_ref[sl, :] = y.astype(out_ref.dtype)


def _geom_gather_kernel(per_i_ref, he_ref, nodeT_ref, idx_ref, perj_ref,
                        pg_ref, mask_ref,
                        whe_ref, wgT_ref, be_ref, w1_ref, b1_ref, w2_ref,
                        b2_ref, out_ref, *, K: int, P: int, L: int,
                        act_name: str, pool: bool, compute_dtype):
    """``_geom_lanes_kernel`` with the neighbor GATHERS inside too.

    The end-of-r5 attribution puts 52% of the remaining pack time in the
    XLA row gathers (j-term + neighbor planes, ~3x their traffic floor).
    Here both ride ONE one-hot MXU contraction per block: oh[c, l] =
    (idx[c] == l), then

        pjg = oh @ per_j          (stream-dtype payload — exact: one-hot
                                   weights are 1.0 and bf16 x bf16
                                   accumulates in f32)
        ng  = sum_3 oh @ pg_term  (f32 payload via the exact bf16x3
                                   decomposition, see the lane expansion)

    so neither gathered stream ever exists in HBM: the [C, H] j-term and
    the [C, 3P] neighbor planes are consumed by the message assembly in
    VMEM. Inputs are the FULL (small) per-node tables: per_j [L, H] in the
    stream dtype and pg [L, 3P] f32.
    """
    blk = per_i_ref.shape[0]
    H = per_i_ref.shape[1]
    C = blk * K
    act = _act(act_name)
    cd = compute_dtype
    f32 = jnp.float32
    eps = 1e-8

    # ---- in-kernel gathers: one one-hot per block, two payloads --------
    iv = idx_ref[...]                                            # [C] int32
    oh = (iv[:, None] == jax.lax.broadcasted_iota(
        jnp.int32, (1, L), 1)).astype(jnp.bfloat16)              # [C, L]

    def select(payload, width):
        """oh @ payload, exact: bf16 payloads in one dot (one-hot weights
        are exactly 1.0, f32 accumulation); f32 payloads via the bf16x3
        decomposition."""
        if payload.dtype == jnp.bfloat16:
            return jnp.dot(oh, payload, preferred_element_type=f32)
        acc = jnp.zeros((C, width), f32)
        x = payload.astype(f32)
        for _ in range(3):
            hi = x.astype(jnp.bfloat16)
            acc = acc + jnp.dot(oh, hi, preferred_element_type=f32)
            x = x - hi.astype(f32)
        return acc

    pj = select(perj_ref[...], H)                                # [C, H]
    ngT = select(pg_ref[...], 3 * P).T                           # [3P, C]

    # ---- lane expansion of the per-node stack (see _geom_lanes_kernel) -
    lane_node = jax.lax.broadcasted_iota(jnp.int32, (blk, C), 1) // K
    row_node = jax.lax.broadcasted_iota(jnp.int32, (blk, C), 0)
    E = (lane_node == row_node).astype(jnp.bfloat16)
    x_node = nodeT_ref[...]
    rep = jnp.zeros((nodeT_ref.shape[1], C), f32)
    for _ in range(3):
        hi = x_node.astype(jnp.bfloat16)
        rep = rep + jax.lax.dot_general(
            hi, E, (((0,), (0,)), ((), ())), preferred_element_type=f32)
        x_node = x_node - hi.astype(f32)

    plr = rep[0:3 * P]
    norm_plr = rep[3 * P:4 * P]
    r_row = lambda i: rep[4 * P + i:4 * P + i + 1]
    t_row = lambda i: rep[4 * P + 9 + i:4 * P + 10 + i]
    pgr = rep[4 * P + 12:7 * P + 12]

    ngx, ngy, ngz = ngT[:P], ngT[P:2 * P], ngT[2 * P:]
    dx = ngx - t_row(0)
    dy = ngy - t_row(1)
    dz = ngz - t_row(2)
    nlx = r_row(0) * dx + r_row(3) * dy + r_row(6) * dz
    nly = r_row(1) * dx + r_row(4) * dy + r_row(7) * dz
    nlz = r_row(2) * dx + r_row(5) * dy + r_row(8) * dz
    norm_nl = jnp.sqrt(nlx * nlx + nly * nly + nlz * nlz + eps)
    ddx = pgr[:P] - ngx
    ddy = pgr[P:2 * P] - ngy
    ddz = pgr[2 * P:] - ngz
    norm_pair = jnp.sqrt(ddx * ddx + ddy * ddy + ddz * ddz + eps)

    featT = jnp.concatenate([plr, norm_plr, nlx, nly, nlz, norm_nl,
                             norm_pair], axis=0)                 # [9P, C]
    msg_gT = jnp.dot(wgT_ref[...].astype(cd), featT.astype(cd),
                     preferred_element_type=f32)                 # [H, C]
    msg_g = msg_gT.T                                             # [C, H]

    x = jnp.dot(he_ref[...].astype(cd), whe_ref[...].astype(cd),
                preferred_element_type=f32)
    x = x + msg_g + be_ref[...]
    x = x.reshape(blk, K, H) + per_i_ref[...][:, None, :]
    # pj carries exactly the values the unfused path's gathered j-term has
    # (bf16 stream: exactly-bf16 floats in f32; f32 stream: exact f32)
    x = act(x.reshape(C, H) + pj)
    x = _message_chain(x.astype(cd), w1_ref[...].astype(cd), b1_ref[...],
                       w2_ref[...].astype(cd), b2_ref[...], act)

    if pool:
        x = x.reshape(blk, K, H) * mask_ref[...][..., None]
        out_ref[...] = (x.sum(axis=1) / float(K)).astype(out_ref.dtype)
    else:
        out_ref[...] = x.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("K", "P", "act_name", "pool", "blk", "compute_dtype",
                     "interpret"))
def fused_message_geom_gather(per_i, h_E, node_stackT, idx_flat, per_j, pg,
                              mask_attend,
                              w_he, w_g_perm, b_e, w1, b1, w2, b2,
                              K: int = 32, P: int = 8, act_name: str = "relu",
                              pool: bool = True, blk: int = 64,
                              compute_dtype=jnp.bfloat16,
                              interpret: bool = False):
    """``fused_message_geom_lanes`` with IN-KERNEL one-hot gathers over one
    batch element (see ``_geom_gather_kernel``).

    Args:
        idx_flat: [L*K] int32 flattened neighbor indices.
        per_j: [L, H] ungathered j-term table, stream dtype.
        pg: [L, 3P] f32 global point planes (ungathered).
    Other args/returns as ``fused_message_geom_lanes``.
    """
    L, H = per_i.shape
    He = h_E.shape[-1]
    L_pad = -(-L // blk) * blk
    R = node_stackT.shape[-1]

    def pad_rows(x, rows):
        return jnp.pad(x, [(0, rows - x.shape[0])] + [(0, 0)] * (x.ndim - 1))

    per_i_p = pad_rows(per_i.astype(jnp.float32), L_pad)
    he_p = pad_rows(h_E.reshape(L * K, He), L_pad * K)
    nodeT_p = pad_rows(node_stackT.astype(jnp.float32), L_pad)
    idx_p = jnp.pad(idx_flat.astype(jnp.int32),
                    (0, L_pad * K - idx_flat.shape[0]))
    mask_p = pad_rows(mask_attend.astype(jnp.float32), L_pad)

    grid = (L_pad // blk,)
    out_shape = (jax.ShapeDtypeStruct((L_pad, H), jnp.float32) if pool
                 else jax.ShapeDtypeStruct((L_pad * K, H), h_E.dtype))
    out_spec = (pl.BlockSpec((blk, H), lambda r: (r, 0), memory_space=pltpu.VMEM)
                if pool else
                pl.BlockSpec((blk * K, H), lambda r: (r, 0), memory_space=pltpu.VMEM))

    row = lambda cols: pl.BlockSpec((blk, cols), lambda r: (r, 0),
                                    memory_space=pltpu.VMEM)
    erow = lambda cols: pl.BlockSpec((blk * K, cols), lambda r: (r, 0),
                                     memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_geom_gather_kernel, K=K, P=P, L=L,
                          act_name=act_name, pool=pool,
                          compute_dtype=compute_dtype),
        grid=grid,
        in_specs=[row(H), erow(He), row(R),
                  pl.BlockSpec((blk * K,), lambda r: (r,),
                               memory_space=pltpu.VMEM),
                  full(), full(),
                  pl.BlockSpec((blk, K), lambda r: (r, 0),
                               memory_space=pltpu.VMEM)]
                 + [full()] * 7,
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(per_i_p, he_p, nodeT_p, idx_p, per_j, pg.astype(jnp.float32), mask_p,
      w_he.astype(jnp.float32),
      w_g_perm.astype(jnp.float32).T,
      b_e.astype(jnp.float32).reshape(1, -1),
      w1.astype(jnp.float32), b1.astype(jnp.float32).reshape(1, -1),
      w2.astype(jnp.float32), b2.astype(jnp.float32).reshape(1, -1))

    if pool:
        return out[:L]
    return out[: L * K].reshape(L, K, H)


def _node_stack_rows(P: int) -> int:
    """Sublane row count of the per-node transposed stack consumed by
    ``_geom_lanes_kernel``: [pl planes (3P) | norm_pl (P) | R9 (9) |
    t3 (3) | pg planes (3P)], padded to a multiple of 8 (f32 tiling)."""
    r = 7 * P + 12
    return -(-r // 8) * 8


def build_node_stack(p_local_planes, norm_pl, rot9, trans3, pg_planes):
    """[L, R_pad] per-node stack (row-major; transposed by the caller of
    the kernel) in ``_geom_lanes_kernel``'s row layout."""
    P = norm_pl.shape[-1]
    stack = jnp.concatenate(
        [p_local_planes, norm_pl, rot9, trans3, pg_planes], axis=-1)
    pad = _node_stack_rows(P) - stack.shape[-1]
    if pad:
        stack = jnp.pad(stack, [(0, 0)] * (stack.ndim - 1) + [(0, pad)])
    return stack


@functools.partial(
    jax.jit,
    static_argnames=("K", "P", "act_name", "pool", "blk", "compute_dtype",
                     "interpret"))
def fused_message_geom_lanes(per_i, per_j_gathered, h_E, node_stackT,
                             ngT, mask_attend,
                             w_he, w_g_perm, b_e, w1, b1, w2, b2,
                             chain_weights=None,
                             K: int = 32, P: int = 8, act_name: str = "relu",
                             pool: bool = True, blk: int = 128,
                             compute_dtype=jnp.bfloat16,
                             interpret: bool = False):
    """``fused_message`` with lane-major in-kernel geometry over one batch
    element (see ``_geom_lanes_kernel``).

    Args:
        node_stackT: [L, R_pad] f32 per-node stack, ROW-major
            (``build_node_stack(...)``; the kernel contracts its transpose
            on the MXU — a lane-dim block of the transposed layout is not
            a legal Mosaic block shape).
        ngT: [L, K, 3P] f32 gathered neighbor global-point planes,
            ROW-major (``gather_nodes(pg_planes, idx)`` — the fast row
            gather; the kernel transposes each block in VMEM).
        w_g_perm: [9P, H] Dense_e geometry rows pre-permuted with
            ``_geom_weight_perm`` (same plane-major order as the AoS geom
            kernel).
    Other args/returns as ``fused_message``.
    """
    L, H = per_i.shape
    He = h_E.shape[-1]
    L_pad = -(-L // blk) * blk
    R = node_stackT.shape[-1]

    def pad_rows(x, rows):
        return jnp.pad(x, [(0, rows - x.shape[0])] + [(0, 0)] * (x.ndim - 1))

    def pad_lanes(x, cols):
        return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, cols - x.shape[-1])])

    per_i_p = pad_rows(per_i.astype(jnp.float32), L_pad)
    pj_p = pad_rows(per_j_gathered.reshape(L * K, H), L_pad * K)
    he_p = pad_rows(h_E.reshape(L * K, He), L_pad * K)
    nodeT_p = pad_rows(node_stackT.astype(jnp.float32), L_pad)
    ngT_p = pad_rows(ngT.reshape(L * K, -1).astype(jnp.float32), L_pad * K)
    mask_p = pad_rows(mask_attend.astype(jnp.float32), L_pad)

    grid = (L_pad // blk,)
    out_shape = (jax.ShapeDtypeStruct((L_pad, H), jnp.float32) if pool
                 else jax.ShapeDtypeStruct((L_pad * K, H), h_E.dtype))
    out_spec = (pl.BlockSpec((blk, H), lambda r: (r, 0), memory_space=pltpu.VMEM)
                if pool else
                pl.BlockSpec((blk * K, H), lambda r: (r, 0), memory_space=pltpu.VMEM))

    row = lambda cols: pl.BlockSpec((blk, cols), lambda r: (r, 0),
                                    memory_space=pltpu.VMEM)
    erow = lambda cols: pl.BlockSpec((blk * K, cols), lambda r: (r, 0),
                                     memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    with_chain = chain_weights is not None and not pool
    _row2 = lambda a: a.astype(jnp.float32).reshape(1, -1)
    extra_args = ()
    if with_chain:
        ln2s, ln2b, cf1, cf1b, cf2, cf2b, ln3s, ln3b = chain_weights
        extra_args = (_row2(ln2s), _row2(ln2b),
                      cf1.astype(jnp.float32), _row2(cf1b),
                      cf2.astype(jnp.float32), _row2(cf2b),
                      _row2(ln3s), _row2(ln3b))

    out = pl.pallas_call(
        functools.partial(_geom_lanes_kernel, K=K, P=P, act_name=act_name,
                          pool=pool, compute_dtype=compute_dtype,
                          with_chain=with_chain),
        grid=grid,
        in_specs=[row(H), erow(H), erow(He),
                  row(R), erow(3 * P),
                  pl.BlockSpec((blk, K), lambda r: (r, 0),
                               memory_space=pltpu.VMEM)]
                 + [full()] * (7 + len(extra_args)),
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(per_i_p, pj_p, he_p, nodeT_p, ngT_p, mask_p,
      w_he.astype(jnp.float32),
      w_g_perm.astype(jnp.float32).T,             # [H, 9P] for W^T @ feat_T
      b_e.astype(jnp.float32).reshape(1, -1),
      w1.astype(jnp.float32), b1.astype(jnp.float32).reshape(1, -1),
      w2.astype(jnp.float32), b2.astype(jnp.float32).reshape(1, -1),
      *extra_args)

    if pool:
        return out[:L]
    return out[: L * K].reshape(L, K, H)


@functools.partial(
    jax.jit,
    static_argnames=("K", "act_name", "pool", "blk", "compute_dtype", "interpret"))
def fused_message(per_i, per_j_gathered, h_E, geom, mask_attend,
                  w_he, w_g, b_e, w1, b1, w2, b2,
                  K: int = 32, act_name: str = "relu", pool: bool = True,
                  blk: int = 128, compute_dtype=jnp.bfloat16,
                  interpret: bool = False):
    """Fused message MLP over one batch element.

    Args:
        per_i: [L, H] node-i first-layer contribution (Dense_i output).
        per_j_gathered: [L, K, H] gathered node-j contributions.
        h_E: [L, K, He] edge features.
        geom: [L, K, G] frame-invariant point features.
        mask_attend: [L, K] edge validity.
        w_he/w_g/b_e, w1/b1, w2/b2: FactoredMessageMLP weights.

    Returns: [L, H] pooled node messages (pool=True) or [L, K, H] edge
    messages (pool=False).
    """
    L, H = per_i.shape
    He = h_E.shape[-1]
    G = geom.shape[-1]
    L_pad = -(-L // blk) * blk

    def pad_rows(x, rows):
        return jnp.pad(x, [(0, rows - x.shape[0])] + [(0, 0)] * (x.ndim - 1))

    # inputs enter the kernel in their OWN dtype (bf16 streams on the
    # inference path — forcing f32 here doubled the kernel's HBM input
    # traffic, the dominant cost of this bandwidth-bound op); the edge
    # output is written in the h_E stream dtype (identical values: the
    # caller cast the f32 result to the stream dtype anyway, and the 0/1
    # mask multiply commutes with the rounding)
    per_i_p = pad_rows(per_i.astype(jnp.float32), L_pad)
    pj_p = pad_rows(per_j_gathered.reshape(L * K, H), L_pad * K)
    he_p = pad_rows(h_E.reshape(L * K, He), L_pad * K)
    geom_p = pad_rows(geom.reshape(L * K, G), L_pad * K)
    mask_p = pad_rows(mask_attend.astype(jnp.float32), L_pad)

    grid = (L_pad // blk,)
    out_shape = (jax.ShapeDtypeStruct((L_pad, H), jnp.float32) if pool
                 else jax.ShapeDtypeStruct((L_pad * K, H), h_E.dtype))
    out_spec = (pl.BlockSpec((blk, H), lambda r: (r, 0), memory_space=pltpu.VMEM)
                if pool else
                pl.BlockSpec((blk * K, H), lambda r: (r, 0), memory_space=pltpu.VMEM))

    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fused_kernel, K=K, act_name=act_name, pool=pool,
                          compute_dtype=compute_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((blk, H), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk * K, H), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk * K, He), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk * K, G), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, K), lambda r: (r, 0), memory_space=pltpu.VMEM),
            full(), full(), full(), full(), full(), full(), full(),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(per_i_p, pj_p, he_p, geom_p, mask_p,
      w_he.astype(jnp.float32), w_g.astype(jnp.float32),
      b_e.astype(jnp.float32).reshape(1, -1),
      w1.astype(jnp.float32), b1.astype(jnp.float32).reshape(1, -1),
      w2.astype(jnp.float32), b2.astype(jnp.float32).reshape(1, -1))

    if pool:
        return out[:L]
    return out[: L * K].reshape(L, K, H)


def _reference_message(per_i, pj, he, geom, mask, w_he, w_g, b_e, w1, b1,
                       w2, b2, *, K: int, act_name: str, pool: bool,
                       compute_dtype):
    """jnp twin of ``_fused_kernel`` — identical math and cast points
    (weights in f32 like the kernel's call-site casts, activations cast to
    ``compute_dtype`` before each MXU dot, f32 accumulation). Used only to
    derive the backward pass of ``fused_message_diff``."""
    act = _act(act_name)
    cd = jnp.dtype(compute_dtype)
    L, H = per_i.shape
    f32 = jnp.float32
    x = jnp.dot(he.reshape(L * K, -1).astype(cd), w_he.astype(f32).astype(cd),
                preferred_element_type=f32)
    x = x + jnp.dot(geom.reshape(L * K, -1).astype(cd),
                    w_g.astype(f32).astype(cd), preferred_element_type=f32)
    x = x + b_e.astype(f32)
    x = x.reshape(L, K, H) + per_i.astype(f32)[:, None, :]
    x = act(x.reshape(L * K, H) + pj.reshape(L * K, H).astype(f32))
    x = act(jnp.dot(x.astype(cd), w1.astype(f32).astype(cd),
                    preferred_element_type=f32) + b1.astype(f32))
    x = jnp.dot(x.astype(cd), w2.astype(f32).astype(cd),
                preferred_element_type=f32) + b2.astype(f32)
    if pool:
        x = x.reshape(L, K, H) * mask.astype(f32)[..., None]
        return x.sum(axis=1) / float(K)
    return x.reshape(L, K, H).astype(he.dtype)


@functools.lru_cache(maxsize=None)
def _make_fused_message_diff(K: int, act_name: str, pool: bool, blk: int,
                             compute_dtype_name: str, interpret: bool):
    """Build (and cache per static config) the custom-VJP-wrapped kernel."""
    cd = jnp.dtype(compute_dtype_name)
    kw = dict(K=K, act_name=act_name, pool=pool, compute_dtype=cd)

    def primal(per_i, pj, he, geom, mask, w_he, w_g, b_e, w1, b1, w2, b2):
        return fused_message(per_i, pj, he, geom, mask, w_he, w_g, b_e,
                             w1, b1, w2, b2, blk=blk, interpret=interpret, **kw)

    @jax.custom_vjp
    def f(per_i, pj, he, geom, mask, w_he, w_g, b_e, w1, b1, w2, b2):
        return primal(per_i, pj, he, geom, mask, w_he, w_g, b_e, w1, b1, w2, b2)

    def fwd(*args):
        return primal(*args), args

    def bwd(res, g):
        _, vjp = jax.vjp(lambda *a: _reference_message(*a, **kw), *res)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def fused_message_diff(per_i, per_j_gathered, h_E, geom, mask_attend,
                       w_he, w_g, b_e, w1, b1, w2, b2,
                       K: int = 32, act_name: str = "relu", pool: bool = True,
                       blk: int = 128, compute_dtype=jnp.bfloat16,
                       interpret: bool = False):
    """``fused_message`` with gradients: Pallas kernel forward, rematerialized
    jnp backward (see module docstring). Same signature/shapes."""
    f = _make_fused_message_diff(K, act_name, pool, blk,
                                 jnp.dtype(compute_dtype).name, interpret)
    return f(per_i, per_j_gathered, h_E, geom, mask_attend,
             w_he, w_g, b_e, w1, b1, w2, b2)
