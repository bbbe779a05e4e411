"""Pallas TPU kernels: step-fused IPMP layer (inference).

The fused *message* kernel (ops.pallas_ipmp) keeps one message-MLP chain in
VMEM, but between message ops XLA still materializes every [L*K, hidden]
edge-stream tensor in HBM: the residual adds, two LayerNorms and the
4x-hidden FFN of each edge update, plus the f32 copies at the kernel
boundary. PERF.md's roofline shows the sampler is bound by exactly this
traffic (~0.9 GB/eval, batching anti-scales because the [L, K, ~700]
working set spills at B>=2).

This module fuses a whole InvariantPointLayer (reference:
src/models/components/layers.py:36-148) into two Pallas passes per layer:

  pass A (node): message chain -> masked mean over K -> residual -> LN ->
                 4H FFN -> residual -> LN -> node mask; writes only the
                 [L, H] updated node stream.
  pass B (edge): message chain (pool=False) -> edge mask -> residual -> LN
                 -> 4H FFN -> residual -> LN -> edge mask; the [L*K, H]
                 stream is read once and written once per layer.

Everything between the block reads and the block write lives in VMEM.
The cheap [L]-sized pieces (point projections, per-node factored matmuls,
geometry SoA features, neighbor gathers) stay in XLA where they are already
bandwidth-optimal; their outputs enter the kernels in the compute dtype
(bf16 on the inference path) instead of the f32 copies the message kernel
used.

Two passes per layer (not one, not the whole stack) is forced by data
dependence: pass B consumes the *updated* h_V of arbitrary neighbors, so
all node rows must be written before any edge row starts; likewise the next
layer needs all edge rows. Forward-only: sampling/inference use it;
training takes the unfused differentiable path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# tests flip this to route the kernels through the interpreter on CPU
INTERPRET = False

_LN_EPS = 1e-6  # flax.linen.LayerNorm default


def _act(name: str):
    # keep in lockstep with models/layers._ACTS (fused/unfused parity)
    from packppi_tpu.ops.pallas_ipmp import _act as _shared_act
    return _shared_act(name)


def _ln(x, scale, bias):
    """LayerNorm in f32 with flax's fast-variance formula."""
    m = jnp.mean(x, -1, keepdims=True)
    v = jnp.mean(x * x, -1, keepdims=True) - m * m
    return (x - m) * jax.lax.rsqrt(jnp.maximum(v, 0.0) + _LN_EPS) * scale + bias


def _chain_kernel(x_ref, msg_ref, mask_ref,
                  lna_s_ref, lna_b_ref, f1_ref, f1b_ref, f2_ref, f2b_ref,
                  lnb_s_ref, lnb_b_ref, out_ref, *, act_name, compute_dtype,
                  pre_mask: bool, use_mask: bool):
    """Post-message chain of one IPMP residual block, row-local:

        [msg *= mask]  (edge chains mask the message before the residual)
        x = LN(x + msg) -> x = LN(x + FFN(x)) -> [x *= mask]

    Stream dtype = ``x_ref.dtype`` (bf16 on the inference path); LN math in
    f32 with roundings at every point the unfused flax chain rounds (same
    ``rnd`` convention as ``_node_kernel``/``_edge_kernel`` above, which is
    parity-tested against the flax path)."""
    act = _act(act_name)
    cd = compute_dtype
    sd = x_ref.dtype
    f32 = jnp.float32
    rnd = lambda v: v.astype(sd).astype(f32)

    m = msg_ref[...]
    if use_mask and pre_mask:
        m = m * mask_ref[...].astype(m.dtype)
    # the unfused residual adds in the stream dtype (both operands sd)
    x0 = (x_ref[...] + m.astype(sd)).astype(f32)
    x = rnd(_ln(x0, lna_s_ref[...], lna_b_ref[...]))
    # HIGHEST on the f32 path only: Mosaic's DEFAULT-precision pass rounds
    # f32 operands to bf16; HIGHEST makes the kernel's FFN dots exact f32.
    # (A ~1e-2 on-chip diff vs the UNFUSED f32 chain remains — that is the
    # unfused flax Dense's own default-precision rounding, the same
    # bf16-noise-scale delta the accepted fused_layers path carries;
    # interpret-mode f32 parity is exact to 3e-5, tests/test_model.py.)
    # bf16 operands must keep the default — Mosaic rejects an fp32-precision
    # contract on bf16 vectors ("Bad lhs type").
    hp = (jax.lax.Precision.HIGHEST
          if jnp.dtype(cd) == jnp.float32 else None)
    h = rnd(act(rnd(jnp.dot(x.astype(cd), f1_ref[...].astype(cd),
                            preferred_element_type=f32, precision=hp)
                    + f1b_ref[...])))
    h = rnd(jnp.dot(h.astype(cd), f2_ref[...].astype(cd),
                    preferred_element_type=f32, precision=hp) + f2b_ref[...])
    y = _ln(x + h, lnb_s_ref[...], lnb_b_ref[...])
    if use_mask:
        y = y * mask_ref[...]
    out_ref[...] = y.astype(out_ref.dtype)


def fused_chain(x, msg, mask,
                lna_scale, lna_bias, f1, f1b, f2, f2b, lnb_scale, lnb_bias,
                act_name: str = "relu", compute_dtype=jnp.float32,
                pre_mask: bool = False, interpret: bool | None = None):
    """Fused residual->LN->FFN->LN chain over flat [N, H] rows.

    Replaces the 6-8 XLA ops after each message pass (residual adds, two
    LayerNorms, the 4H FFN matmuls, mask multiplies) with ONE Pallas pass:
    the [N, H] stream is read once and written once, and the [N, 4H] FFN
    hidden never touches HBM. Row-local math, so node ([B*L, H]) and edge
    ([B*L*K, H]) chains share the kernel and batches are flattened into N.

    Args:
        x: [N, H] stream (node h_V or edge h_E rows), stream dtype.
        msg: [N, H] message output (f32 from the pooled node kernel, stream
            dtype from the edge kernel — cast to the stream dtype in-kernel,
            matching the unfused ``msg.astype(sd)``).
        mask: [N, 1] f32 0/1 validity, or None (no masking).
        pre_mask: also mask ``msg`` before the residual (edge chains).
    Returns [N, H] in the stream dtype.
    """
    # resolve the module-global test hook OUTSIDE the jitted function (as
    # fused_ipmp_layer does): resolving inside the trace baked the value at
    # first trace into the jit cache, so later INTERPRET flips silently did
    # not apply to already-cached (shape, statics) signatures
    if interpret is None:
        interpret = INTERPRET
    return _fused_chain_jit(
        x, msg, mask, lna_scale, lna_bias, f1, f1b, f2, f2b, lnb_scale,
        lnb_bias, act_name=act_name, compute_dtype=compute_dtype,
        pre_mask=pre_mask, interpret=interpret)


@functools.partial(
    jax.jit,
    static_argnames=("act_name", "compute_dtype", "pre_mask", "interpret"))
def _fused_chain_jit(x, msg, mask,
                     lna_scale, lna_bias, f1, f1b, f2, f2b, lnb_scale,
                     lnb_bias, act_name: str, compute_dtype,
                     pre_mask: bool, interpret: bool):
    N, H = x.shape
    use_mask = mask is not None
    if mask is None:
        mask = jnp.ones((1, 1), jnp.float32)  # placeholder operand (unread)
    blk = 1024 if N % 1024 == 0 else 256
    N_pad = -(-N // blk) * blk

    def pad_rows(a, rows):
        return jnp.pad(a, [(0, rows - a.shape[0]), (0, 0)])

    x_p = pad_rows(x, N_pad)
    msg_p = pad_rows(msg, N_pad)
    mask_p = pad_rows(mask.astype(jnp.float32), N_pad) if use_mask else mask

    blkspec = lambda cols: pl.BlockSpec((blk, cols), lambda r: (r, 0),
                                        memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_chain_kernel, act_name=act_name,
                          compute_dtype=compute_dtype, pre_mask=pre_mask,
                          use_mask=use_mask),
        grid=(N_pad // blk,),
        in_specs=[blkspec(H), blkspec(H),
                  blkspec(1) if use_mask else full()] + [full()] * 8,
        out_specs=blkspec(H),
        out_shape=jax.ShapeDtypeStruct((N_pad, H), x.dtype),
        interpret=interpret,
    )(x_p, msg_p, mask_p,
      _row(lna_scale.astype(jnp.float32)), _row(lna_bias.astype(jnp.float32)),
      f1.astype(jnp.float32), _row(f1b.astype(jnp.float32)),
      f2.astype(jnp.float32), _row(f2b.astype(jnp.float32)),
      _row(lnb_scale.astype(jnp.float32)), _row(lnb_bias.astype(jnp.float32)))
    return out[:N]


def _chain_jnp(x, msg, mask, lna_s, lna_b, f1, f1b, f2, f2b, lnb_s, lnb_b,
               *, act_name, compute_dtype, pre_mask, use_mask):
    """jnp twin of ``_chain_kernel`` — identical math and cast points
    (weights in f32 like the kernel call-site casts, activations cast to
    ``compute_dtype`` before each MXU dot, f32 accumulation, the same
    stream-dtype roundings). Used only to derive the backward pass of
    ``fused_chain_diff``."""
    act = _act(act_name)
    cd = compute_dtype
    sd = x.dtype
    f32 = jnp.float32
    rnd = lambda v: v.astype(sd).astype(f32)
    w = lambda a: a.astype(f32)

    m = msg
    if use_mask and pre_mask:
        m = m * mask.astype(m.dtype)
    x0 = (x + m.astype(sd)).astype(f32)
    xx = rnd(_ln(x0, w(lna_s), w(lna_b)))
    hp = (jax.lax.Precision.HIGHEST
          if jnp.dtype(cd) == jnp.float32 else None)
    h = rnd(act(rnd(jnp.dot(xx.astype(cd), w(f1).astype(cd),
                            preferred_element_type=f32, precision=hp)
                    + w(f1b))))
    h = rnd(jnp.dot(h.astype(cd), w(f2).astype(cd),
                    preferred_element_type=f32, precision=hp) + w(f2b))
    y = _ln(xx + h, w(lnb_s), w(lnb_b))
    if use_mask:
        y = y * mask.astype(f32)
    return y.astype(sd)


@functools.lru_cache(maxsize=None)
def _make_fused_chain_diff(act_name: str, compute_dtype_name: str,
                           pre_mask: bool, use_mask: bool, interpret: bool):
    """Build (and cache per static config) the custom-VJP-wrapped chain:
    Pallas kernel forward, rematerialized jnp backward (the
    ``fused_message_diff`` pattern — the chain is cheap to replay and the
    replay reuses XLA's own backward codegen, so training pays one extra
    forward-chain instead of storing kernel intermediates)."""
    cd = jnp.dtype(compute_dtype_name)
    kw = dict(act_name=act_name, compute_dtype=cd, pre_mask=pre_mask)

    def primal(x, msg, mask, lna_s, lna_b, f1, f1b, f2, f2b, lnb_s, lnb_b):
        return fused_chain(x, msg, mask if use_mask else None,
                           lna_s, lna_b, f1, f1b, f2, f2b, lnb_s, lnb_b,
                           interpret=interpret, **kw)

    @jax.custom_vjp
    def f(x, msg, mask, lna_s, lna_b, f1, f1b, f2, f2b, lnb_s, lnb_b):
        return primal(x, msg, mask, lna_s, lna_b, f1, f1b, f2, f2b,
                      lnb_s, lnb_b)

    def fwd(*args):
        return primal(*args), args

    def bwd(res, g):
        _, vjp = jax.vjp(lambda *a: _chain_jnp(*a, use_mask=use_mask, **kw),
                         *res)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def fused_chain_diff(x, msg, mask,
                     lna_scale, lna_bias, f1, f1b, f2, f2b,
                     lnb_scale, lnb_bias,
                     act_name: str = "relu", compute_dtype=jnp.float32,
                     pre_mask: bool = False, interpret: bool | None = None):
    """``fused_chain`` with gradients (same signature/shapes): custom-VJP
    forward = the Pallas kernel, backward = jnp replay of the identical
    chain math. Without a grad trace this is exactly ``fused_chain``
    (custom_vjp costs nothing on the primal path), so inference and
    training share one entry point. Gradients flow to x, msg, and every
    LayerNorm/FFN weight; dropout must be off (the kernel has none —
    callers gate on ``dropout == 0`` for the training path)."""
    if interpret is None:
        interpret = INTERPRET
    use_mask = mask is not None
    if mask is None:
        mask = jnp.ones((1, 1), jnp.float32)  # unread placeholder
    f = _make_fused_chain_diff(act_name, jnp.dtype(compute_dtype).name,
                               pre_mask, use_mask, interpret)
    return f(x, msg, mask, lna_scale, lna_bias, f1, f1b, f2, f2b,
             lnb_scale, lnb_bias)


def apply_fused_chain(params, ln_a: str, mlp: str, ln_b: str, x, msg, mask,
                      *, act: str, compute_dtype, pre_mask: bool):
    """``fused_chain`` over a batched stream: flattens [B, ..., H] rows,
    reads the LayerNorm/FFN weights from the layer's raw param subtree
    (flax auto-names: LayerNorm_0/MLP_1/LayerNorm_1 node chain,
    LayerNorm_2/MLP_3/LayerNorm_3 edge chain). Differentiable: routes
    through ``fused_chain_diff`` (identical primal; the custom VJP only
    engages under a grad trace)."""
    H = x.shape[-1]
    lnA, m, lnB = params[ln_a], params[mlp], params[ln_b]
    out = fused_chain_diff(
        x.reshape(-1, H), msg.reshape(-1, H),
        None if mask is None else mask.reshape(-1, 1),
        lnA["scale"], lnA["bias"],
        m["Dense_0"]["kernel"], m["Dense_0"]["bias"],
        m["Dense_1"]["kernel"], m["Dense_1"]["bias"],
        lnB["scale"], lnB["bias"],
        act_name=act, compute_dtype=compute_dtype or jnp.float32,
        pre_mask=pre_mask)
    return out.reshape(x.shape)


def _message(per_i, pjg, he, geom, w_he, w_g, b_e, w1, b1, w2, b2,
             *, K, act, cd):
    """relu(per_i + per_j + [h_E|geom] @ W + b) -> relu(@W1+b1) -> @W2+b2.

    All operands already in VMEM; matmuls on the MXU in ``cd`` with f32
    accumulation. Returns [N, H] f32 (N = blk*K edge rows).
    """
    x = jnp.dot(he.astype(cd), w_he.astype(cd),
                preferred_element_type=jnp.float32)
    x = x + jnp.dot(geom.astype(cd), w_g.astype(cd),
                    preferred_element_type=jnp.float32)
    x = x + b_e
    N, H = x.shape
    blk = N // K
    x = x.reshape(blk, K, H) + per_i[:, None, :]
    x = act(x.reshape(N, H) + pjg.astype(jnp.float32))
    x = act(jnp.dot(x.astype(cd), w1.astype(cd),
                    preferred_element_type=jnp.float32) + b1)
    return jnp.dot(x.astype(cd), w2.astype(cd),
                   preferred_element_type=jnp.float32) + b2


def _node_kernel(hv_ref, per_i_ref, pjg_ref, he_ref, geom_ref, ma_ref, mv_ref,
                 w_he_ref, w_g_ref, b_e_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                 ln0s_ref, ln0b_ref, f1_ref, f1b_ref, f2_ref, f2b_ref,
                 ln1s_ref, ln1b_ref, out_ref, *, K, act_name, compute_dtype,
                 stream_dtype):
    act = _act(act_name)
    cd = compute_dtype
    rnd = lambda x: x.astype(stream_dtype).astype(jnp.float32)

    msg = _message(per_i_ref[...], pjg_ref[...], he_ref[...], geom_ref[...],
                   w_he_ref[...], w_g_ref[...], b_e_ref[...],
                   w1_ref[...], b1_ref[...], w2_ref[...], b2_ref[...],
                   K=K, act=act, cd=cd)
    N, H = msg.shape
    blk = N // K
    msg = msg.reshape(blk, K, H) * ma_ref[...][..., None]
    pooled = msg.sum(axis=1) * (1.0 / K)                           # [blk, H]

    hv = hv_ref[...].astype(jnp.float32) + rnd(pooled)
    hv = rnd(_ln(hv, ln0s_ref[...], ln0b_ref[...]))
    ffn = rnd(act(rnd(jnp.dot(hv.astype(cd), f1_ref[...].astype(cd),
                              preferred_element_type=jnp.float32)
                      + f1b_ref[...])))
    ffn = rnd(jnp.dot(ffn.astype(cd), f2_ref[...].astype(cd),
                      preferred_element_type=jnp.float32) + f2b_ref[...])
    hv = _ln(hv + ffn, ln1s_ref[...], ln1b_ref[...])
    out_ref[...] = (hv * mv_ref[...]).astype(out_ref.dtype)


def _edge_kernel(he_ref, per_i_ref, pjg_ref, geom_ref, ma_ref,
                 w_he_ref, w_g_ref, b_e_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                 ln2s_ref, ln2b_ref, f1_ref, f1b_ref, f2_ref, f2b_ref,
                 ln3s_ref, ln3b_ref, out_ref, *, K, act_name, compute_dtype,
                 stream_dtype):
    act = _act(act_name)
    cd = compute_dtype
    rnd = lambda x: x.astype(stream_dtype).astype(jnp.float32)

    msg = _message(per_i_ref[...], pjg_ref[...], he_ref[...], geom_ref[...],
                   w_he_ref[...], w_g_ref[...], b_e_ref[...],
                   w1_ref[...], b1_ref[...], w2_ref[...], b2_ref[...],
                   K=K, act=act, cd=cd)
    N, H = msg.shape
    blk = N // K
    ma3 = ma_ref[...][..., None]                                   # [blk, K, 1]
    msg = (msg.reshape(blk, K, H) * ma3).reshape(N, H)

    he = he_ref[...].astype(jnp.float32) + rnd(msg)
    he = rnd(_ln(he, ln2s_ref[...], ln2b_ref[...]))
    ffn = rnd(act(rnd(jnp.dot(he.astype(cd), f1_ref[...].astype(cd),
                              preferred_element_type=jnp.float32)
                      + f1b_ref[...])))
    ffn = rnd(jnp.dot(ffn.astype(cd), f2_ref[...].astype(cd),
                      preferred_element_type=jnp.float32) + f2b_ref[...])
    he = _ln(he + ffn, ln3s_ref[...], ln3b_ref[...])
    he = (he.reshape(blk, K, H) * ma3).reshape(N, H)
    out_ref[...] = he.astype(out_ref.dtype)


def _row(x):
    return x.reshape(1, -1)


@functools.partial(
    jax.jit,
    static_argnames=("K", "act_name", "pool", "blk", "compute_dtype",
                     "stream_dtype", "interpret"))
def _fused_pass(hv_or_he, per_i, pjg, he, geom, mask_att, mask_v, weights,
                K: int, act_name: str, pool: bool, blk: int,
                compute_dtype, stream_dtype, interpret: bool):
    """One Pallas pass over one batch element.

    pool=True: node pass — hv_or_he is h_V [L, H], returns [L, H].
    pool=False: edge pass — hv_or_he is h_E [L*K, He], ``he`` ignored,
    returns [L*K, He].
    """
    if pool:
        L, H = hv_or_he.shape
    else:
        H = hv_or_he.shape[-1]
        L = hv_or_he.shape[0] // K
    L_pad = -(-L // blk) * blk

    def pad_rows(x, rows):
        return jnp.pad(x, [(0, rows - x.shape[0])] + [(0, 0)] * (x.ndim - 1))

    per_i_p = pad_rows(per_i, L_pad)
    pjg_p = pad_rows(pjg, L_pad * K)
    geom_p = pad_rows(geom, L_pad * K)
    ma_p = pad_rows(mask_att, L_pad)

    blkspec = lambda rows, cols: pl.BlockSpec((rows, cols), lambda r: (r, 0),
                                              memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    grid = (L_pad // blk,)
    kw = dict(K=K, act_name=act_name, compute_dtype=compute_dtype,
              stream_dtype=stream_dtype)

    if pool:
        hv_p = pad_rows(hv_or_he, L_pad)
        he_p = pad_rows(he, L_pad * K)
        mv_p = pad_rows(mask_v, L_pad)
        out = pl.pallas_call(
            functools.partial(_node_kernel, **kw),
            grid=grid,
            in_specs=[blkspec(blk, H), blkspec(blk, H),
                      blkspec(blk * K, H), blkspec(blk * K, he.shape[-1]),
                      blkspec(blk * K, geom.shape[-1]), blkspec(blk, K),
                      blkspec(blk, 1)] + [full()] * len(weights),
            out_specs=blkspec(blk, H),
            out_shape=jax.ShapeDtypeStruct((L_pad, H), stream_dtype),
            interpret=interpret,
        )(hv_p, per_i_p, pjg_p, he_p, geom_p, ma_p, mv_p, *weights)
        return out[:L]

    he_p = pad_rows(hv_or_he, L_pad * K)
    out = pl.pallas_call(
        functools.partial(_edge_kernel, **kw),
        grid=grid,
        in_specs=[blkspec(blk * K, H), blkspec(blk, per_i.shape[-1]),
                  blkspec(blk * K, per_i.shape[-1]),
                  blkspec(blk * K, geom.shape[-1]), blkspec(blk, K)]
                 + [full()] * len(weights),
        out_specs=blkspec(blk * K, H),
        out_shape=jax.ShapeDtypeStruct((L_pad * K, H), stream_dtype),
        interpret=interpret,
    )(he_p, per_i_p, pjg_p, geom_p, ma_p, *weights)
    return out[: L * K]


def fused_ipmp_layer(lp, h_V, h_E, idx, frames, mask_V, mask_attend, *,
                     n_points: int, act: str, compute_dtype,
                     do_edge_update: bool, blk: int = 64,
                     interpret: bool | None = None):
    """Apply one InvariantPointLayer via the step-fused Pallas kernels.

    Args:
        lp: the layer's raw param dict (``InvariantPointLayer``'s subtree:
            Dense_0/Dense_1 point projections, MLP_0/MLP_2 message MLPs,
            LayerNorm_0..3, MLP_1/MLP_3 FFNs).
        h_V: [B, L, H] node stream (stream dtype: bf16 on inference path).
        h_E: [B, L, K, He] edge stream.
        idx: [B, L, K] neighbor indices.
        frames: Rigid backbone frames (already position-scaled).
        mask_V: [B, L]; mask_attend: [B, L, K].
        compute_dtype: matmul dtype (None -> float32).

    Returns (h_V', h_E') with h_E' = h_E when ``do_edge_update`` is False.
    """
    from packppi_tpu.models.ipmp import geometry_features
    from packppi_tpu.ops.graph import gather_nodes

    if interpret is None:
        interpret = INTERPRET
    cd = compute_dtype or jnp.float32
    stream = h_V.dtype
    B, L, K, He = h_E.shape
    H = h_V.shape[-1]
    f32 = jnp.float32

    def mm(x, kern):
        return jnp.dot(x.astype(cd), kern.astype(cd),
                       preferred_element_type=f32)

    def points(hv, dp):
        # point projections run in f32 in the unfused path (Dense without a
        # compute dtype promotes bf16 input with f32 params)
        p = jnp.dot(hv.astype(f32), dp["kernel"]) + dp["bias"]
        return p.reshape(B, L, n_points, 3)

    def msg_inputs(hv, mp, dense_pts):
        per_i = mm(hv, mp["Dense_i"]["kernel"])                       # [B,L,H] f32
        pjg = gather_nodes(mm(hv, mp["Dense_j"]["kernel"]), idx)      # [B,L,K,H]
        geom = geometry_features(points(hv, dense_pts), idx, frames)  # f32
        w_e = mp["Dense_e"]["kernel"]
        msg_w = (w_e[:He].astype(f32), w_e[He:].astype(f32),
                 _row(mp["Dense_e"]["bias"].astype(f32)),
                 mp["Dense_1"]["kernel"].astype(f32),
                 _row(mp["Dense_1"]["bias"].astype(f32)),
                 mp["Dense_2"]["kernel"].astype(f32),
                 _row(mp["Dense_2"]["bias"].astype(f32)))
        return per_i, pjg.astype(cd), geom.astype(cd), msg_w

    def ln_w(name):
        return (_row(lp[name]["scale"].astype(f32)),
                _row(lp[name]["bias"].astype(f32)))

    def ffn_w(name):
        m = lp[name]
        return (m["Dense_0"]["kernel"].astype(f32),
                _row(m["Dense_0"]["bias"].astype(f32)),
                m["Dense_1"]["kernel"].astype(f32),
                _row(m["Dense_1"]["bias"].astype(f32)))

    run = functools.partial(_fused_pass, K=K, act_name=act, blk=blk,
                            compute_dtype=cd, stream_dtype=stream,
                            interpret=interpret)

    # ---- pass A: node update ----
    per_i, pjg, geom, msg_w = msg_inputs(h_V, lp["MLP_0"], lp["Dense_0"])
    weights = msg_w + ln_w("LayerNorm_0") + ffn_w("MLP_1") + ln_w("LayerNorm_1")
    he_flat = h_E.reshape(B, L * K, He).astype(cd)
    ma = mask_attend.astype(f32)
    mv = mask_V.astype(f32)[..., None]
    h_V_new = jax.vmap(lambda hv, pi, pj, he, gm, m_a, m_v: run(
        hv, pi, pj, he, gm, m_a, m_v, weights, pool=True))(
        h_V, per_i, pjg.reshape(B, L * K, H), he_flat,
        geom.reshape(B, L * K, -1), ma, mv)

    if not do_edge_update:
        return h_V_new, h_E

    # ---- pass B: edge update (consumes the updated node stream) ----
    per_i2, pjg2, geom2, msg_w2 = msg_inputs(h_V_new, lp["MLP_2"], lp["Dense_1"])
    weights2 = (msg_w2 + ln_w("LayerNorm_2") + ffn_w("MLP_3")
                + ln_w("LayerNorm_3"))
    h_E_new = jax.vmap(lambda he, pi, pj, gm, m_a: run(
        he, pi, pj, he, gm, m_a, None, weights2, pool=False))(
        h_E.reshape(B, L * K, He), per_i2, pjg2.reshape(B, L * K, H),
        geom2.reshape(B, L * K, -1), ma)
    return h_V_new, h_E_new.reshape(B, L, K, He)
