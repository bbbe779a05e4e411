"""Dense masked graph ops.

The residue graph is k-nearest-neighbor sparse, but on TPU we keep it as
dense gathers over padded [B, L, K] index tensors — XLA turns these into
efficient dynamic-gathers, and there are no ragged shapes anywhere.
(reference builds the same graph with torch.topk + gather; reference:
src/models/components/encoder.py:105-118, src/models/components/__init__.py:9-36)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


# above this many residues masked_knn switches to the row-blocked path
# (peak memory O(block * L) instead of the dense [B, L, L] matrix)
KNN_DENSE_MAX_L = 2048


def _knn_rows(coords_rows, mask_rows, coords, mask, k, eps):
    """kNN for a slab of query rows against all L columns. The D_max
    push-beyond adjustment is per query ROW, so slab results are exactly
    the dense results for those rows."""
    mask2d = mask_rows[..., :, None] * mask[..., None, :]
    diff = coords_rows[..., :, None, :] - coords[..., None, :, :]
    D = mask2d * jnp.sqrt(jnp.sum(diff * diff, -1) + eps)
    D_max = jnp.max(D, -1, keepdims=True)
    D_adjusted = D + 2.0 * (1.0 - mask2d) * D_max
    neg_d, idx = jax.lax.top_k(-D_adjusted, k)
    return -neg_d, idx.astype(jnp.int32)


def masked_knn(coords: jnp.ndarray, mask: jnp.ndarray, k: int, eps: float = 1e-6,
               block: int | None = None):
    """k nearest neighbors (self included) under a validity mask.

    Args:
        coords: [B, L, 3] CA positions.
        mask: [B, L] 1.0 for real residues.
        k: neighbor count (clamped to L).
        block: query-row block size. None auto-selects: dense up to
            ``KNN_DENSE_MAX_L`` residues, 512-row blocks beyond (peak
            memory O(B * block * L), so multi-thousand-residue complexes
            never materialize the [B, L, L] distance matrix the reference
            builds; reference: src/models/components/encoder.py:105-118).
            Values are IDENTICAL to the dense path (tested).

    Returns:
        (D_neighbors [B, L, K], idx [B, L, K] int32) — invalid pairs are
        pushed beyond the max distance so they sort last.
    """
    L = coords.shape[-2]
    k = min(k, L)
    if block is None and L > KNN_DENSE_MAX_L:
        block = 512
    if block is None or block >= L:
        return _knn_rows(coords, mask, coords, mask, k, eps)

    nblk = -(-L // block)
    pad = nblk * block - L
    coords_p = jnp.pad(coords, ((0, 0), (0, pad), (0, 0)))
    mask_p = jnp.pad(mask, ((0, 0), (0, pad)))

    def row_block(i):
        cr = jax.lax.dynamic_slice_in_dim(coords_p, i * block, block, axis=1)
        mr = jax.lax.dynamic_slice_in_dim(mask_p, i * block, block, axis=1)
        return _knn_rows(cr, mr, coords, mask, k, eps)

    D_blk, idx_blk = jax.lax.map(row_block, jnp.arange(nblk))
    # [nblk, B, block, K] -> [B, nblk*block, K] -> trim row padding
    D = jnp.moveaxis(D_blk, 0, 1).reshape(coords.shape[0], nblk * block, k)
    idx = jnp.moveaxis(idx_blk, 0, 1).reshape(coords.shape[0], nblk * block, k)
    return D[:, :L], idx[:, :L]


def gather_nodes(nodes: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """nodes [B, L, *F] at idx [B, L, K] -> [B, L, K, *F]."""
    B, L = nodes.shape[:2]
    feat_shape = nodes.shape[2:]
    flat_idx = idx.reshape(B, -1, *([1] * max(1, len(feat_shape))))
    flat_nodes = nodes.reshape(B, L, -1) if feat_shape else nodes.reshape(B, L, 1)
    # mode="clip": neighbor indices come from top_k and are always in range;
    # the default "fill" mode emits an extra select over the whole gathered
    # tensor on TPU (out-of-bounds replacement we never need)
    out = jnp.take_along_axis(flat_nodes, flat_idx.reshape(B, -1, 1), axis=1,
                              mode="clip")
    return out.reshape(*idx.shape, *feat_shape) if feat_shape else out.reshape(*idx.shape)


def gather_nodes_onehot(nodes: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``gather_nodes`` via a one-hot contraction: nodes [B, L, *F] at
    idx [B, L, K] -> [B, L, K, *F].

    XLA:TPU emits a far faster kernel for an (iota==idx) one-hot matmul
    than for its row-gather (measured 12 vs 29 us for a [24576] x 128-wide
    gather at T1124 scale — the one-hot never materializes; it fuses into
    the contraction). Values are EXACT for any dtype: each output row is a
    single selected source row (one-hot weights are exactly 1.0 and the
    product of 1.0 with any float is itself). Preferred on hot paths with
    a static neighbor table; take_along_axis remains for rank-generality.
    """
    B, L = nodes.shape[:2]
    feat_shape = nodes.shape[2:]
    flat = nodes.reshape(B, L, -1) if feat_shape else nodes.reshape(B, L, 1)
    oh = (idx.reshape(B, -1, 1)
          == jnp.arange(L, dtype=idx.dtype)[None, None, :]).astype(flat.dtype)
    # HIGHEST precision: the default MXU pass casts f32 payloads to bf16 —
    # selection is only exact when the payload operand is decomposed
    # (bf16x3); measured on-chip r4 (the "EXACT for any dtype" claim below
    # holds ONLY with this)
    out = jnp.einsum("bnl,blc->bnc", oh, flat,
                     precision=jax.lax.Precision.HIGHEST)
    return (out.reshape(*idx.shape, *feat_shape) if feat_shape
            else out.reshape(*idx.shape))


def gather_edges(edges: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """edges [B, L, L, C] at idx [B, L, K] -> [B, L, K, C]."""
    return jnp.take_along_axis(edges, idx[..., None], axis=2, mode="clip")


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _gather_flat_mg(nodes: jnp.ndarray, idx: jnp.ndarray, bwd_block: int):
    # nodes [B, L, C] at idx [B, N] -> [B, N, C]; same clip semantics as
    # gather_nodes (indices come from top_k and are always in range)
    return jnp.take_along_axis(nodes, idx[..., None], axis=1, mode="clip")


def _gather_flat_mg_fwd(nodes, idx, bwd_block):
    return _gather_flat_mg(nodes, idx, bwd_block), (idx, nodes.shape[1])


def _gather_flat_mg_bwd(bwd_block, res, ct):
    # d_nodes[b, l, c] = sum_n [idx[b, n] == l] * ct[b, n, c] — the exact
    # scatter-add the gather's autodiff transpose emits, but written as a
    # one-hot MXU contraction (the one-hot never materializes; the
    # iota-compare fuses into the dot). Blocked over N so compile time and
    # the worst-case one-hot footprint stay bounded at training shapes —
    # the unblocked whole-graph transpose is exactly what defeated XLA's
    # fusion when the forward was switched to one-hot contractions
    # (PERF.md r4 train round, "did not finish COMPILING within 560 s").
    idx, L = res
    B, N = idx.shape
    C = ct.shape[-1]
    idx = jnp.clip(idx, 0, L - 1)  # match the forward's mode="clip"
    iota = jnp.arange(L, dtype=idx.dtype)[None, None, :]
    nblk = -(-N // bwd_block)
    if nblk <= 1:
        oh = (idx[..., None] == iota).astype(ct.dtype)
        d = jnp.einsum("bnl,bnc->blc", oh, ct,
                       precision=jax.lax.Precision.HIGHEST)
    else:
        pad = nblk * bwd_block - N
        idx_p = jnp.pad(idx, ((0, 0), (0, pad)))
        ct_p = jnp.pad(ct, ((0, 0), (0, pad), (0, 0)))  # zero ct: no effect

        def body(acc, i):
            ib = jax.lax.dynamic_slice_in_dim(idx_p, i * bwd_block,
                                              bwd_block, axis=1)
            cb = jax.lax.dynamic_slice_in_dim(ct_p, i * bwd_block,
                                              bwd_block, axis=1)
            oh = (ib[..., None] == iota).astype(ct.dtype)
            return acc + jnp.einsum("bnl,bnc->blc", oh, cb,
                                    precision=jax.lax.Precision.HIGHEST), None

        d, _ = jax.lax.scan(body, jnp.zeros((B, L, C), ct.dtype),
                            jnp.arange(nblk))
    return d, np.zeros(idx.shape, jax.dtypes.float0)


_gather_flat_mg.defvjp(_gather_flat_mg_fwd, _gather_flat_mg_bwd)


# measured crossover for the one-hot MXU gather backward ("auto" policy,
# tools/bench_variants.py train_mg_sweep, r5 on one v5e chip, f32): the
# contraction's FLOPs grow with rows*L while the scatter-add's traffic grows
# with rows only, so the one-hot backward wins at small padded lengths and
# loses at large ones. Measured step times (ms, mg off -> on):
#   B1/L768  7.60 -> 6.49  (-15%)    B1/L1024 10.36 -> 9.11  (-12%)
#   B1/L1536 16.17 -> 15.35 (-5%)    B1/L2048 24.14 -> 22.53 (-7%)
#   B1/L3072 38.75 -> 44.60 (+15%)   B4/L1024 47.34 -> 41.81 (-12%)
#   B4/L1536 80.67 -> 76.25 (-5%)
# The sign flips between L=2048 and L=3072 at both batch sizes (B scales
# both sides' rows equally, so the gate is on L alone); the boundary is
# set at the largest measured WIN, conservative within the bracket.
MXU_GATHER_GRAD_MAX_L = 2048


def resolve_mxu_gather_grad(flag, L: int) -> bool:
    """Resolve the ``mxu_gather_grad`` knob to a concrete bool.

    ``"auto"`` gates on the padded residue length with the measured
    crossover above — the same shape-keyed policy idiom as
    ``attention_impl="auto"`` (PERF.md "Flash attention A/B"). Booleans
    pass through, so existing explicit configs are unchanged.
    """
    if flag == "auto":
        return L <= MXU_GATHER_GRAD_MAX_L
    return bool(flag)


def gather_nodes_mg(nodes: jnp.ndarray, idx: jnp.ndarray,
                    bwd_block: int = 8192) -> jnp.ndarray:
    """``gather_nodes`` with an MXU one-hot-contraction BACKWARD.

    Forward is the plain row-gather (fastest forward, PERF.md "K-major
    geometry A/B" context note); the backward replaces XLA's scatter-add
    transpose with a blocked one-hot matmul — the train step is
    gather/scatter-bound (47% of device time, PERF.md r4 train round) and
    the scatter-add emitter is the half we could not reach from graph
    structure until custom_vjp let us write the transpose ourselves.
    Gradients are exact sums of cotangent rows (one-hot weights are exactly
    1.0; HIGHEST precision keeps f32 payloads undecomposed — see
    gather_nodes_onehot); only the summation ORDER can differ from the
    scatter-add, so f32 gradients may differ by float-addition
    reassociation (tested ~1e-7 relative).
    """
    B, L = nodes.shape[:2]
    feat_shape = nodes.shape[2:]
    flat = nodes.reshape(B, L, -1) if feat_shape else nodes.reshape(B, L, 1)
    out = _gather_flat_mg(flat, idx.reshape(B, -1), bwd_block)
    return (out.reshape(*idx.shape, *feat_shape) if feat_shape
            else out.reshape(*idx.shape))
