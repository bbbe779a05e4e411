"""Pallas multi-head attention with VMEM-resident logits (flash-style).

Built for the ESM-2 encoder (`models/esm2.py`): the dense jnp path
materializes the [B, H, T, T] attention plane in HBM — at the 650M
geometry and T=2048 that is 168 MB/layer of bf16 HBM traffic per
direction, the measured bottleneck that sinks the dense forward to
64 TFLOP/s. This kernel tiles queries into [blk_q, D] blocks and keeps
each head's full K/V resident in VMEM, so the [blk_q, T] logits/softmax
weights exist only on-chip and HBM sees exactly the q/k/v/out streams.
Measured in-model: +25% at T=2048, a wash at T=1024, slower at T=512
where the plane is small and XLA's fused softmax overlaps with the
layer scan's weight streaming — hence the length-gated
``attention_impl="auto"`` policy in ESM2Config (full A/B: PERF.md
"ESM-2 embedding extraction").

No online-softmax running rescale is needed: protein-chain lengths cap
T at a few thousand, and a full [blk_q, T] f32 logits row-block fits
VMEM (blk_q=512, T=4096 -> 8 MB; total kernel footprint ~12 MB of the
16 MB budget). This trades the canonical FlashAttention inner loop for
one big MXU matmul pair per block — the right shape for TPU, where the
win is HBM avoidance, not O(T) memory.

Padding-mask semantics match the dense path exactly: an additive f32
key bias ([B, T], large-negative on pads) is added to the logits before
the f32 softmax. Forward-only by design — extraction runs under
`jax.jit` with frozen weights (the reference likewise only ever runs
ESM-2 in eval mode, reference: src/datamodules/components/helper.py:
131-169); wrap in a custom VJP if a trainable path ever needs it.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mha_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, precision):
    q = q_ref[0, 0]                                   # [blk_q, D]
    k = k_ref[0, 0]                                   # [T, D]
    v = v_ref[0, 0]                                   # [T, D]
    # q @ k^T without transposing k in VMEM: contract both on D.
    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)
    logits = logits + bias_ref[0]                     # [1, T] broadcast, f32
    w = jax.nn.softmax(logits, axis=-1)               # f32, rows independent
    ctx = jnp.dot(w.astype(v.dtype), v,
                  preferred_element_type=jnp.float32, precision=precision)
    o_ref[0, 0] = ctx


@functools.partial(jax.jit, static_argnames=("blk_q", "interpret", "highest"))
def flash_mha(q, k, v, key_bias, blk_q: int = 512,
              interpret: bool = False, highest: bool = False):
    """softmax(q @ k^T + key_bias) @ v, attention plane never in HBM.

    Args:
        q, k, v: [B, H, T, D] (f32 or bf16 — matmuls run in the input
            dtype on the MXU, accumulate f32; softmax is always f32).
        key_bias: [B, T] f32 additive logit bias (0 real / -1e9 pad).
        blk_q: query rows per grid step (shrunk to T when T < blk_q;
            a ragged tail block is handled by Pallas out-of-range
            clipping — rows are independent, so clipped lanes are
            simply dropped on store).
        highest: use Precision.HIGHEST for true-f32 MXU passes (parity
            with the dense f32 path's architecture golden).

    Returns: [B, H, T, D] f32 context.
    """
    B, H, T, D = q.shape
    blk_q = min(blk_q, T)
    # keep the f32 logits/softmax row-block inside the 16 MB scoped-VMEM
    # stack: blk_q=512 at T=4096 was measured to overflow it by 1.2 MB
    # (the compiler holds logits + exp temporaries + double-buffered K/V),
    # so halve the query block until blk_q*T <= 512*2048 elements (4 MB f32)
    while blk_q > 128 and blk_q * T > 512 * 2048:
        blk_q //= 2
    precision = jax.lax.Precision.HIGHEST if highest else None
    grid = (B, H, pl.cdiv(T, blk_q))

    return pl.pallas_call(
        functools.partial(_mha_kernel, precision=precision),
        out_shape=jax.ShapeDtypeStruct((B, H, T, D), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, blk_q, D), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            # full-T K/V blocks: index map ignores i, so Pallas keeps them
            # VMEM-resident across the innermost (query-block) grid axis
            pl.BlockSpec((1, 1, T, D), lambda b, h, i: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T, D), lambda b, h, i: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            # [B, 1, T] so the sublane dim equals the array dim (TPU block
            # rule: trailing dims divisible by (8, 128) or whole-array)
            pl.BlockSpec((1, 1, T), lambda b, h, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, blk_q, D), lambda b, h, i: (b, h, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q, k, v, key_bias.reshape(B, 1, T))
