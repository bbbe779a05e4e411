"""Pipeline parallelism (GPipe schedule) over a stacked-layer axis.

The reference has no pipeline (or any model) parallelism — its only
distribution is single-node DDP (reference: configs/trainer/ddp.yaml:4-9).
This module adds the TPU-native missing piece for models whose DEPTH, not
width, is the memory wall: encoders already stored with layer parameters
stacked on a leading ``[num_layers, ...]`` axis for ``lax.scan``
(models/esm2.py) shard that axis over the mesh's 'model' dimension — each
stage holds ``num_layers/S`` consecutive blocks — and activations stream
stage-to-stage over ICI with ``lax.ppermute`` inside ``shard_map``.

Schedule: GPipe. The local (per-data-shard) batch splits into M
microbatches; over ``M + S - 1`` ticks, stage ``s`` processes microbatch
``t - s``. The bubble fraction is ``(S-1)/(M+S-1)`` — choose M >= S for
>50% utilization. All stages execute every tick (off-schedule ticks
compute on don't-care data and are masked), which keeps the program SPMD
and the control flow static; the wasted ticks ARE the bubble, no extra
cost beyond it.

Composes with the mesh's 'data' axis (DP outside, PP inside) and with
tensor parallelism per stage only if a separate axis is added — on the
standard 2-D ``(data, model)`` mesh, PP and TP/FSDP are alternative uses
of 'model'.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def pipeline_apply(mesh, layer_params, carry, apply_layer,
                   n_microbatches: int, axis: str = "model",
                   data_axis: str = "data"):
    """Run ``num_layers`` layers over ``carry``, pipelined over ``axis``.

    Args:
      mesh: a ``jax.sharding.Mesh`` containing ``axis`` (pipeline stages)
        and, if present, ``data_axis`` (batch sharding outside the pipe).
      layer_params: pytree whose leaves all carry a leading
        ``[num_layers, ...]`` axis (the lax.scan layout); num_layers must
        divide by the stage count ``mesh.shape[axis]``.
      carry: pytree of ``[B, ...]`` arrays streamed through the layers
        (activations plus any per-example side inputs, e.g. attention
        biases). B is the GLOBAL batch; it shards over ``data_axis``.
      apply_layer: ``(single_layer_params, carry) -> carry`` — one block.
      n_microbatches: how many microbatches the per-data-shard batch splits
        into; must divide ``B / mesh.shape[data_axis]``.

    Returns ``carry`` after all layers, batch-sharded over ``data_axis``
    and replicated over ``axis`` — identical (up to f32 summation order)
    to a sequential ``lax.scan`` over the full stack.
    """
    S = mesh.shape[axis]
    M = int(n_microbatches)
    num_layers = jax.tree.leaves(layer_params)[0].shape[0]
    if num_layers % S:
        raise ValueError(f"num_layers={num_layers} not divisible by {S} stages")
    has_data = data_axis in mesh.shape
    d = mesh.shape[data_axis] if has_data else 1
    B = jax.tree.leaves(carry)[0].shape[0]
    if B % (d * M):
        raise ValueError(f"global batch {B} not divisible by "
                         f"data={d} x microbatches={M}")
    mb = B // d // M

    lp_spec = jax.tree.map(lambda _: P(axis), layer_params)
    io_spec = jax.tree.map(
        lambda _: P(data_axis) if has_data else P(), carry)

    def run_stage(layers_local, carry_local):
        s = jax.lax.axis_index(axis)

        def apply_local(c):
            def body(c, lp):
                return apply_layer(lp, c), None
            c, _ = jax.lax.scan(body, c, layers_local)
            return c

        def slice_mb(i):  # static i
            return jax.tree.map(
                lambda a: jax.lax.dynamic_slice_in_dim(a, i * mb, mb, 0),
                carry_local)

        recv = jax.tree.map(lambda a: jnp.zeros((mb,) + a.shape[1:], a.dtype),
                            carry_local)
        outs = jax.tree.map(jnp.zeros_like, carry_local)
        fwd = [(i, i + 1) for i in range(S - 1)]

        for t in range(M + S - 1):  # static schedule, unrolled
            # stage 0 reads microbatch t from its input slice; later stages
            # read what ppermute delivered last tick
            first = slice_mb(min(t, M - 1))
            x_in = jax.tree.map(lambda f, r: jnp.where(s == 0, f, r),
                                first, recv)
            y = apply_local(x_in)
            m_idx = t - (S - 1)
            if 0 <= m_idx < M:
                # only the LAST stage's write is meaningful; masked below
                outs = jax.tree.map(
                    lambda o, v: jax.lax.dynamic_update_slice_in_dim(
                        o, v, m_idx * mb, 0), outs, y)
            if t < M + S - 2:
                recv = jax.tree.map(
                    lambda v: jax.lax.ppermute(v, axis, fwd), y)

        # replicate the final stage's outputs across the pipeline axis.
        # dtype-preserving masking: where(cond, o, 0) would promote bool
        # (and other weak-vs-strong mixes) to int32, changing the carry's
        # dtype vs the sequential lax.scan; bools ride the psum as int32
        # and cast back (psum has no pred add).
        last = S - 1

        def replicate_last(o):
            masked = jnp.where(s == last, o, jnp.zeros_like(o))
            if masked.dtype == jnp.bool_:
                return jax.lax.psum(masked.astype(jnp.int32),
                                    axis).astype(jnp.bool_)
            return jax.lax.psum(masked, axis)

        return jax.tree.map(replicate_last, outs)

    # check_vma off: the final psum-replication over `axis` can't be proven
    # by the varying-manual-axes checker (the masked write is data-dependent)
    fn = jax.shard_map(run_stage, mesh=mesh, in_specs=(lp_spec, io_spec),
                       out_specs=io_spec, check_vma=False)
    return fn(layer_params, carry)
