"""Pallas TPU kernel: between-residue clash loss over flattened atoms.

The clash sum needs every atom-pair distance under a pair mask. Instead of
materializing the [L, L, 14, 14] tensor (reference) or row blocks of it
(our lax.scan path), this kernel tiles the [A, A] atom-pair space
(A = L*14), computes squared distances as fused VPU broadcast diffs (a
Gram-matrix MXU formulation was tried and REJECTED — see the in-kernel
comment and PERF.md), rebuilds the exemption masks from per-atom metadata
in registers, and accumulates row/column sums in VMEM — HBM traffic is
O(A) per tile row instead of O(A^2) total.

Data layout: atom attributes are stored TRANSPOSED, [attr, A], so atoms sit
on the 128-wide lane dimension (an [A, attr] layout would pad each 4-wide
row to 128 lanes — 32x VMEM waste).

Exemption semantics match ops.clash._pair_block_loss exactly (tested
against it): upper-triangle by residue index, backbone-backbone pairs
skipped, C(i)-N(i+1) peptide bonds skipped, global SG-slot pairs skipped.

Forward-only: evaluation paths (clash screening, approximate clashscore,
proximal residue selection) use this kernel; the differentiable training
path keeps the rematerialized scan.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from packppi_tpu.chem import CHEM

_BB_SLOTS = 4.0   # atom14 slots 0..3 are backbone
_C_SLOT = 2.0
_N_SLOT = 0.0
_SG_SLOT = 5.0


def _clash_kernel(pos_ref, meta_ref, out_row_ref, out_col_ref, col_acc, *,
                  tol_soft: float, blk: int):
    """Grid (rows, cols). pos [3, A]: x, y, z. meta [4, A]: exists,
    radius, residue_index, atom14 slot. Outputs [1, A] row/col sums."""
    r = pl.program_id(0)
    c = pl.program_id(1)
    nr = pl.num_programs(0)
    nc = pl.num_programs(1)

    rows = pl.ds(r * blk, blk)
    cols = pl.ds(c * blk, blk)
    pr = pos_ref[:, rows]                  # [3, blk]
    pc = pos_ref[:, cols]
    mr = meta_ref[:, rows]
    mc = meta_ref[:, cols]

    # Squared distances on the VPU via broadcast diffs. (A Gram-matrix MXU
    # formulation was tried and rejected: with O(100 A) coordinates the
    # default bf16 MXU passes leave Angstrom-scale error, and the exact
    # HIGHEST-precision path costs 6 passes on a K=3 contraction — slower
    # than three fused VPU squared-diffs.)
    d2 = ((pr[0].reshape(blk, 1) - pc[0].reshape(1, blk)) ** 2
          + (pr[1].reshape(blk, 1) - pc[1].reshape(1, blk)) ** 2
          + (pr[2].reshape(blk, 1) - pc[2].reshape(1, blk)) ** 2)
    d = jnp.sqrt(d2 + 1e-10)

    ex_r, rad_r, ridx_r, slot_r = (mr[k].reshape(blk, 1) for k in range(4))
    ex_c, rad_c, ridx_c, slot_c = (mc[k].reshape(1, blk) for k in range(4))

    mask = ex_r * ex_c * (ridx_r < ridx_c)
    mask = mask * (1.0 - (slot_r < _BB_SLOTS) * (slot_c < _BB_SLOTS))
    mask = mask * (1.0 - (ridx_c == ridx_r + 1.0)
                   * (slot_r == _C_SLOT) * (slot_c == _N_SLOT))
    mask = mask * (1.0 - (slot_r == _SG_SLOT) * (slot_c == _SG_SLOT))

    err = mask * jax.nn.relu(rad_r + rad_c - tol_soft - d)

    # row sums accumulate across the inner (column) grid dimension
    @pl.when(c == 0)
    def _():
        out_row_ref[...] = jnp.zeros_like(out_row_ref)

    out_row_ref[0, :] += err.sum(axis=1)

    # column sums accumulate in persistent VMEM scratch, emitted at the end
    @pl.when((r == 0) & (c == 0))
    def _():
        col_acc[...] = jnp.zeros_like(col_acc)

    col_acc[0, cols] += err.sum(axis=0)

    @pl.when((r == nr - 1) & (c == nc - 1))
    def _():
        out_col_ref[...] = col_acc[...]


@functools.partial(jax.jit, static_argnames=("tol_soft", "blk", "interpret"))
def _clash_pallas_single(positions, atom_exists, atom_radius, residue_index,
                         tol_soft: float = 0.5, blk: int = 1024,
                         interpret: bool = False):
    """Unbatched [L, 14, ...] inputs -> per-atom clash loss [L, 14]."""
    L = positions.shape[0]
    A = L * 14
    A_pad = -(-A // blk) * blk

    # [3, A]: the rejected Gram-matrix formulation needed a |x|^2 row; the
    # VPU broadcast-diff kernel reads only x/y/z
    pos3 = jnp.pad(positions.reshape(A, 3).astype(jnp.float32),
                   ((0, A_pad - A), (0, 0))).T

    slot = jnp.tile(jnp.arange(14, dtype=jnp.float32), (L,))
    meta = jnp.stack([
        atom_exists.reshape(A).astype(jnp.float32),
        atom_radius.reshape(A).astype(jnp.float32),
        jnp.repeat(residue_index.astype(jnp.float32), 14),
        slot,
    ], 0)
    # padding atoms: exists=0 and a residue index that never precedes anyone
    meta = jnp.pad(meta, ((0, 0), (0, A_pad - A)))
    meta = meta.at[2, A:].set(-1e9)

    nblk = A_pad // blk
    out_row, out_col = pl.pallas_call(
        functools.partial(_clash_kernel, tol_soft=tol_soft, blk=blk),
        grid=(nblk, nblk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, blk), lambda r, c: (0, r), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A_pad), lambda r, c: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, A_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, A_pad), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((1, A_pad), jnp.float32)],
        interpret=interpret,
    )(pos3, meta)

    return (out_row[0, :A] + out_col[0, :A]).reshape(L, 14)


def between_residue_clash_pallas(positions, atom_exists, atom_radius,
                                 residue_index, tol_soft: float = 0.5,
                                 blk: int = 1024, interpret: bool = False):
    """Batched per-atom between-residue clash loss [B, L, 14] (forward only)."""
    fn = functools.partial(_clash_pallas_single, tol_soft=tol_soft, blk=blk,
                           interpret=interpret)
    return jax.vmap(fn)(positions, atom_exists, atom_radius, residue_index)


def sc_clash_screen(coords, atom_mask, residue_type, residue_index,
                    clash_overlap_tolerance: float = 0.5,
                    interpret: bool = False):
    """Fast forward-only per-atom BETWEEN-residue clash for screening /
    scoring paths (no within-residue bound terms, no gradient)."""
    radius = jnp.asarray(CHEM.vdw_radius_atom14)[residue_type] * atom_mask
    return between_residue_clash_pallas(coords, atom_mask, radius, residue_index,
                                        tol_soft=clash_overlap_tolerance,
                                        interpret=interpret)
