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

Differentiable via ``between_residue_clash_diff`` (custom VJP): the
backward is a second pairwise tile kernel that recomputes distances from
the saved positions (remat — nothing O(A^2) is ever stored) and
accumulates per-atom coordinate gradients. For output cotangent ``w``
([L, 14] per-atom weights), each unordered pair (a, b) feeds both
endpoints' row/col sums, so

    dL/dx_a = sum_b -(w_a + w_b) * S_ab * 1{r_a + r_b - tol > d} * (x_a - x_b)/d_ab

with S the SYMMETRIC pair mask (the forward's upper-triangle mask plus its
transpose). Each tile accumulates gradients for its ROW atoms only; the
transposed tile covers the column endpoints. ``sampling/proximal`` runs
this kernel on TPU (backend="auto") — the lax.scan path remains the CPU /
fallback and the parity oracle.

Spatial culling (r4, second pass): an O(A) JAX-side pass computes
per-block AABBs + max radii -> a [nblk, nblk] tile-liveness matrix (a
tile is dead when its boxes are farther apart than any radius sum can
reach, or when the residue-dedup bound kills it). The kernels read one
SMEM flag per tile and predicate the O(blk^2) work away — contact physics
is short-ranged (<~3.5 A), so most far tiles die. Culling is bounds-based
and conservative: results are exactly the same sums.

Measured on one v5e (scan-chained fwd+bwd per call, min-of-runs):
tri-only liveness -> AABB liveness = 2.15 -> 1.55 ms at T1124/768,
9.36 -> 3.09 ms at 2048, 195.9 -> 16.6 ms at 9216 (11.8x) — the pair
work becomes ~O(A * local density) because residue order is already
spatially coherent block-to-block. ``spatial_sort=True`` additionally
Morton-orders atoms so blocks are spatially COMPACT (denser culling);
measured, the argsort + two O(A) scatters cost MORE than the extra
culling saves at every size tried (1.81 / 4.35 / 23.5 ms at the same
three sizes), so it ships off by default — the knob stays for lattice-
like inputs whose sequence order is spatially incoherent.
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

_BIG = jnp.float32(1e30)


def _morton_perm(pos: jnp.ndarray, exists: jnp.ndarray) -> jnp.ndarray:
    """Spatial (Z-order) atom permutation: sort by 30-bit Morton code so
    consecutive ``blk``-atom blocks are spatially COMPACT, which is what
    makes the per-tile AABB culling in ``_tile_live_matrix`` bite — in
    residue order a 512-atom block spans a whole chain segment and its
    bounding box overlaps most of the structure. Nonexistent atoms sort
    last (they group into blocks that are provably dead). Stable argsort,
    so the permutation is a pure function of positions — the custom-VJP
    backward recomputes the identical perm from the saved inputs."""
    lo = jnp.min(jnp.where(exists[:, None] > 0, pos, _BIG), axis=0)
    hi = jnp.max(jnp.where(exists[:, None] > 0, pos, -_BIG), axis=0)
    # uniform scale (isotropic cells); 10 bits per axis
    scale = 1023.0 / jnp.maximum(jnp.max(hi - lo), 1e-6)
    q = jnp.clip((pos - lo) * scale, 0.0, 1023.0).astype(jnp.int32)

    def spread(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    code = spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
    code = jnp.where(exists > 0, code, jnp.int32(1 << 30))
    return jnp.argsort(code, stable=True)


def _tile_live_matrix(pos3: jnp.ndarray, meta: jnp.ndarray, blk: int,
                      tol_soft: float) -> jnp.ndarray:
    """[nblk, nblk] int32 tile-liveness, computed in O(A) from per-block
    bounds (plain JAX — the kernel just reads one flag per tile).

    A tile (r, c) is DEAD — provably contributes nothing — when either
    * residue-dedup: min existing ridx_r >= max existing ridx_c (the
      survivor mask needs ridx_r < ridx_c), which kills the lower triangle
      in residue order and padding blocks in any order; or
    * geometry: the minimum distance between the two blocks' axis-aligned
      bounding boxes is >= max(rad_r) + max(rad_c) - tol_soft, so
      relu(rad_a + rad_b - tol - d) is zero for every pair in the tile.
    Liveness is conservative (bounds-based), so culling never changes the
    result — only how much O(blk^2) work is predicated away."""
    nblk = pos3.shape[1] // blk
    p = pos3.reshape(3, nblk, blk)
    ex = meta[0].reshape(nblk, blk) > 0
    lo = jnp.min(jnp.where(ex[None], p, _BIG), axis=2)        # [3, nblk]
    hi = jnp.max(jnp.where(ex[None], p, -_BIG), axis=2)
    rad = jnp.max(jnp.where(ex, meta[1].reshape(nblk, blk), -_BIG), axis=1)
    rmin = jnp.min(jnp.where(ex, meta[2].reshape(nblk, blk), _BIG), axis=1)
    rmax = jnp.max(jnp.where(ex, meta[2].reshape(nblk, blk), -_BIG), axis=1)

    gap = jnp.maximum(0.0, lo[:, None, :] - hi[:, :, None])   # c-lo beyond r-hi
    gap = jnp.maximum(gap, lo[:, :, None] - hi[:, None, :])   # r-lo beyond c-hi
    gap2 = jnp.sum(gap * gap, axis=0)                         # [r, c]
    thr = rad[:, None] + rad[None, :] - tol_soft
    near = gap2 < jnp.where(thr > 0, thr * thr, 0.0)
    tri = rmin[:, None] < rmax[None, :]
    return (near & tri).astype(jnp.int32)


def _clash_kernel(live_ref, pos_ref, meta_ref, out_row_ref, out_col_ref,
                  col_acc, *, tol_soft: float, blk: int):
    """Grid (rows, cols). live [nblk*nblk] int32 (SMEM) tile flags from
    ``_tile_live_matrix``; pos [3, A]: x, y, z. meta [4, A]: exists,
    radius, residue_index, atom14 slot. Outputs [1, A] row/col sums."""
    r = pl.program_id(0)
    c = pl.program_id(1)
    nr = pl.num_programs(0)
    nc = pl.num_programs(1)

    rows = pl.ds(r * blk, blk)
    cols = pl.ds(c * blk, blk)

    # row sums accumulate across the inner (column) grid dimension
    @pl.when(c == 0)
    def _():
        out_row_ref[...] = jnp.zeros_like(out_row_ref)

    # column sums accumulate in persistent VMEM scratch, emitted at the end
    @pl.when((r == 0) & (c == 0))
    def _():
        col_acc[...] = jnp.zeros_like(col_acc)

    @pl.when(live_ref[r * nc + c] > 0)
    def _():
        mr = meta_ref[:, rows]
        mc = meta_ref[:, cols]
        pr = pos_ref[:, rows]                  # [3, blk]
        pc = pos_ref[:, cols]

        # Squared distances on the VPU via broadcast diffs. (A Gram-matrix
        # MXU formulation was tried and rejected: with O(100 A) coordinates
        # the default bf16 MXU passes leave Angstrom-scale error, and the
        # exact HIGHEST-precision path costs 6 passes on a K=3 contraction —
        # slower than three fused VPU squared-diffs.)
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

        out_row_ref[0, :] += err.sum(axis=1)
        col_acc[0, cols] += err.sum(axis=0)

    @pl.when((r == nr - 1) & (c == nc - 1))
    def _():
        out_col_ref[...] = col_acc[...]


def _pack_atoms(positions, atom_exists, atom_radius, residue_index, blk,
                spatial_sort: bool = False):
    """Flatten [L, 14, ...] atom attributes to lane-major [attr, A_pad].

    With ``spatial_sort`` the atoms are Morton-permuted first (see
    ``_morton_perm``); the returned ``perm`` maps sorted slot i to original
    flat-atom index perm[i] (None when unsorted) — callers scatter their
    per-atom outputs back through it."""
    L = positions.shape[0]
    A = L * 14
    A_pad = -(-A // blk) * blk

    pos = positions.reshape(A, 3).astype(jnp.float32)
    ex = atom_exists.reshape(A).astype(jnp.float32)
    rad = atom_radius.reshape(A).astype(jnp.float32)
    ridx = jnp.repeat(residue_index.astype(jnp.float32), 14)
    slot = jnp.tile(jnp.arange(14, dtype=jnp.float32), (L,))

    perm = None
    if spatial_sort:
        perm = _morton_perm(pos, ex)
        pos, ex, rad, ridx, slot = (a[perm] for a in (pos, ex, rad, ridx, slot))

    # [3, A]: the rejected Gram-matrix formulation needed a |x|^2 row; the
    # VPU broadcast-diff kernel reads only x/y/z
    pos3 = jnp.pad(pos, ((0, A_pad - A), (0, 0))).T
    meta = jnp.stack([ex, rad, ridx, slot], 0)
    # padding atoms: exists=0 and a residue index that never precedes anyone
    meta = jnp.pad(meta, ((0, 0), (0, A_pad - A)))
    meta = meta.at[2, A:].set(-1e9)
    return pos3, meta, A, A_pad, perm


@functools.partial(jax.jit, static_argnames=("tol_soft", "blk", "interpret",
                                              "spatial_sort"))
def _clash_pallas_single(positions, atom_exists, atom_radius, residue_index,
                         tol_soft: float = 0.5, blk: int = 1024,
                         interpret: bool = False, spatial_sort: bool = False):
    """Unbatched [L, 14, ...] inputs -> per-atom clash loss [L, 14]."""
    L = positions.shape[0]
    pos3, meta, A, A_pad, perm = _pack_atoms(positions, atom_exists,
                                             atom_radius, residue_index, blk,
                                             spatial_sort=spatial_sort)
    nblk = A_pad // blk
    live = _tile_live_matrix(pos3, meta, blk, tol_soft).reshape(-1)
    out_row, out_col = pl.pallas_call(
        functools.partial(_clash_kernel, tol_soft=tol_soft, blk=blk),
        grid=(nblk, nblk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
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
    )(live, pos3, meta)

    per_atom = out_row[0, :A] + out_col[0, :A]
    if perm is not None:
        per_atom = jnp.zeros_like(per_atom).at[perm].set(per_atom)
    return per_atom.reshape(L, 14)


def between_residue_clash_pallas(positions, atom_exists, atom_radius,
                                 residue_index, tol_soft: float = 0.5,
                                 blk: int = 1024, interpret: bool = False,
                                 spatial_sort: bool = False):
    """Batched per-atom between-residue clash loss [B, L, 14] (forward only)."""
    fn = functools.partial(_clash_pallas_single, tol_soft=tol_soft, blk=blk,
                           interpret=interpret, spatial_sort=spatial_sort)
    return jax.vmap(fn)(positions, atom_exists, atom_radius, residue_index)


def _clash_grad_kernel(live_ref, pos_ref, meta_ref, w_ref, drow_ref, dcol_ref,
                       col_acc, *, tol_soft: float, blk: int):
    """Backward tile: per-atom coordinate gradients, upper-triangle pairs.

    w [1, A]: output cotangent per atom (dL/d per_atom_loss_sum). Each
    surviving pair (a=row, b=col) is visited ONCE with the forward's exact
    mask; its err cotangent is (w_a + w_b) because err_ab feeds both
    per_atom[a] (row sum) and per_atom[b] (col sum). The row endpoint's
    gradient accumulates into the r-blocked output, the col endpoint's
    (equal and opposite) into persistent VMEM scratch — the same dual
    row/col accumulation layout as the forward, at half the pair work of a
    symmetric-closure backward.
    """
    r = pl.program_id(0)
    c = pl.program_id(1)
    nr = pl.num_programs(0)
    nc = pl.num_programs(1)

    rows = pl.ds(r * blk, blk)
    cols = pl.ds(c * blk, blk)

    @pl.when(c == 0)
    def _():
        drow_ref[...] = jnp.zeros_like(drow_ref)

    @pl.when((r == 0) & (c == 0))
    def _():
        col_acc[...] = jnp.zeros_like(col_acc)

    @pl.when(live_ref[r * nc + c] > 0)
    def _():
        mr = meta_ref[:, rows]
        mc = meta_ref[:, cols]
        pr = pos_ref[:, rows]                  # [3, blk]
        pc = pos_ref[:, cols]
        wr = w_ref[0, rows].reshape(blk, 1)
        wc = w_ref[0, cols].reshape(1, blk)

        dx = pr[0].reshape(blk, 1) - pc[0].reshape(1, blk)
        dy = pr[1].reshape(blk, 1) - pc[1].reshape(1, blk)
        dz = pr[2].reshape(blk, 1) - pc[2].reshape(1, blk)
        # same eps-inside-sqrt as the forward: VJP of d = sqrt(d2 + eps)
        d = jnp.sqrt(dx * dx + dy * dy + dz * dz + 1e-10)

        ex_r, rad_r, ridx_r, slot_r = (mr[k].reshape(blk, 1) for k in range(4))
        ex_c, rad_c, ridx_c, slot_c = (mc[k].reshape(1, blk) for k in range(4))

        mask = ex_r * ex_c * (ridx_r < ridx_c)
        mask = mask * (1.0 - (slot_r < _BB_SLOTS) * (slot_c < _BB_SLOTS))
        mask = mask * (1.0 - (ridx_c == ridx_r + 1.0)
                       * (slot_r == _C_SLOT) * (slot_c == _N_SLOT))
        mask = mask * (1.0 - (slot_r == _SG_SLOT) * (slot_c == _SG_SLOT))

        active = (rad_r + rad_c - tol_soft - d > 0.0).astype(jnp.float32)
        # d err/d x_a = -mask*active*(x_a - x_b)/d, cotangent (w_a + w_b)
        coef = (wr + wc) * mask * active * (-1.0 / d)   # [blk, blk]

        gx = coef * dx
        gy = coef * dy
        gz = coef * dz
        drow_ref[0, :] += gx.sum(axis=1)
        drow_ref[1, :] += gy.sum(axis=1)
        drow_ref[2, :] += gz.sum(axis=1)
        # col endpoint: d err/d x_b = +mask*active*(x_a - x_b)/d
        col_acc[0, cols] += -gx.sum(axis=0)
        col_acc[1, cols] += -gy.sum(axis=0)
        col_acc[2, cols] += -gz.sum(axis=0)

    @pl.when((r == nr - 1) & (c == nc - 1))
    def _():
        dcol_ref[...] = col_acc[...]


@functools.partial(jax.jit, static_argnames=("tol_soft", "blk", "interpret",
                                              "spatial_sort"))
def _clash_grad_single(positions, atom_exists, atom_radius, residue_index, w,
                       tol_soft: float = 0.5, blk: int = 512,
                       interpret: bool = False, spatial_sort: bool = False):
    """d(sum(w * per_atom_loss))/d positions, unbatched. Returns [L, 14, 3]."""
    L = positions.shape[0]
    pos3, meta, A, A_pad, perm = _pack_atoms(positions, atom_exists,
                                             atom_radius, residue_index, blk,
                                             spatial_sort=spatial_sort)
    w_flat = w.reshape(A).astype(jnp.float32)
    if perm is not None:
        w_flat = w_flat[perm]
    w_pad = jnp.pad(w_flat, (0, A_pad - A))[None]
    nblk = A_pad // blk
    live = _tile_live_matrix(pos3, meta, blk, tol_soft).reshape(-1)

    drow, dcol = pl.pallas_call(
        functools.partial(_clash_grad_kernel, tol_soft=tol_soft, blk=blk),
        grid=(nblk, nblk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((3, blk), lambda r, c: (0, r),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, A_pad), lambda r, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, A_pad), jnp.float32),
            jax.ShapeDtypeStruct((3, A_pad), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((3, A_pad), jnp.float32)],
        interpret=interpret,
    )(live, pos3, meta, w_pad)

    dpos = (drow + dcol)[:, :A].T                       # [A, 3] sorted order
    if perm is not None:
        dpos = jnp.zeros_like(dpos).at[perm].set(dpos)
    return dpos.reshape(L, 14, 3).astype(positions.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _clash_diff_single(positions, atom_exists, atom_radius, residue_index,
                       tol_soft, blk, interpret, spatial_sort):
    return _clash_pallas_single(positions, atom_exists, atom_radius,
                                residue_index, tol_soft=tol_soft, blk=blk,
                                interpret=interpret, spatial_sort=spatial_sort)


def _clash_diff_fwd(positions, atom_exists, atom_radius, residue_index,
                    tol_soft, blk, interpret, spatial_sort):
    out = _clash_pallas_single(positions, atom_exists, atom_radius,
                               residue_index, tol_soft=tol_soft, blk=blk,
                               interpret=interpret, spatial_sort=spatial_sort)
    # remat: residuals are the O(A) inputs, never the O(A^2) pair tensors
    return out, (positions, atom_exists, atom_radius, residue_index)


def _clash_diff_bwd(tol_soft, blk, interpret, spatial_sort, res, g):
    positions, atom_exists, atom_radius, residue_index = res
    # backward tiles hold ~6 live [blk, blk] f32 intermediates; blk=1024
    # exceeds the 16 MB scoped-VMEM stack (measured OOM at 18.05 MB), so
    # the backward runs at 512 regardless of the forward tile size
    dpos = _clash_grad_single(positions, atom_exists, atom_radius,
                              residue_index, g, tol_soft=tol_soft,
                              blk=min(blk, 512), interpret=interpret,
                              spatial_sort=spatial_sort)
    # exists/radius/residue_index are chemistry constants along the only
    # differentiable path (torsions -> coordinates); callers pass them f32
    return (dpos, jnp.zeros_like(atom_exists), jnp.zeros_like(atom_radius),
            jnp.zeros_like(residue_index))


_clash_diff_single.defvjp(_clash_diff_fwd, _clash_diff_bwd)


def between_residue_clash_diff(positions, atom_exists, atom_radius,
                               residue_index, tol_soft: float = 0.5,
                               blk: int = 1024, interpret: bool = False,
                               spatial_sort: bool = False):
    """Batched DIFFERENTIABLE per-atom between-residue clash loss [B, L, 14].

    Gradients flow to ``positions`` only (exists/radius/index receive
    zeros — they are not functions of the torsions being optimized).
    Gradient parity vs the lax.scan path is locked by
    tests/test_pallas_clash.py.

    Per-tile AABB culling (``_tile_live_matrix``) always skips spatially
    distant tiles — the pair work drops from O(A^2) to ~O(A * local
    density). ``spatial_sort`` (default OFF — measured net loss, see
    module docstring) additionally Morton-orders atoms for denser culling;
    values and gradients are the same sums up to float reassociation
    (tested).
    """
    fn = functools.partial(_clash_diff_single, tol_soft=tol_soft, blk=blk,
                           interpret=interpret, spatial_sort=spatial_sort)
    return jax.vmap(lambda p, e, r, i: fn(p, e, r, i))(
        positions, atom_exists.astype(positions.dtype),
        atom_radius.astype(positions.dtype),
        residue_index.astype(positions.dtype))


def sc_clash_screen(coords, atom_mask, residue_type, residue_index,
                    clash_overlap_tolerance: float = 0.5,
                    interpret: bool = False, spatial_sort: bool = False):
    """Fast forward-only per-atom BETWEEN-residue clash for screening /
    scoring paths (no within-residue bound terms, no gradient)."""
    radius = jnp.asarray(CHEM.vdw_radius_atom14)[residue_type] * atom_mask
    return between_residue_clash_pallas(coords, atom_mask, radius, residue_index,
                                        tol_soft=clash_overlap_tolerance,
                                        interpret=interpret,
                                        spatial_sort=spatial_sort)
