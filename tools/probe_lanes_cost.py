"""Bisect the geom_lanes kernel's 33x slowdown: time each suspect building
block standalone inside minimal Pallas kernels at the production block
shape (blk=64, K=32 -> C=2048, H=128, R=80)."""
from __future__ import annotations

import functools
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from packppi_tpu.utils.platform import configure_platform

configure_platform(os.environ.get("PACKPPI_BENCH_PLATFORM"))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, C, K, R, P = 128, 2048, 32, 80, 8
BLK = C // K
f32 = jnp.float32

x_hc = jax.random.normal(jax.random.key(0), (H, C), f32)
node = jax.random.normal(jax.random.key(1), (BLK, R), f32)
ngT = jax.random.normal(jax.random.key(2), (3 * P, C), f32)


def _floor():
    tiny = jax.jit(lambda s: s + 1.0)
    float(tiny(jnp.zeros(())))
    return min((lambda t0: (float(tiny(jnp.zeros(()))), time.perf_counter() - t0)[1])(time.perf_counter())
               for _ in range(5))


FLOOR = None
REP = 512


def bench(name, fn, *args):
    global FLOOR
    try:
        jfn = jax.jit(fn)
        jax.block_until_ready(jfn(*args))
        if FLOOR is None:
            FLOOR = _floor()

        @jax.jit
        def rep(*a):
            def body(acc, _):
                out = jfn(a[0] + acc * 1e-20, *a[1:])
                return acc + out.reshape(-1)[0], None
            o, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(REP))
            return o
        float(rep(*args))
        best = min((lambda t0: (float(rep(*args)), time.perf_counter() - t0)[1])(time.perf_counter())
                   for _ in range(3))
        print(json.dumps({"block": name,
                          "us": round(max(best - FLOOR, 0) / REP * 1e6, 2)}),
              flush=True)
    except Exception as e:
        print(json.dumps({"block": name,
                          "error": f"{type(e).__name__}: {e}"[:200]}), flush=True)


def pcall(kernel, out_shape, n_in):
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=out_shape)


# a. in-kernel transpose [H, C] -> [C, H]
def k_t(x_ref, o_ref):
    o_ref[...] = x_ref[...].T


bench("transpose_HC", pcall(k_t, jax.ShapeDtypeStruct((C, H), f32), 1), x_hc)


# b. dot_general contract-dim-0 (node^T @ E)
def k_dg(n_ref, o_ref):
    lane_node = jax.lax.broadcasted_iota(jnp.int32, (BLK, C), 1) // K
    row_node = jax.lax.broadcasted_iota(jnp.int32, (BLK, C), 0)
    E = (lane_node == row_node).astype(f32)
    o_ref[...] = jax.lax.dot_general(
        n_ref[...], E, (((0,), (0,)), ((), ())),
        preferred_element_type=f32,
        precision=jax.lax.Precision.HIGHEST)


bench("onehot_expand_dg", pcall(k_dg, jax.ShapeDtypeStruct((R, C), f32), 1),
      node)


# c. the same without HIGHEST
def k_dg_def(n_ref, o_ref):
    lane_node = jax.lax.broadcasted_iota(jnp.int32, (BLK, C), 1) // K
    row_node = jax.lax.broadcasted_iota(jnp.int32, (BLK, C), 0)
    E = (lane_node == row_node).astype(f32)
    o_ref[...] = jax.lax.dot_general(
        n_ref[...], E, (((0,), (0,)), ((), ())),
        preferred_element_type=f32)


bench("onehot_expand_dg_default",
      pcall(k_dg_def, jax.ShapeDtypeStruct((R, C), f32), 1), node)


# d. odd-offset single-row sublane slices (the r_row/t_row reads)
def k_rows(g_ref, o_ref):
    rep = g_ref[...]
    acc = jnp.zeros((1, C), f32)
    for i in range(12):
        acc = acc + rep[41 + i:42 + i]
    o_ref[...] = acc


grid_in = jax.random.normal(jax.random.key(3), (R, C), f32)
bench("odd_row_slices_x12",
      pcall(k_rows, jax.ShapeDtypeStruct((1, C), f32), 1), grid_in)


# e. the geometry VPU math alone, lane-major (inputs pre-expanded)
def k_geom(ng_ref, rep_ref, o_ref):
    ngT = ng_ref[...]
    rep = rep_ref[...]
    ngx, ngy, ngz = ngT[:P], ngT[P:2 * P], ngT[2 * P:]
    r_row = lambda i: rep[4 * P + i:4 * P + i + 1]
    t_row = lambda i: rep[4 * P + 9 + i:4 * P + 10 + i]
    dx = ngx - t_row(0)
    dy = ngy - t_row(1)
    dz = ngz - t_row(2)
    nlx = r_row(0) * dx + r_row(3) * dy + r_row(6) * dz
    nly = r_row(1) * dx + r_row(4) * dy + r_row(7) * dz
    nlz = r_row(2) * dx + r_row(5) * dy + r_row(8) * dz
    norm_nl = jnp.sqrt(nlx * nlx + nly * nly + nlz * nlz + 1e-8)
    pgr = rep[4 * P + 12:7 * P + 12]
    ddx = pgr[:P] - ngx
    ddy = pgr[P:2 * P] - ngy
    ddz = pgr[2 * P:] - ngz
    norm_pair = jnp.sqrt(ddx * ddx + ddy * ddy + ddz * ddz + 1e-8)
    o_ref[...] = jnp.concatenate(
        [rep[:3 * P], rep[3 * P:4 * P], nlx, nly, nlz, norm_nl, norm_pair], 0)


bench("lane_major_geom_math",
      pcall(k_geom, jax.ShapeDtypeStruct((9 * P, C), f32), 2), ngT, grid_in)


# f. W^T @ featT [H,72]x[72,C]
wT = jax.random.normal(jax.random.key(4), (H, 9 * P), f32)
featT = jax.random.normal(jax.random.key(5), (9 * P, C), f32)


def k_wdot(w_ref, f_ref, o_ref):
    o_ref[...] = jnp.dot(w_ref[...].astype(jnp.bfloat16),
                         f_ref[...].astype(jnp.bfloat16),
                         preferred_element_type=f32)


bench("wT_featT_dot", pcall(k_wdot, jax.ShapeDtypeStruct((H, C), f32), 2),
      wT, featT)


# g. expansion via bf16x3 decomposition: 3 default-precision bf16 dots
def k_dg3(n_ref, o_ref):
    lane_node = jax.lax.broadcasted_iota(jnp.int32, (BLK, C), 1) // K
    row_node = jax.lax.broadcasted_iota(jnp.int32, (BLK, C), 0)
    E = (lane_node == row_node).astype(jnp.bfloat16)
    x = n_ref[...]
    acc = jnp.zeros((R, C), f32)
    for _ in range(3):
        hi = x.astype(jnp.bfloat16)
        acc = acc + jax.lax.dot_general(
            hi, E, (((0,), (0,)), ((), ())), preferred_element_type=f32)
        x = x - hi.astype(f32)
    o_ref[...] = acc


bench("onehot_expand_bf16x3",
      pcall(k_dg3, jax.ShapeDtypeStruct((R, C), f32), 1), node)


# exactness check of the bf16x3 expansion on global-coordinate-scale values
big = jax.random.normal(jax.random.key(9), (BLK, R), f32) * 100.0
out3 = jax.jit(pcall(k_dg3, jax.ShapeDtypeStruct((R, C), f32), 1))(big)
want = np.repeat(np.asarray(big).T, K, axis=1)
print(json.dumps({"block": "bf16x3_exact",
                  "max_abs_err": float(np.abs(np.asarray(out3) - want).max())}),
      flush=True)


# h. W dot in f32 default precision (no bf16 cast of the 72-row operand)
def k_wdot_f32(w_ref, f_ref, o_ref):
    o_ref[...] = jnp.dot(w_ref[...], f_ref[...], preferred_element_type=f32)


bench("wT_featT_dot_f32_default",
      pcall(k_wdot_f32, jax.ShapeDtypeStruct((H, C), f32), 2), wT, featT)


# i. W dot with featT padded to 80 rows, bf16
wT80 = jnp.pad(wT, ((0, 0), (0, 8)))
featT80 = jnp.pad(featT, ((0, 8), (0, 0)))


def k_wdot80(w_ref, f_ref, o_ref):
    o_ref[...] = jnp.dot(w_ref[...].astype(jnp.bfloat16),
                         f_ref[...].astype(jnp.bfloat16),
                         preferred_element_type=f32)


bench("wT80_featT80_dot_bf16",
      pcall(k_wdot80, jax.ShapeDtypeStruct((H, C), f32), 2), wT80, featT80)


# j. the normal-orientation dot for comparison: [C,72]@[72,H] bf16
feat_n = jax.random.normal(jax.random.key(6), (C, 9 * P), f32)
w_n = jax.random.normal(jax.random.key(7), (9 * P, H), f32)


def k_wdot_n(f_ref, w_ref, o_ref):
    o_ref[...] = jnp.dot(f_ref[...].astype(jnp.bfloat16),
                         w_ref[...].astype(jnp.bfloat16),
                         preferred_element_type=f32)


bench("feat_w_dot_normal_bf16",
      pcall(k_wdot_n, jax.ShapeDtypeStruct((C, H), f32), 2), feat_n, w_n)
