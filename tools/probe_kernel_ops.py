"""Probe round 3: Mosaic support for the lane-major geometry kernel's
building blocks — in-kernel transpose, lane-repeat (broadcast per-node
values across K edge lanes), and rsqrt/sqrt on [8, C] tiles."""
from __future__ import annotations

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

H, C, K = 128, 2048, 32
BLK = C // K
x = jax.random.normal(jax.random.key(0), (H, C), jnp.float32)
t = jax.random.normal(jax.random.key(1), (8, BLK), jnp.float32)


def probe(name, fn, want=None):
    try:
        out = np.asarray(jax.jit(fn)())
        ok = None if want is None else bool(np.allclose(out, want, atol=1e-6))
        print(json.dumps({"mech": name, "compiles": True, "exact": ok,
                          "shape": list(out.shape)}), flush=True)
    except Exception as e:
        print(json.dumps({"mech": name, "compiles": False,
                          "error": f"{type(e).__name__}: {e}"[:200]}), flush=True)


# 1. in-kernel transpose [H, C] -> [C, H]
def k_transpose(x_ref, o_ref):
    o_ref[...] = x_ref[...].T


probe("transpose_128x2048",
      lambda: pl.pallas_call(
          k_transpose,
          in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
          out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
          out_shape=jax.ShapeDtypeStruct((C, H), jnp.float32))(x),
      want=np.asarray(x).T)

# 2. lane-repeat: [8, BLK] -> [8, BLK*K] (each lane repeated K times)
want_rep = np.repeat(np.asarray(t), K, axis=1)


def k_lane_repeat_jnp(t_ref, o_ref):
    o_ref[...] = jnp.repeat(t_ref[...], K, axis=1,
                            total_repeat_length=C)


probe("lane_repeat_jnp",
      lambda: pl.pallas_call(
          k_lane_repeat_jnp,
          in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
          out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
          out_shape=jax.ShapeDtypeStruct((8, C), jnp.float32))(t),
      want=want_rep)


def k_lane_repeat_mxu(t_ref, o_ref):
    # expansion matrix E[b, b*K+k] = 1 via iota compare, [BLK, C]
    rowq = jax.lax.broadcasted_iota(jnp.int32, (BLK, C), 1) // K
    rows = jax.lax.broadcasted_iota(jnp.int32, (BLK, C), 0)
    E = (rowq == rows).astype(jnp.float32)
    o_ref[...] = jnp.dot(t_ref[...], E,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)


probe("lane_repeat_onehot_mxu",
      lambda: pl.pallas_call(
          k_lane_repeat_mxu,
          in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
          out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
          out_shape=jax.ShapeDtypeStruct((8, C), jnp.float32))(t),
      want=want_rep)


# 3. reshape [BLK, K] -> [1, C] (lane collapse) and back
def k_reshape(t_ref, o_ref):
    v = t_ref[...]                       # [BLK, K]
    o_ref[...] = v.reshape(1, C)


tb = jax.random.normal(jax.random.key(2), (BLK, K), jnp.float32)
probe("reshape_blkK_to_1C",
      lambda: pl.pallas_call(
          k_reshape,
          in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
          out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
          out_shape=jax.ShapeDtypeStruct((1, C), jnp.float32))(tb),
      want=np.asarray(tb).reshape(1, C))

# 4. gather along LANES outside kernels: pg_T [24, L] at idx -> [24, N]
L, P3, N = 768, 24, 4096
pgT = jax.random.normal(jax.random.key(3), (P3, L), jnp.float32)
idx = jax.random.randint(jax.random.key(4), (N,), 0, L, jnp.int32)
want_l = np.asarray(pgT)[:, np.asarray(idx)]
probe("xla_lane_gather_24xN",
      lambda: jnp.take_along_axis(
          pgT, jnp.broadcast_to(idx[None, :], (P3, N)), axis=1),
      want=want_l)
