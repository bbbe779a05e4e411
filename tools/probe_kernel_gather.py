"""Probe: which in-kernel gather mechanisms lower in Mosaic on this chip.

The r5 sampler lever (VERDICT r4 item 1) needs the per-pass neighbor
gathers to happen INSIDE a Pallas kernel (so the gathered rows never take
an HBM round trip before the message matmuls). Candidate mechanisms:

  a. jnp.take_along_axis on a VMEM-resident table
  b. jnp.take (1-D indices)
  c. one-hot MXU contraction built from an iota compare
  d. scalar fori_loop of dynamic row slices

Each is probed standalone (compile + value check + rough timing at the
T1124 message-pass shape: gather [L=768, H=128] rows at [blk*K=4096]
indices). Prints one JSON line per mechanism.
"""
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

L, H, N = 768, 128, 4096
key = jax.random.key(0)
table = jax.random.normal(key, (L, H), jnp.float32)
idx = jax.random.randint(jax.random.key(1), (N,), 0, L, jnp.int32)
want = np.asarray(table)[np.asarray(idx)]


def _run(name, kernel, extra_specs=(), extra_args=()):
    try:
        fn = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM), *extra_specs],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, H), jnp.float32),
        )
        jfn = jax.jit(lambda t, i, *a: fn(t, i, *a))
        out = np.asarray(jfn(table, idx, *extra_args))
        ok = bool(np.array_equal(out, want))
        # rough timing: scan-of-64 inside one jit
        @jax.jit
        def rep(t, i, *a):
            def body(acc, _):
                return acc + fn(t, i, *a).sum(), None
            o, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(64))
            return o
        float(rep(table, idx, *extra_args))
        t0 = time.perf_counter()
        float(rep(table, idx, *extra_args))
        dt = (time.perf_counter() - t0) / 64
        print(json.dumps({"mech": name, "compiles": True, "exact": ok,
                          "us_per_call": round(dt * 1e6, 1)}), flush=True)
    except Exception as e:
        msg = f"{type(e).__name__}: {e}"
        print(json.dumps({"mech": name, "compiles": False,
                          "error": msg[:300]}), flush=True)


def k_take_along(t_ref, i_ref, o_ref):
    o_ref[...] = jnp.take_along_axis(
        t_ref[...], i_ref[...][:, None].astype(jnp.int32), axis=0)


def k_take(t_ref, i_ref, o_ref):
    o_ref[...] = jnp.take(t_ref[...], i_ref[...], axis=0)


def k_onehot(t_ref, i_ref, o_ref):
    oh = (i_ref[...][:, None] == jax.lax.broadcasted_iota(
        jnp.int32, (1, L), 1)).astype(jnp.float32)          # [N, L]
    o_ref[...] = jnp.dot(oh, t_ref[...],
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)


def k_onehot_default(t_ref, i_ref, o_ref):
    oh = (i_ref[...][:, None] == jax.lax.broadcasted_iota(
        jnp.int32, (1, L), 1)).astype(jnp.float32)
    o_ref[...] = jnp.dot(oh, t_ref[...], preferred_element_type=jnp.float32)


def k_onehot_chunked(t_ref, i_ref, o_ref):
    C = 512
    tbl = t_ref[...]
    iv = i_ref[...]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    def body(c, _):
        sl = pl.ds(c * C, C)
        oh = (iv[sl][:, None] == iota).astype(jnp.float32)
        o_ref[sl, :] = jnp.dot(oh, tbl, preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
        return 0
    jax.lax.fori_loop(0, N // C, body, 0)


def k_loop_rows(t_ref, i_ref, o_ref):
    def body(n, _):
        o_ref[pl.ds(n, 1), :] = t_ref[pl.ds(i_ref[n], 1), :]
        return 0
    jax.lax.fori_loop(0, N, body, 0)


_run("take_along_axis", k_take_along)
_run("take", k_take)
_run("onehot_highest", k_onehot)
_run("onehot_default", k_onehot_default)
_run("onehot_chunked512", k_onehot_chunked)
_run("fori_row_slices", k_loop_rows)

# baseline: the XLA gather outside any kernel, same shape
g = jax.jit(lambda t, i: jnp.take_along_axis(
    t, i[:, None], axis=0, mode="clip"))
np.testing.assert_array_equal(np.asarray(g(table, idx)), want)


@jax.jit
def rep(t, i):
    def body(acc, _):
        return acc + g(t, i).sum(), None
    o, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(64))
    return o


float(rep(table, idx))
t0 = time.perf_counter()
float(rep(table, idx))
print(json.dumps({"mech": "xla_gather_baseline",
                  "us_per_call": round((time.perf_counter() - t0) / 64 * 1e6, 1)}),
      flush=True)
