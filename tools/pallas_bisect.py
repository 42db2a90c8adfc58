"""Bisect Mosaic legalization failures on the axon TPU: start from a
trivial kernel and add features until it breaks."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_enable_x64", True)

print("jax", jax.__version__, flush=True)


def run(tag, fn, *args):
    t0 = time.perf_counter()
    try:
        out = jax.jit(fn)(*args)
        val = np.asarray(jax.tree_util.tree_leaves(out)[0])
        print(f"[{tag}] OK {val.ravel()[:2]} ({time.perf_counter()-t0:.1f}s)",
              flush=True)
    except Exception as ex:
        msg = str(ex).split("\n")[0][:160]
        print(f"[{tag}] FAIL {type(ex).__name__}: {msg}", flush=True)


x = jnp.arange(8 * 256, dtype=jnp.float32).reshape(8, 256)

# 1. trivial
def k1(i_ref, o_ref):
    o_ref[:] = i_ref[:] * 2.0

run("copy", lambda a: pl.pallas_call(
    k1, out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(a), x)

# 2. grid + accumulation scratch (the GEMV skeleton, tiny)
P, Q, p_blk, q_blk = 512, 512, 128, 256
e = jnp.ones((P, Q), jnp.float32)
d = jnp.ones((P, 1), jnp.float32)


def k2(e_ref, d_ref, y_ref, acc):
    pi = pl.program_id(1)

    @pl.when(pi == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    prod = e_ref[:] * d_ref[:]
    s = acc[:]
    for i in range(p_blk // 8):
        s = s + prod[8 * i:8 * i + 8, :]
    acc[:] = s

    @pl.when(pi == pl.num_programs(1) - 1)
    def _():
        y_ref[:] = acc[:].sum(axis=0, keepdims=True)


run("gemv-skel", lambda a, b: pl.pallas_call(
    k2, grid=(Q // q_blk, P // p_blk),
    in_specs=[
        pl.BlockSpec((p_blk, q_blk), lambda qi, pi: (pi, qi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((p_blk, 1), lambda qi, pi: (pi, 0),
                     memory_space=pltpu.VMEM),
    ],
    out_specs=pl.BlockSpec((1, q_blk), lambda qi, pi: (0, qi),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((1, Q), jnp.float32),
    scratch_shapes=[pltpu.VMEM((8, q_blk), jnp.float32)])(a, b), e, d)

# 3. same but multiple outputs (list)
def k3(e_ref, d_ref, y1_ref, y2_ref, acc):
    pi = pl.program_id(1)

    @pl.when(pi == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    acc[:] = acc[:] + e_ref[0:8, :] * d_ref[0, 0]

    @pl.when(pi == pl.num_programs(1) - 1)
    def _():
        y1_ref[:] = acc[:].sum(axis=0, keepdims=True)
        y2_ref[:] = acc[:].sum(axis=0, keepdims=True)


run("two-out", lambda a, b: pl.pallas_call(
    k3, grid=(Q // q_blk, P // p_blk),
    in_specs=[
        pl.BlockSpec((p_blk, q_blk), lambda qi, pi: (pi, qi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((p_blk, 1), lambda qi, pi: (pi, 0),
                     memory_space=pltpu.VMEM),
    ],
    out_specs=[
        pl.BlockSpec((1, q_blk), lambda qi, pi: (0, qi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, q_blk), lambda qi, pi: (0, qi),
                     memory_space=pltpu.VMEM),
    ],
    out_shape=[jax.ShapeDtypeStruct((1, Q), jnp.float32),
               jax.ShapeDtypeStruct((1, Q), jnp.float32)],
    scratch_shapes=[pltpu.VMEM((8, q_blk), jnp.float32)])(a, b), e, d)

import os
os._exit(0)
