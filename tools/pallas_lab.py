"""Microbenchmarks for a Pallas double-single (DS) f64-accurate ERI
matvec on the axon TPU.

The steady-state f64 SCF phase spends ~220 ms/iteration in the two
(nao^2, nao^2) f64 ERI matvecs (J via eri_j, K via eri_k) at nao=114 —
~65x off the HBM roofline (1.35 GB tensor, 819 GB/s on v5e -> ~1.7 ms).
XLA's emulated-f64 GEMV path is compute-bound on the VPU emulation, not
bandwidth-bound. A Pallas kernel that streams the ERI as two f32 planes
(hi = f32(x), lo = f32(x - hi)) and does the dot product in
double-single arithmetic (Dekker TwoProd + TwoSum compensated
accumulation) should run at streaming speed with ~1e-15 relative error.

Phases:
  1  XLA f64 matvec baseline (the production op)
  2  Pallas plain f32 GEMV (streaming upper bound, wrong accuracy)
  3  Pallas DS GEMV (the candidate) — timing + accuracy vs f64 host

Usage:  python tools/pallas_lab.py [n] [phases]
        n defaults to 12996 (=114^2); phases e.g. "123"
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

# Mosaic legalization: under jax_enable_x64, python-int literals in
# BlockSpec index maps trace as i64 and the TPU compiler fails with
# "failed to legalize operation 'func.return'" — cast every index-map
# constant to i32 (tools/pallas_bisect.py)
I0 = None
jax.config.update("jax_default_matmul_precision", "highest")


def sync(x):
    """Real device sync through the axon tunnel (block_until_ready is a
    no-op there): fetch one element."""
    return float(np.asarray(jnp.ravel(x)[:1])[0])


def bench(fn, *args, reps=5):
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps


# ---------------------------------------------------------------------------
# DS GEMV pallas kernel
# ---------------------------------------------------------------------------

def ds_gemv(e_hi, e_lo, d_hi, d_lo, q_blk=2048, p_blk=512):
    """y[q] = sum_p E[p, q] d[p] with E = e_hi + e_lo (f32 planes of an
    f64 matrix), d = d_hi + d_lo, in double-single arithmetic.

    Returns (y_hi, y_lo) f32 planes; y_hi + y_lo ~ f64 result to ~1e-15
    relative. Shapes: e_* (P, Q), d_* (P,) with P, Q multiples of the
    block sizes (pad with zeros)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P, Q = e_hi.shape
    assert P % p_blk == 0 and Q % q_blk == 0, (P, Q, p_blk, q_blk)
    d2_hi = d_hi.reshape(P, 1)
    d2_lo = d_lo.reshape(P, 1)

    grid = (Q // q_blk, P // p_blk)   # q outer, p inner (accumulate)

    def kernel(eh_ref, el_ref, dh_ref, dl_ref, yh_ref, yl_ref, acc):
        pi = pl.program_id(1)
        np_ = pl.num_programs(1)

        @pl.when(pi == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        eh = eh_ref[:]                       # (p_blk, q_blk) f32
        el = el_ref[:]
        dh = dh_ref[:]                       # (p_blk, 1): broadcast over q
        dl = dl_ref[:]

        # Dekker split of eh (dh is split implicitly via the fma-free
        # TwoProd): eh = e1 + e2 with e1 having <=12 mantissa bits
        c = eh * 4097.0
        e1 = c - (c - eh)
        e2 = eh - e1
        cd = dh * 4097.0
        d1 = cd - (cd - dh)
        d2 = dh - d1
        # TwoProd(eh, dh) = (p, perr) exactly
        p = eh * dh
        perr = ((e1 * d1 - p) + e1 * d2 + e2 * d1) + e2 * d2
        # cross terms (single precision suffices: |lo| ~ 2^-24 |hi|)
        perr = perr + eh * dl + el * dh + el * dl

        # reduce the p_blk rows of (p, perr) into one (8, q_blk) slab
        # pairwise: sum rows in f32 would lose 2^-24 * p_blk — instead
        # accumulate DS sequentially over p_blk/8 sub-slabs
        s = acc[0:8, :]
        cc = acc[8:16, :]
        for i in range(p_blk // 8):
            t = p[8 * i:8 * i + 8, :]
            te = perr[8 * i:8 * i + 8, :]
            # TwoSum(s, t)
            z = s + t
            bp = z - s
            err = (s - (z - bp)) + (t - bp)
            s = z
            cc = cc + (err + te)
        acc[0:8, :] = s
        acc[8:16, :] = cc

        @pl.when(pi == np_ - 1)
        def _():
            # fold the 8 sublane accumulators with TwoSum tree (3 levels)
            sv = acc[0:8, :]
            cv = acc[8:16, :]
            for half in (4, 2, 1):
                a = sv[:half, :]
                b = sv[half:2 * half, :]
                z = a + b
                bp = z - a
                err = (a - (z - bp)) + (b - bp)
                sv = z
                cv = cv[:half, :] + cv[half:2 * half, :] + err
            yh_ref[:] = sv[0:1, :]
            yl_ref[:] = cv[0:1, :]

    yh, yl = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((p_blk, q_blk), lambda qi, pi: (pi, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p_blk, q_blk), lambda qi, pi: (pi, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p_blk, 1), lambda qi, pi: (pi, jnp.int32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p_blk, 1), lambda qi, pi: (pi, jnp.int32(0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, q_blk), lambda qi, pi: (jnp.int32(0), qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_blk), lambda qi, pi: (jnp.int32(0), qi),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, Q), jnp.float32),
            jax.ShapeDtypeStruct((1, Q), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((16, q_blk), jnp.float32)],
    )(e_hi, e_lo, d2_hi, d2_lo)
    return yh[0], yl[0]


def f32_gemv(e_hi, d_hi, q_blk=2048, p_blk=512):
    """Plain f32 GEMV with f32 accumulation — streaming upper bound."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P, Q = e_hi.shape
    grid = (Q // q_blk, P // p_blk)

    def kernel(eh_ref, dh_ref, yh_ref, acc):
        pi = pl.program_id(1)
        np_ = pl.num_programs(1)

        @pl.when(pi == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        eh = eh_ref[:]
        dh = dh_ref[:]                     # (p_blk, 1)
        prod = eh * dh
        s = acc[:]
        for i in range(p_blk // 8):
            s = s + prod[8 * i:8 * i + 8, :]
        acc[:] = s

        @pl.when(pi == np_ - 1)
        def _():
            yh_ref[:] = acc[:].sum(axis=0, keepdims=True)

    yh = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((p_blk, q_blk), lambda qi, pi: (pi, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p_blk, 1), lambda qi, pi: (pi, jnp.int32(0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_blk), lambda qi, pi: (jnp.int32(0), qi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Q), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, q_blk), jnp.float32)],
    )(e_hi, d_hi.reshape(P, 1))
    return yh[0]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12996
    phases = sys.argv[2] if len(sys.argv) > 2 else "123"
    q_blk = 2048
    p_blk = 512
    npad = -(-n // max(q_blk, p_blk)) * max(q_blk, p_blk)
    print(f"[pallas_lab] backend={jax.default_backend()} n={n} pad={npad}",
          flush=True)

    rng = np.random.default_rng(0)
    # ERI-like magnitudes: mostly small, some O(1-10)
    e = rng.standard_normal((n, n)) * np.exp(rng.uniform(-12, 2, (n, n)))
    e = 0.5 * (e + e.T)
    d = rng.standard_normal(n) * 0.1
    y_ref = e @ d

    ep = np.zeros((npad, npad))
    ep[:n, :n] = e
    dp = np.zeros(npad)
    dp[:n] = d

    e64 = jnp.asarray(ep)
    d64 = jnp.asarray(dp)

    if "1" in phases:
        t0 = time.perf_counter()
        f = jax.jit(lambda E, v: jnp.einsum("pq,p->q", E, v))
        t = bench(f, e64, d64, reps=3)
        err = np.abs(np.asarray(f(e64, d64))[:n] - y_ref).max()
        print(f"[1] XLA f64 matvec: {t*1e3:.2f} ms  maxerr={err:.2e} "
              f"(compile+bench {time.perf_counter()-t0:.1f}s)", flush=True)

    e_hi = jnp.asarray(ep, dtype=jnp.float32)
    e_lo = jnp.asarray(ep - np.asarray(e_hi, dtype=np.float64),
                       dtype=jnp.float32)
    d_hi = jnp.asarray(dp, dtype=jnp.float32)
    d_lo = jnp.asarray(dp - np.asarray(d_hi, dtype=np.float64),
                       dtype=jnp.float32)

    if "2" in phases:
        t0 = time.perf_counter()
        f = jax.jit(lambda a, b: f32_gemv(a, b, q_blk, p_blk))
        t = bench(f, e_hi, d_hi, reps=5)
        err = np.abs(np.asarray(f(e_hi, d_hi), dtype=np.float64)[:n]
                     - y_ref).max()
        gbs = (npad * npad * 4) / t / 1e9
        print(f"[2] pallas f32 GEMV: {t*1e3:.2f} ms ({gbs:.0f} GB/s)  "
              f"maxerr={err:.2e} (compile+bench "
              f"{time.perf_counter()-t0:.1f}s)", flush=True)

    if "3" in phases:
        t0 = time.perf_counter()
        f = jax.jit(lambda a, b, c, dd: ds_gemv(a, b, c, dd, q_blk, p_blk))
        t = bench(f, e_hi, e_lo, d_hi, d_lo, reps=5)
        yh, yl = f(e_hi, e_lo, d_hi, d_lo)
        y = np.asarray(yh, dtype=np.float64) + np.asarray(yl,
                                                          dtype=np.float64)
        err = np.abs(y[:n] - y_ref).max()
        rel = err / np.abs(y_ref).max()
        gbs = (npad * npad * 8) / t / 1e9
        print(f"[3] pallas DS GEMV: {t*1e3:.2f} ms ({gbs:.0f} GB/s)  "
              f"maxerr={err:.2e} rel={rel:.2e} (compile+bench "
              f"{time.perf_counter()-t0:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
