"""Fused double-single J+K Pallas kernel — lab validation at production
shape (nao=114, benzene def2-SVP).

The f64 SCF phase pays ~220 ms/iteration for J and K as two XLA f64
GEMVs over the 1.35 GB eri_j/eri_k tensors (11 GB/s effective — the
axon v5e's emulated-f64 matvec path; measured tools/pallas_stream*).
This kernel reads ONE tensor (the J-layout (ij|kl)) once as two f32
planes (hi = f32(T), lo = f32(T - hi)) and computes BOTH matrices in
double-single arithmetic (Dekker TwoProd + TwoSum compensated
accumulation), deferring the 128-lane fold to an exact f64 XLA epilogue:

  J[i,j] = sum_kl T[i,j,k,l] dm[k,l]      (contract axes 2,3)
  K[i,j] = sum_kl T[i,k,j,l] dm[k,l]      (contract axes 1,3)

Error: TwoProd is exact; TwoSum chains keep the compensation to
O(2^-48) per term; dropped terms (lo*lo products) are ~2^-48 relative.
Expected max abs error ~1e-12 at |J|~30.

Layout: T planes (n, n, B, L) f32 with k padded to B (multiple of 8)
and l padded to L=128 lanes; zero-padded (zeros are valid inputs —
dead-lane NaN rule, ops/chunks.py).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from jax.experimental import pallas as pl          # noqa: E402
from jax.experimental.pallas import tpu as pltpu   # noqa: E402

i32 = jnp.int32


def _round_up(x, m):
    return -(-x // m) * m


def ds_jk(t_hi, t_lo, dm, ab_blk=None):
    """(J, K) in f64 from DS planes of the J-layout ERI.

    t_hi/t_lo: (n, A, B, L) f32, A = n (j axis), B >= n (k axis, mult of
    8), L >= n (l axis, mult of 128), zero-padded.
    dm: (n, n) f64 density.
    """
    n, A, B, L = t_hi.shape
    assert A == n
    if ab_blk is None:
        # kernel temporaries (~8 block-sized f32 values) live on the
        # Mosaic VMEM stack — keep blocks small enough that
        # 8 * ab_blk * B * L * 4 + 2 * double-buffered inputs < 16 MB
        ab_blk = A
        for cand in (6, 3, 2):
            if A % cand == 0:
                ab_blk = A // cand
                break
    assert A % ab_blk == 0
    n_ab = A // ab_blk
    assert B % 8 == 0

    # dm planes, padded to (B, L), Dekker split precomputed
    dmp = jnp.zeros((B, L), jnp.float64).at[:n, :n].set(dm)
    dh = dmp.astype(jnp.float32)
    dl = (dmp - dh.astype(jnp.float64)).astype(jnp.float32)
    c = dh * jnp.float32(4097.0)
    d1 = c - (c - dh)
    d2 = dh - d1

    def kernel(th_ref, tl_ref, dh_ref, d1_ref, d2_ref, dl_ref,
               jh_ref, jl_ref, kh_ref, kl_ref, acc):
        ab = pl.program_id(1)
        nab = pl.num_programs(1)

        @pl.when(ab == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        V = th_ref[0]        # (ab_blk, B, L) f32
        Vl = tl_ref[0]
        dhv = dh_ref[:]      # (B, L)
        d1v = d1_ref[:]
        d2v = d2_ref[:]
        dlv = dl_ref[:]

        # Dekker split of V (shared by the J and K products)
        c = V * jnp.float32(4097.0)
        v1 = c - (c - V)
        v2 = V - v1

        # ---- J: contract (k, l) = (axis 1, axis 2) with dm[k,l] -------
        # TwoProd(V, dh) + cross terms
        pj = V * dhv[None]
        ej = ((v1 * d1v[None] - pj) + v1 * d2v[None] + v2 * d1v[None]) \
            + v2 * d2v[None]
        ej = ej + V * dlv[None] + Vl * dhv[None]
        # DS-reduce axis 1 (B rows) in 8-row slabs
        s = pj[:, 0:8, :]
        cc = ej[:, 0:8, :]
        for t in range(1, B // 8):
            tt = pj[:, 8 * t:8 * t + 8, :]
            z = s + tt
            bp = z - s
            err = (s - (z - bp)) + (tt - bp)
            s = z
            cc = cc + (err + ej[:, 8 * t:8 * t + 8, :])
        # fold 8 sublanes
        for half in (4, 2, 1):
            aa = s[:, :half, :]
            bb = s[:, half:2 * half, :]
            z = aa + bb
            bp = z - aa
            err = (aa - (z - bp)) + (bb - bp)
            s = z
            cc = cc[:, :half, :] + cc[:, half:2 * half, :] + err
        j0 = ab * ab_blk
        jh_ref[0, pl.ds(j0, ab_blk), :] = s[:, 0, :]
        jl_ref[0, pl.ds(j0, ab_blk), :] = cc[:, 0, :]

        # ---- K: contract (j, l) = (axis 0 of block, axis 2) ----------
        # dm rows for this j-block: dm[j0:j0+ab_blk, :] -> (ab_blk, 1, L)
        da = dh_ref[pl.ds(j0, ab_blk), :].reshape(ab_blk, 1, L)
        da1 = d1_ref[pl.ds(j0, ab_blk), :].reshape(ab_blk, 1, L)
        da2 = d2_ref[pl.ds(j0, ab_blk), :].reshape(ab_blk, 1, L)
        dal = dl_ref[pl.ds(j0, ab_blk), :].reshape(ab_blk, 1, L)
        pk = V * da
        ek = ((v1 * da1 - pk) + v1 * da2 + v2 * da1) + v2 * da2
        ek = ek + V * dal + Vl * da
        # DS-accumulate over the block's j rows into acc (2, B, L)
        sk = acc[0]
        ck = acc[1]
        for a in range(ab_blk):
            tt = pk[a]
            z = sk + tt
            bp = z - sk
            err = (sk - (z - bp)) + (tt - bp)
            sk = z
            ck = ck + (err + ek[a])
        acc[0] = sk
        acc[1] = ck

        @pl.when(ab == nab - 1)
        def _():
            kh_ref[0] = acc[0]
            kl_ref[0] = acc[1]

    jh, jl, kh, kl = pl.pallas_call(
        kernel,
        grid=(n, n_ab),
        in_specs=[
            pl.BlockSpec((1, ab_blk, B, L),
                         lambda i, ab: (i, ab, i32(0), i32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ab_blk, B, L),
                         lambda i, ab: (i, ab, i32(0), i32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, L), lambda i, ab: (i32(0), i32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, L), lambda i, ab: (i32(0), i32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, L), lambda i, ab: (i32(0), i32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, L), lambda i, ab: (i32(0), i32(0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # full-A revisited block: each ab step writes its slice (the
            # sublane dim of an output block must be %8 or full)
            pl.BlockSpec((1, A, L), lambda i, ab: (i, i32(0), i32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A, L), lambda i, ab: (i, i32(0), i32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, L), lambda i, ab: (i, i32(0), i32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, L), lambda i, ab: (i, i32(0), i32(0)),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, A, L), jnp.float32),
            jax.ShapeDtypeStruct((n, A, L), jnp.float32),
            jax.ShapeDtypeStruct((n, B, L), jnp.float32),
            jax.ShapeDtypeStruct((n, B, L), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((2, B, L), jnp.float32)],
    )(t_hi, t_lo, dh, d1, d2, dl)

    # exact f64 epilogue: lane fold of the DS pairs
    j = (jh.astype(jnp.float64) + jl.astype(jnp.float64)).sum(axis=-1)
    k = (kh.astype(jnp.float64) + kl.astype(jnp.float64)).sum(axis=-1)
    return j[:, :dm.shape[0]], k[:, :dm.shape[0]]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 114
    B = _round_up(n, 8)
    L = _round_up(n, 128)
    print(f"[jk_lab] n={n} B={B} L={L} planes "
          f"{2 * n * n * B * L * 4 / 1e9:.2f} GB", flush=True)

    rng = np.random.default_rng(0)
    t0 = time.time()
    # ERI-like: s8-symmetric-ish magnitudes; keep it simple: symmetric in
    # (ij)<->(kl) not required for kernel correctness
    T = rng.standard_normal((n, n, n, n)) * np.exp(
        rng.uniform(-10, 1, (n, n, n, n)))
    dm = rng.standard_normal((n, n))
    dm = 0.5 * (dm + dm.T)
    print(f"[jk_lab] host data built in {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    j_ref = np.einsum("ijkl,kl->ij", T, dm, optimize=True)
    k_ref = np.einsum("ikjl,kl->ij", T, dm, optimize=True)
    print(f"[jk_lab] host reference in {time.time()-t0:.1f}s", flush=True)

    Tp = np.zeros((n, n, B, L), dtype=np.float64)
    Tp[:, :, :n, :n] = T
    th = Tp.astype(np.float32)
    tl = (Tp - th.astype(np.float64)).astype(np.float32)
    th = jnp.asarray(th)
    tl = jnp.asarray(tl)
    dmj = jnp.asarray(dm)

    fn = jax.jit(ds_jk)
    t0 = time.time()
    j, k = fn(th, tl, dmj)
    j_np = np.asarray(j)
    k_np = np.asarray(k)
    print(f"[jk_lab] first call (compile) {time.time()-t0:.1f}s", flush=True)

    ej = np.abs(j_np - j_ref).max()
    ek = np.abs(k_np - k_ref).max()
    print(f"[jk_lab] maxerr J={ej:.3e} K={ek:.3e} "
          f"(|J|max={np.abs(j_ref).max():.1f})", flush=True)

    # timing
    def sync(x):
        return float(np.asarray(jnp.ravel(x)[:1])[0])

    sync(fn(th, tl, dmj)[0])
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        j, k = fn(th, tl, dmj)
    sync(j)
    dt = (time.perf_counter() - t0) / reps
    gb = 2 * n * n * B * L * 4 / 1e9
    print(f"[jk_lab] fused J+K: {dt*1e3:.2f} ms ({gb/dt:.0f} GB/s) "
          f"vs ~220 ms for two XLA f64 GEMVs", flush=True)

    # XLA f64 baseline on the same machine for honesty
    T64 = jnp.asarray(T)
    f64 = jax.jit(lambda E, d: (jnp.einsum("ijkl,kl->ij", E, d),
                                jnp.einsum("ikjl,kl->ij", E, d)))
    jj, kk = f64(T64, dmj)
    sync(jj)
    t0 = time.perf_counter()
    for _ in range(3):
        jj, kk = f64(T64, dmj)
    sync(jj)
    dt64 = (time.perf_counter() - t0) / 3
    print(f"[jk_lab] XLA f64 J+K: {dt64*1e3:.2f} ms  "
          f"(err J={np.abs(np.asarray(jj)-j_ref).max():.2e})", flush=True)


if __name__ == "__main__":
    main()
