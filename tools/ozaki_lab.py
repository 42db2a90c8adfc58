"""Ozaki-scheme f64 GEMM on the MXU — lab validation.

XLA's emulated-f64 GEMM runs at 0.05-0.15 TF/s for the skinny
(K,N ~ 114-256) shapes the grid-XC chain uses (CLAUDE.md rate table) —
the vxc build costs ~165 ms/iteration at benzene/def2-SVP. The Ozaki
error-free transformation computes an f64-accurate product from bf16
slice GEMMs with EXACT f32 accumulation:

  A row-scaled to |r|<=1, sliced into w-bit integer chunks m_s (bf16
  holds ints < 2^8 exactly); likewise B column-scaled into m_t. Each
  dot(m_s, m_t) -> f32 accumulates integer products < 2^(2w) over K
  terms: exact while 2w + ceil(log2 K) <= 24. Recombine in f64:
  C = e_i f_n sum_{s+t<=U} 2^(-w(s+t)) C_st.

Shapes of interest (benzene def2-SVP, sg2 grid):
  dens:     (ng, nao) @ (nao, nao)   K=nao=114  -> w=8, 15 pairs
  assembly: (nao, ng) @ (ng, nao)    K=ng~78k   -> chunked K (512) w=7

Usage: python tools/ozaki_lab.py [M] [K] [N]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "highest")


def _row_slices(A, w, S):
    """Per-row scaled w-bit integer slices of A (M, K) -> list of bf16
    (M, K) slices + f64 row scale (M, 1). One fused traversal."""
    amax = jnp.max(jnp.abs(A), axis=1, keepdims=True)
    e = jnp.exp2(jnp.ceil(jnp.log2(jnp.maximum(amax, 1e-300))))
    y = A / e
    out = []
    for s in range(1, S + 1):
        g = jnp.exp2(jnp.float64(w * s))
        m = jnp.round(y * g)
        out.append(m.astype(jnp.bfloat16))
        y = y - m / g
    return out, e


def _col_slices(B, w, S):
    sl, f = _row_slices(B.T, w, S)
    return [m.T for m in sl], f.T


def ozaki_matmul(A, B, w=8, S=5, U=None, kc=None):
    """f64-accurate A @ B via bf16 slice GEMMs (see module docstring).
    kc: K-chunk size for exactness when K is large (None = no chunking;
    requires 2w + ceil(log2 K) <= 24)."""
    if U is None:
        U = S + 1
    M, K = A.shape
    K2, N = B.shape
    assert K == K2
    a_sl, e = _row_slices(A, w, S)
    b_sl, f = _col_slices(B, w, S)
    pairs = [(s, t) for s in range(1, S + 1) for t in range(1, S + 1)
             if s + t <= U]
    if kc is None:
        acc = jnp.zeros((M, N), jnp.float64)
        for s, t in pairs:
            c = jax.lax.dot_general(
                a_sl[s - 1], b_sl[t - 1],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = acc + c.astype(jnp.float64) * (2.0 ** (-w * (s + t)))
    else:
        assert K % kc == 0
        nc = K // kc
        acc = jnp.zeros((M, N), jnp.float64)
        for s, t in pairs:
            aa = a_sl[s - 1].reshape(M, nc, kc).transpose(1, 0, 2)
            bb = b_sl[t - 1].reshape(nc, kc, N)
            c = jax.lax.dot_general(
                aa, bb, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)   # (nc, M, N)
            acc = acc + c.astype(jnp.float64).sum(axis=0) \
                * (2.0 ** (-w * (s + t)))
    return acc * e * f


def sync(x):
    return float(np.asarray(jnp.ravel(x)[:1])[0])


def bench(fn, *args, reps=5):
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 78000
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 114
    N = int(sys.argv[3]) if len(sys.argv) > 3 else 114
    rng = np.random.default_rng(0)
    A = rng.standard_normal((M, K)) * np.exp(rng.uniform(-6, 2, (M, K)))
    B = rng.standard_normal((K, N)) * np.exp(rng.uniform(-6, 2, (K, N)))
    C_ref = A @ B
    scale = np.abs(A).max(axis=1)[:, None] * np.abs(B).max(axis=0)[None, :]

    Aj, Bj = jnp.asarray(A), jnp.asarray(B)
    kc = None if K <= 4096 else 512
    w = 8 if K <= 256 else 7
    S = 5 if w == 8 else 6
    fn = jax.jit(lambda a, b: ozaki_matmul(a, b, w=w, S=S, kc=kc))
    t0 = time.time()
    C = fn(Aj, Bj)
    C_np = np.asarray(C)
    err = np.abs(C_np - C_ref) / np.maximum(scale * K, 1e-300)
    print(f"[ozaki] M={M} K={K} N={N} w={w} S={S} kc={kc} "
          f"compile {time.time()-t0:.1f}s", flush=True)
    print(f"[ozaki] rel-to-scale err max={err.max():.2e}", flush=True)

    t = bench(fn, Aj, Bj)
    f64fn = jax.jit(lambda a, b: a @ b)
    t64 = bench(f64fn, Aj, Bj, reps=3)
    err64 = np.abs(np.asarray(f64fn(Aj, Bj)) - C_ref) / np.maximum(
        scale * K, 1e-300)
    print(f"[ozaki] ozaki {t*1e3:.2f} ms  vs XLA f64 {t64*1e3:.2f} ms "
          f"(f64 err {err64.max():.2e})", flush=True)


if __name__ == "__main__":
    main()
