"""Ozaki-scheme f64 GEMM on the MXU (error-free bf16 slice products).

XLA's emulated-f64 GEMM runs at 0.05-0.15 TF/s for the skinny
(K,N ~ 114) shapes of the grid-XC chain (CLAUDE.md rate table). The
Ozaki error-free transformation gets f64-grade products from native
bf16 MXU GEMMs:

  A is row-scaled to |r| <= 1 and sliced into w-bit integer chunks
  m_s = round(y 2^{ws}) (integers < 2^{w-1}, exactly representable in
  bf16); B likewise column-scaled. dot(m_s, m_t) -> f32 accumulates
  integer products < 2^{2w}: EXACT while 2w + ceil(log2 K) <= 24.
  Recombination in f64: C = e_i f_n sum_{s+t<=U} 2^{-w(s+t)} C_st.

Measured on the axon v5e (tools/ozaki_lab.py): (78k,114)@(114,114)
10.2 ms vs 25.5 ms XLA f64; (114,78k)@(78k,114) chunked-K 11.3 vs
18.4 ms; error ~2e-13 relative to (rowmax*colmax*K).

FORWARD-ONLY: the slice extraction uses round(), whose derivative is
zero — these ops MUST NOT appear in differentiated programs. They are
derived hot-loop data: built into run()-materialized theta only
(qccalc._maybe_expand_j -> integrity.maybe_build_ozaki), popped from
adjoint-traced theta (scf/adjoint.py); traced gradient paths rebuild
theta via _build_theta, which never creates them.

Reference parity: the contractions served are the density/vxc grid
matmuls of dqc/hamilton/hcgto.py:371-495; the reference has no
accelerated path for them.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def enabled() -> bool:
    """DEFAULT OFF: measured end-to-end on the axon v5e (benzene
    B3LYP/def2-SVP, r5), the sliced grid-GEMM path cuts the f64
    per-iteration cost 193 -> ~140 ms but destabilizes the DIIS
    trajectory and the device->host handoff near tol=1e-8 (the map
    acquires a ~4e-9-scale roughness floor by the purify metric; the
    host verifier reads 6x above the device exit and burns ~2 polish
    iterations), netting SLOWER steady solves than the einsum grid path
    (3.2-4.8 s vs 2.9 s). Kept as an opt-in experiment (DQC_TPU_OZAKI=1)
    — tools/ozaki_lab.py documents the per-GEMM win (2.5x) that a
    roughness-free recombination could bank."""
    env = os.environ.get("DQC_TPU_OZAKI", "0")
    if env != "1":
        return False
    return jax.default_backend() == "tpu"


def row_slices(A, w: int, S: int):
    """Per-row scaled w-bit integer slices: returns (slices, scale) with
    slices a list of S bf16 (M, K) arrays and scale f64 (M, 1).
    A ~= scale * sum_s slices_s * 2^{-w s}. Jit-able, one fused pass."""
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


def col_slices(B, w: int, S: int):
    """Column-scaled slices of B (K, N): (list of bf16 (K, N), f64 (1, N))."""
    sl, f = row_slices(B.T, w, S)
    return [m.T for m in sl], f.T


def matmul_sliced(a_sl, a_scale, b_sl, b_scale, w: int, U: int,
                  kc: int | None = None):
    """C = A @ B from precomputed slices. kc: K-chunk size when K is too
    large for direct exactness (2w + ceil(log2 K) <= 24)."""
    S = len(a_sl)
    T = len(b_sl)
    M = a_sl[0].shape[0]
    K = a_sl[0].shape[1]
    N = b_sl[0].shape[1]
    pairs = [(s, t) for s in range(1, S + 1) for t in range(1, T + 1)
             if s + t <= U]
    acc = jnp.zeros((M, N), jnp.float64)
    if kc is None:
        for s, t in pairs:
            c = jax.lax.dot_general(
                a_sl[s - 1], b_sl[t - 1],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = acc + c.astype(jnp.float64) * (2.0 ** (-w * (s + t)))
    else:
        assert K % kc == 0, (K, kc)
        nc = K // kc
        for s, t in pairs:
            aa = a_sl[s - 1].reshape(M, nc, kc).transpose(1, 0, 2)
            bb = b_sl[t - 1].reshape(nc, kc, N)
            c = jax.lax.dot_general(
                aa, bb, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            acc = acc + c.astype(jnp.float64).sum(axis=0) \
                * (2.0 ** (-w * (s + t)))
    return acc * a_scale * b_scale


# parameter presets: (w, S, U) chosen so the dropped tail is
# ~2^{-w(U-1)} <= 2^-40 relative to rowmax*colmax*K and accumulation is
# exact (2w + ceil(log2 Kc) <= 24)
def params_for_k(K: int):
    """(w, S, U, kc) for a contraction length K.

    The truncation tail must stay BELOW the SCF convergence target with
    margin: a ~2^-40-relative sawtooth in rho stalled the in-graph f64
    DIIS at ~3e-9 (15-it trajectory, r5); S=6/U=7 puts the tail at
    ~2^-48 for ~40% more slice-GEMM traffic."""
    if K <= 256:
        return 8, 6, 7, None
    # chunked: kc=512 -> 2*7+9=23 <= 24
    return 7, 7, 8, 512


def pad_k(A_cols: int, kc: int) -> int:
    """Padded K so the chunked path divides evenly."""
    return -(-A_cols // kc) * kc
