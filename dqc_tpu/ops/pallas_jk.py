"""Fused double-single (DS) J+K Pallas TPU kernel.

The f64 SCF hot loop pays ~220 ms/iteration at nao=114 for J and K as
two XLA emulated-f64 GEMVs over the 1.35 GB dense ERI layouts
(~11 GB/s effective; measured tools/pallas_stream*.py). This kernel
streams ONE tensor — the J-layout (ij|kl) ERI, stored as two f32 planes
(hi = f32(T), lo = f32(T - f64(hi))) — and computes BOTH matrices in one
pass with double-single arithmetic:

  J[i,j] = sum_kl T[i,j,k,l] dm[k,l]     (contract axes 2,3)
  K[i,j] = sum_kl T[i,k,j,l] dm[k,l]     (contract axes 1,3)

Measured at nao=114 on the axon v5e: 9.8 ms vs 193 ms for the two XLA
f64 einsums (~20x), max abs error ~2e-12 at |J|~190 (tools/
pallas_jk_lab.py). Accuracy comes from Dekker TwoProd (exact f32
product splitting) + TwoSum compensated accumulation, with the final
128-lane fold deferred to an exact f64 XLA epilogue.

TPU-specific hazards encoded here (hard-won, see CLAUDE.md):
  * under jax_enable_x64, python-int literals in BlockSpec index maps
    trace as i64 and Mosaic fails with "failed to legalize operation
    'func.return'" — every index-map constant is jnp.int32;
  * out-of-bounds block index maps WEDGE the TPU worker (all subsequent
    programs FailedPrecondition until a ~5 min recovery) — index maps
    here are static-shape-checked against the array shapes;
  * kernel temporaries live on the Mosaic VMEM stack (16 MB): the
    j-block size is chosen so ~8 block-sized f32 values + double-
    buffered inputs fit.

This op is FORWARD-ONLY (no AD rules): the DS planes are derived
tensors that exist only in run()-materialized theta (qccalc), never in
traced gradient programs (solve_dm rebuilds theta without them;
scf/adjoint.py pops them like eri_k/eri_j).

Reference parity: the J/K contractions themselves are
dqc/hamilton/hcgto.py:204-241 (get_elrep/get_exchange einsums); the
reference has no TPU analog of this kernel.
"""
from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

i32 = jnp.int32


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def enabled() -> bool:
    """Whether the DS J/K path may be used on this backend."""
    env = os.environ.get("DQC_TPU_PALLAS_JK", "1")
    if env == "0":
        return False
    return jax.default_backend() == "tpu"


def plane_shapes(n: int):
    """(A, B, L) padded axis sizes for the DS planes of an (n,n,n,n) ERI."""
    return _round_up(n, 8), _round_up(n, 8), _round_up(n, 128)


def ds_planes(eri):
    """Split a dense (n,n,n,n) f64 ERI layout into zero-padded (hi, lo)
    f32 planes of shape (n, A, B, L). Jit-able. Layout-agnostic: feed it
    eri_k (exchange layout) and ds_jk's two contractions become (K, J)
    — see ds_jk_kplanes."""
    n = eri.shape[0]
    A, B, L = plane_shapes(n)
    t = jnp.zeros((n, A, B, L), jnp.float64)
    t = t.at[:, :n, :n, :n].set(eri)
    hi = t.astype(jnp.float32)
    lo = (t - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def _pick_ab_blk(A: int, B: int, L: int) -> int:
    """Largest divisor of A whose kernel temporaries (~8 block-sized f32
    values) stay under ~10 MB of Mosaic VMEM stack."""
    budget = 10 * 1024 * 1024
    best = 1
    for ab in range(1, A + 1):
        if A % ab == 0 and 8 * ab * B * L * 4 <= budget:
            best = ab
    return best


def _dm_planes(dm, n, B, L):
    """Padded Dekker-split planes of the density matrix."""
    dmp = jnp.zeros((B, L), jnp.float64).at[:n, :n].set(dm)
    dh = dmp.astype(jnp.float32)
    dl = (dmp - dh.astype(jnp.float64)).astype(jnp.float32)
    c = dh * jnp.float32(4097.0)
    d1 = c - (c - dh)
    d2 = dh - d1
    return dh, d1, d2, dl


def ds_jk_reference(t_hi, t_lo, dm):
    """Pure-jnp oracle for the kernel (tests / non-TPU backends): the
    same contraction in f64 from the planes."""
    n = t_hi.shape[0]
    t = t_hi.astype(jnp.float64) + t_lo.astype(jnp.float64)
    t = t[:, :n, :n, :n]
    j = jnp.einsum("ijkl,kl->ij", t, dm)
    k = jnp.einsum("ikjl,kl->ij", t, dm)
    return j, k


def ds_jk(t_hi, t_lo, dm, *, interpret: bool = False):
    """Two fused contractions of a 4-index tensor T with dm in one pass:

      out_trail[i,j] = sum_kl T[i,j,k,l] dm[k,l]   (trailing axes)
      out_mid[i,b]   = sum_al T[i,a,b,l] dm[a,l]   (axes 1 and 3)

    For T = J-layout (ij|kl): (out_trail, out_mid) = (J, K).
    For T = exchange layout eri_k (= J-layout transposed (0,2,1,3)):
    (out_trail, out_mid) = (K, J) — use ds_jk_kplanes.

    t_hi/t_lo: (n, A, B, L) f32 zero-padded planes (ds_planes);
    dm: (n, n) f64. Forward-only (see module docstring)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, A, B, L = t_hi.shape
    assert A >= n and B >= A and B % 8 == 0 and L % 128 == 0, (n, A, B, L)
    ab_blk = _pick_ab_blk(A, B, L)
    n_ab = A // ab_blk

    dh, d1, d2, dl = _dm_planes(dm, n, B, L)

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

        # ---- J: contract (axis 1 = k, axis 2 = l) with dm[k,l] --------
        pj = V * dhv[None]
        ej = ((v1 * d1v[None] - pj) + v1 * d2v[None] + v2 * d1v[None]) \
            + v2 * d2v[None]
        # keep the lo*lo term: dropping it leaves a ~2^-48-relative
        # sawtooth (non-smooth in dm) that floors the in-graph DIIS at
        # ~1e-8 (measured trajectory, DQC_TPU_DIIS_TRACE)
        ej = ej + (V * dlv[None] + Vl * dhv[None] + Vl * dlv[None])
        s = pj[:, 0:8, :]
        cc = ej[:, 0:8, :]
        for t in range(1, B // 8):
            tt = pj[:, 8 * t:8 * t + 8, :]
            z = s + tt
            bp = z - s
            err = (s - (z - bp)) + (tt - bp)
            s = z
            cc = cc + (err + ej[:, 8 * t:8 * t + 8, :])
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

        # ---- K: contract (axis 0 of block = j rows, axis 2 = l) -------
        da = dh_ref[pl.ds(j0, ab_blk), :].reshape(ab_blk, 1, L)
        da1 = d1_ref[pl.ds(j0, ab_blk), :].reshape(ab_blk, 1, L)
        da2 = d2_ref[pl.ds(j0, ab_blk), :].reshape(ab_blk, 1, L)
        dal = dl_ref[pl.ds(j0, ab_blk), :].reshape(ab_blk, 1, L)
        pk = V * da
        ek = ((v1 * da1 - pk) + v1 * da2 + v2 * da1) + v2 * da2
        ek = ek + (V * dal + Vl * da + Vl * dal)
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
            # sublane dim of an output block must be %8 or the full axis)
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
        interpret=interpret,
    )(t_hi, t_lo, dh, d1, d2, dl)

    # exact f64 epilogue: lane fold of the DS pairs
    j = (jh.astype(jnp.float64) + jl.astype(jnp.float64)).sum(axis=-1)
    k = (kh.astype(jnp.float64) + kl.astype(jnp.float64)).sum(axis=-1)
    return j[:, :n], k[:, :n]


def ds_jk_kplanes(t_hi, t_lo, dm, *, interpret: bool = False):
    """(J, K) from DS planes of the EXCHANGE-layout tensor eri_k — the
    layout production theta actually carries (the Coulomb twin eri_j is
    default-off, qccalc.EXPAND_J_BYTES_LIMIT). With
    eri_k[i,j,k,l] = E[i,k,j,l]:
      trailing contraction = K  (engine: einsum("ijkl,kl->ij", eri_k, dm))
      middle contraction   = J  (= einsum("ikjl,kl->ij", eri_k, dm))
    """
    k, j = ds_jk(t_hi, t_lo, dm, interpret=interpret)
    return j, k
