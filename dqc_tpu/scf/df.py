"""Density fitting (resolution of the identity) for the Coulomb/exchange
builds.

Parity with the reference's DFMol (/root/reference/dqc/df/dfmol.py):
Coulomb-metric fitting j2c = (P|r12|Q), j3c = (ab|r12|P); J built from
fitted coefficients. Beyond the reference: RI-K exchange is also provided
(the reference cannot combine DF with exact exchange, hcgto.py:229-230).

TPU-native: the fitted-coefficient solve uses an eigh-based pseudo-inverse
(TPU has no f64 LU/Cholesky) and all contractions are einsums on the MXU.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops.eri import coul2c, coul3c
from ..ops.shellstruct import pack_basis
from .eigh import safe_eigh


def build_df_theta(meta, params, meta_aux, params_aux, omega=None):
    """Returns {'j3c': (nao,nao,naux), 'v_inv': (naux,naux)} with
    v_inv = j2c^{-1} (pseudo-inverse on the kept spectrum).

    omega: fit in the long-range erf(omega*r12)/r12 metric instead of the
    Coulomb metric — the RI identity holds per-kernel when metric and
    integrals use the same kernel, so this serves the attenuated exchange
    of range-separated hybrids (engine._k_lr)."""
    j2c = coul2c(meta_aux, params_aux, omega=omega)
    j3c = coul3c(meta, params, meta_aux, params_aux, omega=omega)
    w, v = safe_eigh(j2c)
    keep = w > 1e-12 * w[-1]
    inv_w = jnp.where(keep, 1.0 / jnp.where(keep, w, 1.0), 0.0)
    v_inv = (v * inv_w[None, :]) @ v.T
    return {"j3c": j3c, "v_inv": v_inv}


def df_j(df, dm_tot):
    """Coulomb matrix from fitted density: J = (ij|P) c_P,
    c = j2c^{-1} (P|kl) dm_kl.

    Tensor-parallel under an active mesh with a 'tp' axis: the j3c slab is
    sharded over its aux dimension, each device contracts its slab, and
    GSPMD inserts the psum/all-gather for the aux reductions over ICI."""
    from ..parallel.mesh import shard_axis
    j3c = shard_axis(df["j3c"], "tp", 2)
    rho_p = jnp.einsum("klp,kl->p", j3c, dm_tot)
    c = df["v_inv"] @ rho_p
    return jnp.einsum("ijp,p->ij", j3c, c)


def df_k(df, dm):
    """RI-K exchange: K_ij = (ik|P) j2c^{-1}_PQ (Q|jl) dm_kl.

    Same 'tp' aux-axis sharding as df_j. When the df dict carries
    "madelung" (periodic GDF, scf/pbc.build_pbc_gdf), the dropped-G=0
    probe-charge Ewald correction K += M * S dm S is restored — the same
    exxdiv="ewald" treatment as the AFT path (ops/pbcft.aft_k)."""
    from ..parallel.mesh import shard_axis
    j3c = shard_axis(df["j3c"], "tp", 2)
    b = jnp.einsum("ikp,pq->ikq", j3c, df["v_inv"])
    k = jnp.einsum("ikq,...kl,jlq->...ij", b, dm, j3c)
    mad = df.get("madelung")
    if mad is not None:
        s = df["ovlp"]
        k = k + mad * jnp.einsum("ik,...kl,lj->...ij", s, dm, s)
    return k
