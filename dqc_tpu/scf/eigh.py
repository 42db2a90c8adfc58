"""Degenerate-safe symmetric eigendecomposition.

Replaces xitorch.linalg.lsymeig and its degenerate-safe backward used by the
reference (/root/reference/dqc/qccalc/hf.py:227-247). JAX's stock eigh JVP
divides by eigenvalue gaps; for (near-)degenerate orbitals (atom p shells,
benzene pi system) that produces inf/nan. We Lorentzian-broaden the gap:
F_ij = d/(d^2 + eps^2). For any downstream function invariant under rotations
in degenerate subspaces with equal occupation (the density matrix is), the
broadened JVP converges to the exact derivative.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


@jax.custom_jvp
def safe_eigh(a):
    res = jnp.linalg.eigh(a)
    return res.eigenvalues, res.eigenvectors


@safe_eigh.defjvp
def _safe_eigh_jvp(primals, tangents):
    (a,), (da,) = primals, tangents
    w, v = safe_eigh(a)
    da_sym = 0.5 * (da + jnp.swapaxes(da, -1, -2))
    vt_da_v = jnp.einsum("...ia,...ij,...jb->...ab", v, da_sym, v)
    dw = jnp.diagonal(vt_da_v, axis1=-2, axis2=-1)
    d = w[..., None, :] - w[..., :, None]          # d_ab = w_b - w_a
    f = d / (d * d + _EPS * _EPS)
    eye = jnp.eye(w.shape[-1], dtype=a.dtype)
    f = f * (1.0 - eye)
    dv = jnp.einsum("...ia,...ab->...ib", v, f * vt_da_v)
    return (w, v), (dw, dv)
