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

# eigenvector-polish constants (see _polish below)
_POLISH_EPS = 1e-5     # Lorentzian gap broadening for the correction
_POLISH_CLAMP = 0.03   # max rotation angle per pair (rad)


def _polish(a, w, v):
    """One first-order Jacobi/perturbation polish of an approximate
    eigendecomposition.

    XLA's TPU eigensolver returns f64 eigenvectors with only ~f32-level
    residuals (measured: |A v - v w| ~ 5.6e-6 at nao=114 while CPU LAPACK
    gives 1.4e-14). That puts a ~1e-5 floor on the SCF commutator
    |FDS-SDF|, stalling DIIS far above tol. Rotating v by the first-order
    perturbation solution E_ab = R_ab / (R_bb - R_aa), R = v^T A v, pushes
    the occupied-virtual residual down quadratically (~1e-10 for
    HOMO-LUMO-sized gaps). Near-degenerate pairs get a Lorentzian-broadened,
    smoothly clamped correction: rotations inside (near-)degenerate
    subspaces are harmless for any downstream quantity that is invariant
    under them (the density matrix is — same invariance the broadened JVP
    below relies on). On CPU (exact LAPACK) R is diagonal to ~1e-15 and
    this is a no-op. Cost: 3 extra matmuls per eigh."""
    r = jnp.einsum("...ia,...ij,...jb->...ab", v, a, v)
    w2 = jnp.diagonal(r, axis1=-2, axis2=-1)          # Rayleigh quotients
    d = w2[..., None, :] - w2[..., :, None]           # d_ab = R_bb - R_aa
    e = r * d / (d * d + _POLISH_EPS * _POLISH_EPS)
    e = e / (1.0 + jnp.abs(e) / _POLISH_CLAMP)        # smooth angle clamp
    eye = jnp.eye(w.shape[-1], dtype=a.dtype)
    e = e * (1.0 - eye)                               # antisymmetric
    v = v + jnp.einsum("...ia,...ab->...ib", v, e)
    # first-order renormalization (columns of v(I+E) have norm 1 + O(E^2))
    v = v / jnp.sqrt(jnp.sum(v * v, axis=-2, keepdims=True))
    return w2, v


@jax.custom_jvp
def safe_eigh(a):
    res = jnp.linalg.eigh(a)
    return _polish(a, res.eigenvalues, res.eigenvectors)


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
