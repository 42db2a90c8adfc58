"""Becke fuzzy-cell partition weights — in-graph (differentiable).

Parity with the reference's BeckeGrid weighting
(/root/reference/dqc/grid/multiatoms_grid.py:173-273): 3 iterations of the
smoothing polynomial f <- f(3-f^2)/2, atom-size adjustment from Bragg radii,
small-eps safeguards for gradient stability.

TPU-native: weights are recomputed inside jit from atompos so nuclear
gradients flow through the quadrature (the reference re-computes them in
torch for the same reason).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..utils.safeops import safenorm


def becke_weights(coords, atom_idx, atompos, atom_radii=None):
    """coords: (ng, 3) grid points; atom_idx: (ng,) owning atom;
    atompos: (natm, 3); atom_radii: optional (natm,) Bragg radii for the
    atom-size adjustment. Returns (ng,) partition weights."""
    natm = atompos.shape[0]
    # distances from each point to each atom: (ng, natm)
    d = safenorm(coords[:, None, :] - atompos[None, :, :], axis=-1)
    # inter-atomic distances
    rij = safenorm(atompos[:, None, :] - atompos[None, :, :], axis=-1)
    rij = rij + jnp.eye(natm)  # avoid 0 on diagonal
    # mu_ij(r) = (d_i - d_j) / R_ij : (ng, natm, natm)
    mu = (d[:, :, None] - d[:, None, :]) / rij[None, :, :]

    if atom_radii is not None:
        chi = atom_radii[:, None] / atom_radii[None, :]
        u = (chi - 1.0) / (chi + 1.0)
        a = u / (u * u - 1.0)
        a = jnp.clip(a, -0.45, 0.45)
        mu = mu + a[None] * (1.0 - mu * mu)

    f = mu
    for _ in range(3):
        f = 0.5 * f * (3.0 - f * f)
    s = 0.5 * (1.0 - f)                           # (ng, natm, natm)
    # cell function P_i = prod_{j != i} s_ij
    eye = jnp.eye(natm, dtype=coords.dtype)
    s = s * (1.0 - eye)[None] + eye[None]
    P = jnp.prod(s, axis=-1)                      # (ng, natm)
    denom = jnp.sum(P, axis=-1)
    w_all = P / jnp.maximum(denom, 1e-300)[:, None]
    return jnp.take_along_axis(w_all, atom_idx[:, None], axis=1)[:, 0]
