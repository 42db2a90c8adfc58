"""Theta builders: all integral / grid tensors the SCF engines consume.

This is the functional analog of the reference's HamiltonCGTO.build()/
setup_grid() (/root/reference/dqc/hamilton/hcgto.py:95-186): a pure function
from the differentiable params pytree to the integral tensors, so JAX AD
gives derivatives of everything w.r.t. positions, exponents, coefficients,
external fields, and fractional charges.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..ops import integrals as I
from ..ops.eri import eri_dense
from ..utils.safeops import safe_cdist
from .orth import orthogonalizer


def nuclear_repulsion(atomzs, atompos):
    """E_nn = sum_{i<j} Z_i Z_j / r_ij (parity: reference mol.py:252-260)."""
    z = jnp.asarray(atomzs)
    r = safe_cdist(atompos, atompos, add_diag_eps=True)
    zz = z[:, None] * z[None, :] / r
    return 0.5 * (jnp.sum(zz) - jnp.sum(jnp.diagonal(zz)))


def build_core_theta(meta, params, atomzs, *, efield=None, efield_grad=None,
                     efield_grad2=None, with_eri: bool = True,
                     ovlp_threshold: float = 1e-9, screened=None):
    """Builds the SCF theta dict (hcore, ovlp, X/keep, eri, enuc).

    efield: optional (3,) uniform electric field; adds +E.r_e coupling.
    efield_grad: optional (3,3) field gradient; adds (1/2!) sum G_de x_d x_e
    efield_grad2: optional (3,3,3) second field gradient; adds the
    (1/3!) sum G_def x_d x_e x_f octupole coupling (multipole expansion as
    in the reference, hcgto.py:117-125; r0r0r0 order, namemgr.py:21-25).
    """
    ovlp = I.overlap(meta, params)
    kin = I.kinetic(meta, params)
    nuc = I.nuclattr(meta, params, atomzs)
    hcore = kin + nuc
    if efield is not None:
        dip = jnp.stack([I.multipole(meta, params, p)
                         for p in ((1, 0, 0), (0, 1, 0), (0, 0, 1))])
        # electrons have charge -1: H' = +E . r_e  (energy -mu.E with
        # mu_e = -sum r_e); matches reference convention (hcgto.py:117-125)
        hcore = hcore + jnp.einsum("d,dij->ij", jnp.asarray(efield), dip)
    if efield_grad is not None:
        pws = [[(2, 0, 0), (1, 1, 0), (1, 0, 1)],
               [(1, 1, 0), (0, 2, 0), (0, 1, 1)],
               [(1, 0, 1), (0, 1, 1), (0, 0, 2)]]
        quad = jnp.stack([jnp.stack([I.multipole(meta, params, pws[a][b])
                                     for b in range(3)]) for a in range(3)])
        hcore = hcore + 0.5 * jnp.einsum("de,deij->ij",
                                         jnp.asarray(efield_grad), quad)
    if efield_grad2 is not None:
        import numpy as np
        eye = np.eye(3, dtype=int)
        # 27 index triples share 10 distinct power tuples — compute each once
        uniq = {}

        def mono(a, b, c):
            pw = tuple(int(v) for v in (eye[a] + eye[b] + eye[c]))
            if pw not in uniq:
                uniq[pw] = I.multipole(meta, params, pw)
            return uniq[pw]

        octm = jnp.stack([jnp.stack([jnp.stack(
            [mono(a, b, c) for c in range(3)])
            for b in range(3)]) for a in range(3)])
        hcore = hcore + (1.0 / 6.0) * jnp.einsum(
            "def,defij->ij", jnp.asarray(efield_grad2), octm)
    X, keep = orthogonalizer(ovlp, ovlp_threshold)
    theta = {
        "hcore": hcore,
        "ovlp": ovlp,
        "X": X,
        "keep": keep,
        "enuc": nuclear_repulsion(atomzs, params["atompos"]),
    }
    if with_eri:
        theta["eri"] = eri_dense(meta, params, screened=screened)
    return theta
