"""AO evaluation on grid points (values, gradients, laplacians).

TPU-native replacement of the reference's C GTOval_* evaluators
(/root/reference/dqc/hamilton/intor/gtoeval.py): a dense polynomial x
exponential contraction over class-batched shells — pure jnp, so position/
exponent/coefficient gradients come from JAX AD instead of the reference's
"ip"/"rr" derivative evaluator names (gtoeval.py:124-193).

Returns AO arrays in the same AO ordering as the integral matrices.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp

from .shellstruct import (BasisMeta, nsph, sph_transform, normalized_coeffs,
                          cart_components)


def _class_tables(meta: BasisMeta):
    """Static per-class cart power index arrays."""
    out = []
    for cls in meta.classes:
        carts = np.asarray(cart_components(cls.l), dtype=np.int64)  # (nc,3)
        out.append(carts)
    return out


def eval_ao(meta: BasisMeta, params, coords, deriv: int = 0):
    """coords: (ng, 3). Returns dict with:
      'ao': (ng, nao)
      'ao_grad': (ng, 3, nao)  if deriv >= 1
      'ao_lapl': (ng, nao)     if deriv >= 2
    """
    ng = coords.shape[0]
    nao = meta.nao
    # jnp-coerce: a raw numpy atompos would route the class gather through
    # numpy fancy indexing, which rejects jax index arrays under tracing
    pos = jnp.asarray(params["atompos"])
    blocks = {"ao": [], "ao_grad": [], "ao_lapl": []}
    col_idx = []
    for ci, cls in enumerate(meta.classes):
        l = cls.l
        A = pos[jnp.asarray(np.asarray(cls.atom_ids))]       # (ns,3)
        alphas = params["alphas"][ci]                        # (ns,k)
        coeffs = normalized_coeffs(l, alphas, params["coeffs"][ci],
                                   params["mask"][ci])
        diff = coords[:, None, :] - A[None, :, :]            # (ng,ns,3)
        r2 = jnp.sum(diff * diff, axis=-1)                   # (ng,ns)
        ex = jnp.exp(-alphas[None] * r2[..., None])          # (ng,ns,k)
        s0 = jnp.einsum("gsk,sk->gs", ex, coeffs)
        if deriv >= 1:
            s1 = jnp.einsum("gsk,sk->gs", ex, coeffs * alphas)
        if deriv >= 2:
            s2 = jnp.einsum("gsk,sk->gs", ex, coeffs * alphas * alphas)
        # power table P[..., d, m] = diff_d^m for m=0..l
        pows = [jnp.ones_like(diff)]
        for _ in range(l):
            pows.append(pows[-1] * diff)
        P = jnp.stack(pows, axis=-1)                         # (ng,ns,3,l+1)
        carts = np.asarray(cart_components(l), dtype=np.int64)
        poly = (P[..., 0, carts[:, 0]] * P[..., 1, carts[:, 1]]
                * P[..., 2, carts[:, 2]])                    # (ng,ns,nc)
        Csph = jnp.asarray(sph_transform(l))
        ao_c = poly * s0[..., None]
        blocks["ao"].append(jnp.einsum("gsc,mc->gsm", ao_c, Csph))
        if deriv >= 1:
            dpolys = []
            for d in range(3):
                pw = carts[:, d]
                dm1 = np.maximum(pw - 1, 0)
                dp = pw * (P[..., (d + 1) % 3, carts[:, (d + 1) % 3]]
                           * P[..., (d + 2) % 3, carts[:, (d + 2) % 3]]
                           * P[..., d, dm1])
                dpolys.append(dp)
            dpoly = jnp.stack(dpolys, axis=-2)               # (ng,ns,3,nc)
            grad_c = (dpoly * s0[..., None, None]
                      - 2.0 * diff[..., None] * poly[..., None, :]
                      * s1[..., None, None])
            blocks["ao_grad"].append(jnp.einsum("gsdc,mc->gdsm", grad_c, Csph))
        if deriv >= 2:
            # laplacian of the polynomial
            lap_p = 0.0
            graddot = 0.0
            for d in range(3):
                pw = carts[:, d]
                dm2 = np.maximum(pw - 2, 0)
                lap_p = lap_p + pw * (pw - 1) * (
                    P[..., (d + 1) % 3, carts[:, (d + 1) % 3]]
                    * P[..., (d + 2) % 3, carts[:, (d + 2) % 3]]
                    * P[..., d, dm2])
                graddot = graddot + diff[..., d, None] * dpolys[d]
            lapl_c = (lap_p * s0[..., None]
                      - 4.0 * graddot * s1[..., None]
                      + poly * (-6.0 * s1 + 4.0 * r2 * s2)[..., None])
            blocks["ao_lapl"].append(jnp.einsum("gsc,mc->gsm", lapl_c, Csph))
        # column indices for this class
        starts = np.asarray(cls.ao_starts)
        cols = (starts[:, None] + np.arange(nsph(l))[None, :]).ravel()
        col_idx.append(cols)

    cols = np.concatenate(col_idx)
    inv = np.empty_like(cols)
    inv[cols] = np.arange(nao)
    out = {}
    ao_cat = jnp.concatenate(
        [b.reshape(ng, -1) for b in blocks["ao"]], axis=-1)
    out["ao"] = ao_cat[:, inv]
    if deriv >= 1:
        g_cat = jnp.concatenate(
            [b.reshape(ng, 3, -1) for b in blocks["ao_grad"]], axis=-1)
        out["ao_grad"] = g_cat[:, :, inv]
    if deriv >= 2:
        l_cat = jnp.concatenate(
            [b.reshape(ng, -1) for b in blocks["ao_lapl"]], axis=-1)
        out["ao_lapl"] = l_cat[:, inv]
    return out


def eval_ao_pbc(meta: BasisMeta, params, coords, ls, deriv: int = 0,
                shift_block: int = 24):
    """Lattice-summed (gamma-point) AO evaluation:
    phi~_i(r) = sum_T phi_i(r - T) for the host-enumerated translations
    `ls` (nL, 3). Same return layout as eval_ao.

    Parity: the reference computes this in torch on top of its C evaluator
    (gtoeval.py:31-57 pbc_eval); here it is the same eval_ao batched over
    translation blocks with an in-graph reduction, so it stays
    differentiable and TPU-shaped. k-points multiply each T block by
    e^{ik.T} (gamma keeps everything real)."""
    ls = np.asarray(ls)
    nL = len(ls)
    ng = coords.shape[0]
    acc = None
    for s0 in range(0, nL, shift_block):
        Tc = jnp.asarray(ls[s0:s0 + shift_block])      # (nb, 3)
        nb = Tc.shape[0]
        c2 = (coords[None, :, :] - Tc[:, None, :]).reshape(nb * ng, 3)
        tabs = eval_ao(meta, params, c2, deriv=deriv)
        red = {k: v.reshape((nb, ng) + v.shape[1:]).sum(axis=0)
               for k, v in tabs.items()}
        acc = red if acc is None else {k: acc[k] + red[k] for k in acc}
    return acc


def eval_ao_pbc_k(meta: BasisMeta, params, coords, ls, kpts,
                  deriv: int = 0, shift_block: int = 24):
    """Bloch AO tables phi^k_i(r) = sum_T e^{ik.T} phi_i(r - T).

    kpts: (nk, 3) host numpy. Returns dict of (re, im) pairs:
      'ao': ((nk, ng, nao), (nk, ng, nao)); 'ao_grad' adds a dim-3 axis.
    """
    import numpy as _np
    ls = _np.asarray(ls)
    kpts = _np.asarray(kpts)
    nL = len(ls)
    ng = coords.shape[0]
    acc = None
    for s0 in range(0, nL, shift_block):
        Tc_np = ls[s0:s0 + shift_block]
        Tc = jnp.asarray(Tc_np)
        nb = Tc.shape[0]
        c2 = (coords[None, :, :] - Tc[:, None, :]).reshape(nb * ng, 3)
        tabs = eval_ao(meta, params, c2, deriv=deriv)
        ck = jnp.asarray(_np.cos(kpts @ Tc_np.T))   # (nk, nb)
        sk = jnp.asarray(_np.sin(kpts @ Tc_np.T))
        red = {}
        for key, v in tabs.items():
            vb = v.reshape((nb, ng) + v.shape[1:])
            re = jnp.einsum("kb,b...->k...", ck, vb)
            im = jnp.einsum("kb,b...->k...", sk, vb)
            red[key] = (re, im)
        acc = red if acc is None else {
            k: (acc[k][0] + red[k][0], acc[k][1] + red[k][1]) for k in acc}
    return acc
