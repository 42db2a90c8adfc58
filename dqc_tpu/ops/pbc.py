"""PBC lattice-sum one-electron integrals with k-points.

TPU-native replacement of the reference's libpbc path
(/root/reference/dqc/hamilton/intor/pbcintor.py): S_k[i,j] =
sum_L e^{i k.L} <phi_i | phi_j(. - L)> evaluated as a real-space lattice sum
of the molecular MD pair integrals, batched over (pair, L).

Beyond the reference: these are plain jnp compositions, so they are
differentiable w.r.t. atom positions / basis params / lattice vectors —
the reference's PBC integral backward is NotImplemented
(pbcintor.py:246,271).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .mcd import e_coeffs_stacked, gaussian_product
from .integrals import _gather_e0, _sph_pair
from .shellstruct import (BasisMeta, gather_pair_inputs, pair_ao_indices,
                          tri_pair_classes)


def estimate_rcut(meta, params_np, precision: float = 1e-10) -> float:
    """Real-space cutoff so neglected overlap tails < precision
    (parity intent: reference utils/pbc.py estimate_ovlp_rcut).

    The returned value bounds the *translation* norm |T| in lattice sums
    of pair quantities f(r_i, r_j + T). The decay criterion is on the
    pair separation |r_ij + T|, so |T| must reach rcut_decay + max_ij
    |r_i - r_j|: without the intra-cell-diameter pad, a multi-atom
    (super)cell silently truncates images between far-apart atoms —
    caught by the 4-cell supercell-folding invariant (hcore band
    degeneracies split by ~1e-4, energies off ~2 mHa/cell)."""
    amin = min(float(np.min(np.asarray(a))) for a in params_np["alphas"])
    # exp(-a/2 * r^2) < eps  =>  r > sqrt(-2 ln eps / a)
    rdecay = float(np.sqrt(-2.0 * np.log(precision) / amin)) + 2.0
    pos = np.asarray(params_np["atompos"], dtype=np.float64)
    dmax = 0.0
    if pos.shape[0] > 1:
        diff = pos[:, None, :] - pos[None, :, :]
        dmax = float(np.max(np.sqrt(np.sum(diff * diff, axis=-1))))
    return rdecay + dmax


def _pair_fn_with_shift(kind, inp, shift):
    """Pair block (np, nsph_a, nsph_b) with the B center shifted by
    `shift` (3,). kind: 'overlap' | 'kinetic'."""
    la, lb = inp["la"], inp["lb"]
    B = inp["B"] + shift
    gp = gaussian_product(la, lb, inp["A"], B, inp["aa"], inp["ab"])
    if kind == "overlap":
        Earr = e_coeffs_stacked(la, lb, gp["PA"], gp["PB"], gp["inv2p"])
        Ex, Ey, Ez = _gather_e0(Earr, la, lb, lb)
        w = (inp["ca"][:, :, None] * inp["cb"][:, None, :] * gp["pref"]
             * (jnp.pi / gp["p"]) ** 1.5)
        blk = jnp.einsum("pabc,pab->pc", Ex * Ey * Ez, w)
    elif kind == "kinetic":
        from .shellstruct import cart_components as _cc
        Earr = e_coeffs_stacked(la, lb + 2, gp["PA"], gp["PB"], gp["inv2p"])
        S0 = _gather_e0(Earr, la, lb, lb + 2, 0)
        Sp2 = _gather_e0(Earr, la, lb, lb + 2, +2)
        Sm2 = _gather_e0(Earr, la, lb, lb + 2, -2)
        ca_l, cb_l = _cc(la), _cc(lb)
        jpow = np.array([[pb[d] for pa in ca_l for pb in cb_l]
                         for d in range(3)], dtype=np.float64)
        b = inp["ab"][:, None, :, None]
        K = [b * (2 * jpow[d] + 1) * S0[d] - 2.0 * b * b * Sp2[d]
             - 0.5 * jpow[d] * (jpow[d] - 1) * Sm2[d] for d in range(3)]
        v = (K[0] * S0[1] * S0[2] + S0[0] * K[1] * S0[2]
             + S0[0] * S0[1] * K[2])
        w = (inp["ca"][:, :, None] * inp["cb"][:, None, :] * gp["pref"]
             * (jnp.pi / gp["p"]) ** 1.5)
        blk = jnp.einsum("pabc,pab->pc", v, w)
    else:
        raise ValueError(kind)
    nca = (la + 1) * (la + 2) // 2
    return _sph_pair(blk.reshape(blk.shape[0], nca, -1), la, lb)


def pbc_int1e(kind, meta: BasisMeta, params, ls, kpts):
    """Lattice-sum 1e integrals.

    ls: (nL, 3) lattice translations (host numpy); kpts: (nk, 3).
    Returns complex (nk, nao, nao)."""
    nao = meta.nao
    kpts = jnp.asarray(kpts)
    ls_j = jnp.asarray(ls)
    phases = jnp.exp(1j * jnp.einsum("kd,ld->kl", kpts, ls_j))  # (nk,nL)
    out = jnp.zeros((kpts.shape[0], nao * nao), dtype=jnp.complex128)
    nL = len(ls)
    for pc in tri_pair_classes(meta):
        inp = gather_pair_inputs(meta, params, pc)
        np_ = inp["A"].shape[0]
        # batch translations into the pair axis: (nL*np, ...)
        ext = {
            "A": jnp.tile(inp["A"], (nL, 1)),
            "B": (inp["B"][None, :, :] + ls_j[:, None, :]).reshape(-1, 3),
            "aa": jnp.tile(inp["aa"], (nL, 1)),
            "ab": jnp.tile(inp["ab"], (nL, 1)),
            "ca": jnp.tile(inp["ca"], (nL, 1)),
            "cb": jnp.tile(inp["cb"], (nL, 1)),
            "la": inp["la"], "lb": inp["lb"],
        }
        blk = _pair_fn_with_shift(kind, ext, 0.0)
        blocks = blk.reshape(nL, np_, blk.shape[-2], blk.shape[-1])
        acc = jnp.einsum("kl,lpab->kpab", phases, blocks.astype(jnp.complex128))
        if pc.ca == pc.cb:
            diag = jnp.asarray((pc.ia == pc.ib), dtype=jnp.float64)
            acc = acc * (1.0 - 0.5 * diag)[None, :, None, None]
        idx = jnp.asarray(pair_ao_indices(meta, pc).ravel())
        out = out.at[:, idx].add(acc.reshape(kpts.shape[0], -1))
    m = out.reshape(-1, nao, nao)
    # hermitian completion: S_k = A + A^H where A holds canonical pairs
    return m + jnp.conj(jnp.swapaxes(m, -1, -2))


def pbc_overlap(meta, params, ls, kpts):
    return pbc_int1e("overlap", meta, params, ls, kpts)


def pbc_kinetic(meta, params, ls, kpts):
    return pbc_int1e("kinetic", meta, params, ls, kpts)
