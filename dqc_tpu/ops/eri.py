"""Electron-repulsion integrals (4c), and 3c/2c Coulomb integrals for DF.

TPU-native replacement for the reference's libcint 2e drivers + CSYMM s4
expansion (/root/reference/dqc/hamilton/intor/molintor.py:448-588,667-688;
symmetry.py). Design:

  - every charge distribution (shell pair or single aux shell) is reduced to
    a *Hermite factor* H[batch, prims, nsph, nherm]: the contraction- and
    spherical-transformed McMurchie-Davidson E-coefficients, assembled with
    precomputed-index gathers (compile-time friendly).
  - (bra|1/r12|ket) is a bilinear form through the Hermite Coulomb matrix R
    built from Boys functions — a batched tensor contraction that XLA maps
    onto the MXU. The same `coulomb_contract` serves 4-center ERIs, 3-center
    (ab|c) and 2-center (a|b) DF integrals, replacing libcint's
    int2e/int3c2e/int2c2e families.
  - 8-fold permutation symmetry: canonical shell-pair quartets only, then 3
    transpose symmetrizations (replacing the reference's s4 + C fills4).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import numpy as np
import jax.numpy as jnp

from .mcd import (e_coeffs_stacked, e3_pair, gaussian_product, hermite_list,
                  hermite_R_stacked)
from .shellstruct import (BasisMeta, gather_pair_inputs, nsph,
                          pair_ao_indices, sph_transform, tri_pair_classes,
                          normalized_coeffs)
from .chunks import map_blocks

TWO_PI_POW_2_5 = 2.0 * np.pi ** 2.5


@dataclass
class HermiteFactor:
    """A charge distribution expanded in Hermite gaussians.

    H: (nbatch, nprim, nsph, nherm) — contraction coeffs folded in
    p: (nbatch, nprim) exponents; P: (nbatch, nprim, 3) centers
    L: total angular momentum of the expansion
    """
    H: object
    p: object
    P: object
    L: int


import jax as _jax  # noqa: E402

_jax.tree_util.register_pytree_node(
    HermiteFactor,
    lambda f: ((f.H, f.p, f.P), f.L),
    lambda L, ch: HermiteFactor(H=ch[0], p=ch[1], P=ch[2], L=L),
)


def hermite_factor_pair(inp) -> HermiteFactor:
    """Hermite factor of a shell-pair class (bra of 4c/3c integrals)."""
    la, lb = inp["la"], inp["lb"]
    L = la + lb
    gp = gaussian_product(la, lb, inp["A"], inp["B"], inp["aa"], inp["ab"])
    Earr = e_coeffs_stacked(la, lb, gp["PA"], gp["PB"], gp["inv2p"])
    E3 = e3_pair(la, lb, Earr)                       # (np,ka,kb,ncab,nh)
    w = inp["ca"][:, :, None] * inp["cb"][:, None, :] * gp["pref"]
    Hcart = E3 * w[..., None, None]
    np_, ka, kb = w.shape
    nh = E3.shape[-1]
    Hcart = Hcart.reshape(np_, ka * kb, -1, nh)
    Csph = jnp.asarray(np.kron(sph_transform(la), sph_transform(lb)))
    H = jnp.einsum("pkch,sc->pksh", Hcart, Csph)
    return HermiteFactor(H=H, p=gp["p"].reshape(np_, ka * kb),
                         P=gp["P"].reshape(np_, ka * kb, 3), L=L)


def hermite_factor_single(l: int, pos, alphas, coeffs) -> HermiteFactor:
    """Hermite factor of single shells (aux basis side of DF integrals).

    pos: (ns,3); alphas/coeffs: (ns,k) — coeffs already normalized+masked."""
    ns, k = alphas.shape
    zeros3 = jnp.zeros((ns, k, 3), dtype=alphas.dtype)
    Earr = e_coeffs_stacked(l, 0, zeros3, zeros3, 0.5 / alphas)
    E3 = e3_pair(l, 0, Earr)                         # (ns,k,ncart,nh)
    Hcart = E3 * coeffs[..., None, None]
    Csph = jnp.asarray(sph_transform(l))
    H = jnp.einsum("pkch,sc->pksh", Hcart, Csph)
    P = jnp.broadcast_to(pos[:, None, :], (ns, k, 3))
    return HermiteFactor(H=H, p=alphas, P=P, L=l)


def _combine_index_sign(L1: int, L2: int):
    """IM[h1, h2] = index of h1+h2 in hermite_list(L1+L2); sign[h2]=(-1)^|h2|."""
    hl1, hl2 = hermite_list(L1), hermite_list(L2)
    pos = {h: i for i, h in enumerate(hermite_list(L1 + L2))}
    IM = np.zeros((len(hl1), len(hl2)), dtype=np.int32)
    for i, h1 in enumerate(hl1):
        for j, h2 in enumerate(hl2):
            IM[i, j] = pos[(h1[0] + h2[0], h1[1] + h2[1], h1[2] + h2[2])]
    sign = np.array([(-1.0) ** sum(h) for h in hl2])
    return IM, sign


def coulomb_contract(bra: HermiteFactor, ket: HermiteFactor, block: int = 32,
                     omega=None):
    """out[b_batch, b_sph, k_batch, k_sph] = (bra | g(r12) | ket).

    g = 1/r12 (omega=None) or the long-range erf(omega*r12)/r12 kernel:
    two Gaussian charge distributions with composite exponents p1, p2
    interact through erf(w r)/r exactly as through 1/r with the reduced
    exponent theta = p1 p2/(p1+p2) replaced by theta*s and the Boys base
    scaled by sqrt(s), where s = w^2/(w^2 + theta) — i.e. 1/theta_eff =
    1/theta + 1/w^2 (the kernel adds one more Gaussian smearing). This
    serves range-separated hybrids (CAM/LC/HSE-class), which the reference
    cannot express at all (no hybrid exchange in its KS engine, ks.py).

    Chunked over the bra batch axis to bound the Hermite-R memory.
    The R_{H+G} index combination is folded into the ket factor as a static
    selection tensor contracted on the MXU (see scf/jk._quartet_blocks for
    the rationale: fancy-index gathers on f64 run on the slow emulated VPU
    path and materialize an (nh1*nh2)-wide intermediate)."""
    Ltot = bra.L + ket.L
    IM, sign = _combine_index_sign(bra.L, ket.L)
    nh1, nh2 = IM.shape
    nht = len(hermite_list(Ltot))
    SEL = np.zeros((nht, nh1, nh2))
    for H in range(nh1):
        for G in range(nh2):
            SEL[IM[H, G], H, G] = sign[G]
    W = jnp.einsum("tHG,qlcG->qltHc",
                   jnp.asarray(SEL, dtype=ket.H.dtype), ket.H)

    def body(args):
        Hb, pb, Pb = args["H"], args["p"], args["P"]
        p1 = pb[:, :, None, None]
        p2 = ket.p[None, None, :, :]
        theta = p1 * p2 / (p1 + p2)
        # per-component PQ: no (..., 3) minor-dim array (slow TPU layout)
        PQ = tuple(Pb[:, :, None, None, d] - ket.P[None, None, :, :, d]
                   for d in range(3))
        pref = TWO_PI_POW_2_5 / (p1 * p2 * jnp.sqrt(p1 + p2))
        if omega is not None:
            s = omega * omega / (omega * omega + theta)
            theta = theta * s
            pref = pref * jnp.sqrt(s)
        Rs = hermite_R_stacked(Ltot, theta, PQ, scale=pref)  # (B,K1,Q,K2,nht)
        T1 = jnp.einsum("bkqlt,qltHc->bkqHc", Rs, W)
        return jnp.einsum("bkaH,bkqHc->baqc", Hb, T1)

    n = bra.H.shape[0]
    return map_blocks(body, {"H": bra.H, "p": bra.p, "P": bra.P}, n, block)


def schwarz_bounds(meta: BasisMeta, params, block: int = 64):
    """Per-pair Schwarz bounds Q_ab = sqrt(max_mn (ab|ab)_{mn,mn}) for every
    tri pair class. Returns list of (npair,) arrays (device)."""
    out = []
    for pc in tri_pair_classes(meta):
        inp = gather_pair_inputs(meta, params, pc)
        fac = hermite_factor_pair(inp)
        IM, sign = _combine_index_sign(fac.L, fac.L)
        Hk = fac.H * jnp.asarray(sign)[None, None, None, :]

        def body(args):
            Hb, pb, Pb, Hkk = args["H"], args["p"], args["P"], args["Hk"]
            p1 = pb[:, :, None]
            p2 = pb[:, None, :]
            theta = p1 * p2 / (p1 + p2)
            PQ = Pb[:, :, None, :] - Pb[:, None, :, :]
            Rarr = hermite_R_stacked(2 * fac.L, theta, PQ)
            pref = TWO_PI_POW_2_5 / (p1 * p2 * jnp.sqrt(p1 + p2))
            M = Rarr[..., IM] * pref[..., None, None]  # (p,K,K,nh,nh)
            v = jnp.einsum("pkaH,pklHG,plbG->pab", Hb, M, Hkk)
            return jnp.sqrt(jnp.maximum(
                jnp.max(jnp.abs(v), axis=(-1, -2)), 1e-300))

        n = fac.H.shape[0]
        q = map_blocks(body, {"H": fac.H, "p": fac.p, "P": fac.P, "Hk": Hk},
                       n, block)
        out.append(q)
    return out


def screened_pair_classes(meta: BasisMeta, params, thresh: float = 1e-12):
    """Tri pair classes pruned by Schwarz screening (host-side; the pruning
    pattern is computed once from concrete params and then frozen, so the
    jitted integral programs keep static shapes)."""
    import numpy as np_
    from ..native import prune_pairs
    qs = [np_.asarray(q) for q in schwarz_bounds(meta, params)]
    qmax = max(float(q.max()) for q in qs)
    pcs = tri_pair_classes(meta)
    out = []
    for pc, q in zip(pcs, qs):
        keep = prune_pairs(q, qmax, thresh)
        out.append((type(pc)(ca=pc.ca, cb=pc.cb,
                             ia=pc.ia[keep], ib=pc.ib[keep]), q[keep]))
    return out


def eri_dense(meta: BasisMeta, params, block: int = 16, screened=None,
              thresh: float = 1e-13, omega=None):
    """Dense (nao, nao, nao, nao) ERI tensor (chemist's (ij|kl)).

    Parity: reference intor.elrep (molintor.py:84-93,124-130) incl. the s4->
    dense expansion; here s8-canonical quartets + transpose symmetrization.
    `screened`: output of screened_pair_classes for Schwarz-pruned pair
    lists (quartets with Q_ab*Q_cd < thresh are dropped wholesale).
    `omega`: long-range erf(omega*r12)/r12 kernel instead of 1/r12 (the
    full-range Schwarz bounds remain valid upper bounds: the erf kernel is
    pointwise dominated by 1/r12)."""
    nao = meta.nao
    if screened is not None:
        pcs = [pc for (pc, q) in screened]
        qlist = [np.asarray(q) for (pc, q) in screened]
    else:
        pcs = tri_pair_classes(meta)
        qlist = None
    factors = []
    idxs = []
    diags = []
    for pc in pcs:
        inp = gather_pair_inputs(meta, params, pc)
        factors.append(hermite_factor_pair(inp))
        idxs.append(pair_ao_indices(meta, pc).reshape(pc.npair, -1))
        diags.append((pc.ia == pc.ib) if pc.ca == pc.cb
                     else np.zeros(pc.npair, dtype=bool))

    out = jnp.zeros((nao * nao * nao * nao,), dtype=jnp.float64)
    n2 = nao * nao
    for gi in range(len(pcs)):
        for gj in range(gi, len(pcs)):
            if qlist is not None:
                # wholesale quartet-group skip if max bound below threshold
                if float(qlist[gi].max()) * float(qlist[gj].max()) < thresh:
                    continue
            blk = coulomb_contract(factors[gi], factors[gj], block=block,
                                   omega=omega)
            # weights for symmetry dedup
            w1 = np.where(diags[gi], 0.5, 1.0)[:, None]
            w2 = np.where(diags[gj], 0.5, 1.0)[None, :]
            w = w1 * w2
            if gi == gj:
                npair = pcs[gi].npair
                tri = np.triu(np.ones((npair, npair)))
                w = w * tri * np.where(np.eye(npair, dtype=bool), 0.5, 1.0)
            blk = blk * jnp.asarray(w)[:, None, :, None]
            flat = (jnp.asarray(idxs[gi], dtype=jnp.int64)[:, :, None, None] * n2
                    + jnp.asarray(idxs[gj], dtype=jnp.int64)[None, None, :, :])
            out = out.at[flat.ravel()].add(blk.ravel())
    g = out.reshape(nao, nao, nao, nao)
    g = g + g.transpose(1, 0, 2, 3)
    g = g + g.transpose(0, 1, 3, 2)
    g = g + g.transpose(2, 3, 0, 1)
    return g


def _aux_factors(meta: BasisMeta, params):
    """Hermite factors of every shell class of a basis, treated as single
    shells (the aux side of DF). Returns list of (factor, ao_starts, l)."""
    out = []
    for ci, cls in enumerate(meta.classes):
        coeffs = normalized_coeffs(cls.l, params["alphas"][ci],
                                   params["coeffs"][ci], params["mask"][ci])
        pos = params["atompos"][jnp.asarray(np.asarray(cls.atom_ids))]
        fac = hermite_factor_single(cls.l, pos, params["alphas"][ci], coeffs)
        out.append((fac, np.asarray(cls.ao_starts), cls.l))
    return out


def _packed_perm(facs, naux):
    """Host permutation: packed (class-concatenated) column -> true AO
    column. Returned as its inverse for direct fancy-indexing."""
    cols = [
        (np.asarray(st)[:, None] + np.arange(nsph(l))[None, :]).ravel()
        for (_, st, l) in facs]
    perm = np.concatenate(cols)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(naux)
    return inv


def coul2c(meta_aux: BasisMeta, params_aux, block: int = 64, omega=None):
    """(aux_i | g | aux_j) -> (naux, naux), g = 1/r12 or erf(omega r)/r12.
    Parity: reference coul2c (molintor.py:113-118).

    Assembled by class-block concatenation + one permutation instead of
    per-element scatters: element-wise index constants embed O(naux^2)
    integers into the XLA module (they OOM-killed the remote TPU
    compiler at def2-SVP scale)."""
    naux = meta_aux.nao
    facs = _aux_factors(meta_aux, params_aux)
    inv = jnp.asarray(_packed_perm(facs, naux))
    rows = []
    for (fa, sta, la) in facs:
        row = []
        for (fb, stb, lb) in facs:
            blk = coulomb_contract(fa, fb, block=block,
                                   omega=omega)  # (na, sa, nb, sb)
            na, sa = blk.shape[0], blk.shape[1]
            row.append(blk.reshape(na * sa, -1))
        rows.append(jnp.concatenate(row, axis=1))
    packed = jnp.concatenate(rows, axis=0)
    return packed[inv][:, inv]


def coul3c(meta: BasisMeta, params, meta_aux: BasisMeta, params_aux,
           block: int = 16, omega=None):
    """(ab | g | aux) -> (nao, nao, naux), g = 1/r12 or erf(omega r)/r12.
    Parity: reference coul3c (molintor.py:119-123)."""
    nao, naux = meta.nao, meta_aux.nao
    facs_aux = _aux_factors(meta_aux, params_aux)
    inv = jnp.asarray(_packed_perm(facs_aux, naux))
    out = jnp.zeros((nao * nao, naux), dtype=jnp.float64)
    for pc in tri_pair_classes(meta):
        inp = gather_pair_inputs(meta, params, pc)
        fab = hermite_factor_pair(inp)
        idx_ab = pair_ao_indices(meta, pc).reshape(pc.npair, -1)
        diag = ((pc.ia == pc.ib) if pc.ca == pc.cb
                else np.zeros(pc.npair, dtype=bool))
        w = jnp.asarray(np.where(diag, 0.5, 1.0))
        # all aux classes packed along the last axis, then one permutation;
        # the only scatter-index constant is the (npair*nsph_ab,) pair map
        blocks = [coulomb_contract(fab, fc, block=block, omega=omega).reshape(
            pc.npair, -1, nc_sh.shape[0] * nsph(lc))
            for (fc, nc_sh, lc) in facs_aux]
        big = jnp.concatenate(blocks, axis=-1)[:, :, inv]
        big = big * w[:, None, None]
        out = out.at[jnp.asarray(idx_ab.ravel())].add(
            big.reshape(-1, naux))
    g = out.reshape(nao, nao, naux)
    return g + g.transpose(1, 0, 2)
