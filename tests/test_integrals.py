"""Integral engine vs the independent symbolic oracle (tests/oracle.py).

Role parity with the reference's test_libcint.py (PySCF-as-oracle); here the
oracle is closed-form + symbolic differentiation, fully offline.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from dqc_tpu.utils.datastruct import AtomCGTOBasis, CGTOBasis
from dqc_tpu.ops.shellstruct import (pack_basis, sph_transform,
                                     cart_components, normalized_coeffs)
from dqc_tpu.ops import integrals as I
from dqc_tpu.ops.eri import eri_dense

from oracle import prim_integral

# single-primitive shells, deliberately asymmetric geometry
A = [0.0, 0.0, 0.0]
B = [0.5, -0.25, 1.0]
ALPHA_A, ALPHA_B = 0.8, 1.3


def _mol(la, lb):
    basa = CGTOBasis(angmom=la, alphas=np.array([ALPHA_A]),
                     coeffs=np.array([1.0]))
    basb = CGTOBasis(angmom=lb, alphas=np.array([ALPHA_B]),
                     coeffs=np.array([1.0]))
    ab = [AtomCGTOBasis(1, [basa], A), AtomCGTOBasis(1, [basb], B)]
    return pack_basis(ab)


def _prim_norm(l, alpha):
    from scipy.special import gammaln
    return float(np.exp(0.5 * (np.log(2.0) + (l + 1.5) * np.log(2 * alpha)
                               - gammaln(l + 1.5))))


def _oracle_block(kind, la, lb, **kw):
    """Spherical AO block (2la+1, 2lb+1) from primitive cartesian oracle."""
    Ca, Cb = sph_transform(la), sph_transform(lb)
    na, nb = _prim_norm(la, ALPHA_A), _prim_norm(lb, ALPHA_B)
    carts_a, carts_b = cart_components(la), cart_components(lb)
    cart = np.zeros((len(carts_a), len(carts_b)))
    for i, pa in enumerate(carts_a):
        for j, pb in enumerate(carts_b):
            cart[i, j] = prim_integral(kind, pa, ALPHA_A, A, pb, ALPHA_B, B,
                                       **kw)
    return na * nb * (Ca @ cart @ Cb.T)


@pytest.mark.parametrize("la,lb", [(0, 0), (1, 0), (1, 1), (2, 1), (2, 2)])
def test_overlap_vs_oracle(la, lb):
    meta, params = _mol(la, lb)
    S = np.asarray(I.overlap(meta, params))
    blk = S[:2 * la + 1, 2 * la + 1:]
    ref = _oracle_block("overlap", la, lb)
    np.testing.assert_allclose(blk, ref, atol=1e-13)


@pytest.mark.parametrize("la,lb", [(0, 0), (1, 1), (2, 1)])
def test_kinetic_vs_oracle(la, lb):
    meta, params = _mol(la, lb)
    T = np.asarray(I.kinetic(meta, params))
    blk = T[:2 * la + 1, 2 * la + 1:]
    ref = _oracle_block("kinetic", la, lb)
    np.testing.assert_allclose(blk, ref, atol=1e-12)


@pytest.mark.parametrize("la,lb", [(0, 0), (1, 0), (1, 1), (2, 1)])
def test_nuclear_vs_oracle(la, lb):
    meta, params = _mol(la, lb)
    C = [0.1, 0.3, -0.2]
    V = np.asarray(I.rinv(meta, params, jnp.asarray(C)))
    blk = V[:2 * la + 1, 2 * la + 1:]
    ref = _oracle_block("nuclear", la, lb, C=C)
    np.testing.assert_allclose(blk, ref, atol=1e-12)


@pytest.mark.parametrize("quartet", [
    (0, 0, 0, 0), (1, 0, 0, 0), (1, 0, 1, 0), (1, 1, 0, 0), (2, 0, 1, 0)])
def test_eri_vs_oracle_element(quartet):
    """One spherical element of (ab|cd) for a 4-distinct-shell system."""
    la, lb, lc, ld = quartet
    C = [-0.4, 0.6, 0.2]
    D = [0.9, 0.1, -0.7]
    ac, ad = 0.6, 1.1
    shells = [CGTOBasis(angmom=l, alphas=np.array([al]),
                        coeffs=np.array([1.0]))
              for l, al in ((la, ALPHA_A), (lb, ALPHA_B), (lc, ac), (ld, ad))]
    ab = [AtomCGTOBasis(1, [shells[0]], A), AtomCGTOBasis(1, [shells[1]], B),
          AtomCGTOBasis(1, [shells[2]], C), AtomCGTOBasis(1, [shells[3]], D)]
    meta, params = pack_basis(ab)
    G = np.asarray(eri_dense(meta, params))
    # AO offsets in input shell order
    offs = np.cumsum([0] + [2 * l + 1 for l in (la, lb, lc, ld)])
    # compare the m=(0,...) component of each shell (first AO of the shell)
    i, j, k, l_ = offs[0], offs[1], offs[2], offs[3]
    mine = G[i, j, k, l_]
    # oracle: contract sph transforms over the 4 cartesian blocks
    Cs = [sph_transform(l)[0] for l in (la, lb, lc, ld)]  # first sph row
    Ns = [_prim_norm(la, ALPHA_A), _prim_norm(lb, ALPHA_B),
          _prim_norm(lc, ac), _prim_norm(ld, ad)]
    carts = [cart_components(l) for l in (la, lb, lc, ld)]
    ref = 0.0
    for ia_, pa in enumerate(carts[0]):
        for ib_, pb in enumerate(carts[1]):
            for ic_, pc in enumerate(carts[2]):
                for id_, pd in enumerate(carts[3]):
                    w = (Cs[0][ia_] * Cs[1][ib_] * Cs[2][ic_] * Cs[3][id_])
                    if w == 0.0:
                        continue
                    ref += w * prim_integral(
                        "eri", pa, ALPHA_A, A, pb, ALPHA_B, B,
                        C=C, lc_pow=pc, cexp=ac, ld_pow=pd, dexp=ad, D=D)
    ref *= Ns[0] * Ns[1] * Ns[2] * Ns[3]
    np.testing.assert_allclose(mine, ref, rtol=1e-11, atol=1e-13)


def test_translation_invariance():
    """Integrals unchanged by rigid translation (catches center bugs)."""
    bas = [CGTOBasis(angmom=1, alphas=np.array([0.9, 2.0]),
                     coeffs=np.array([0.6, 0.8]))]
    ab0 = [AtomCGTOBasis(1, bas, A), AtomCGTOBasis(1, bas, B)]
    shift = np.array([1.7, -2.3, 0.4])
    ab1 = [AtomCGTOBasis(1, bas, np.asarray(A) + shift),
           AtomCGTOBasis(1, bas, np.asarray(B) + shift)]
    m0, p0 = pack_basis(ab0)
    m1, p1 = pack_basis(ab1)
    for f in (I.overlap, I.kinetic):
        np.testing.assert_allclose(np.asarray(f(m0, p0)),
                                   np.asarray(f(m1, p1)), atol=1e-13)
    np.testing.assert_allclose(np.asarray(eri_dense(m0, p0)),
                               np.asarray(eri_dense(m1, p1)), atol=1e-12)


def test_multipole_dipole():
    """<phi|x|phi> for an s AO centered at A equals A_x."""
    bas = [CGTOBasis(angmom=0, alphas=np.array([1.2]),
                     coeffs=np.array([1.0]))]
    pos = [0.3, -0.7, 0.9]
    meta, params = pack_basis([AtomCGTOBasis(1, bas, pos)])
    for d, p in enumerate([(1, 0, 0), (0, 1, 0), (0, 0, 1)]):
        M = np.asarray(I.multipole(meta, params, p))
        np.testing.assert_allclose(M[0, 0], pos[d], atol=1e-13)


def test_multipole_second_moment():
    """<phi|x^2|phi> for a normalized s primitive at position A is
    A_x^2 + 1/(4 alpha) (regression: the Gaussian-width 1/(4a) term was
    dropped for s-s pairs when the Hermite-multipole t-cap excluded the
    M_1^1 intermediate)."""
    alpha = 1.2
    bas = [CGTOBasis(angmom=0, alphas=np.array([alpha]),
                     coeffs=np.array([1.0]))]
    pos = [0.3, -0.7, 0.9]
    meta, params = pack_basis([AtomCGTOBasis(1, bas, pos)])
    for d, p in enumerate([(2, 0, 0), (0, 2, 0), (0, 0, 2)]):
        M = np.asarray(I.multipole(meta, params, p))
        np.testing.assert_allclose(M[0, 0], pos[d] ** 2 + 1.0 / (4 * alpha),
                                   atol=1e-13)
    # cross moment <x y> = A_x A_y for an s function
    M = np.asarray(I.multipole(meta, params, (1, 1, 0)))
    np.testing.assert_allclose(M[0, 0], pos[0] * pos[1], atol=1e-13)
