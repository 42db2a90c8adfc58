"""Independent high-precision oracle for Gaussian integrals.

Strategy: the s-s integrals (overlap, kinetic, nuclear-attraction, ERI) have
textbook closed forms. Higher angular momenta follow from the raising
relation

    G_A(i+1 on x) = ( d/dAx G_A(i) + i * G_A(i-1) ) / (2a)

evaluated by *arbitrary-precision numeric differentiation* (mpmath, 40
digits), which is mathematically independent of the McMurchie-Davidson
recursion used by dqc_tpu. Agreement to ~1e-12 is then strong evidence of
correctness.
"""
from functools import lru_cache

import mpmath as mp

mp.mp.dps = 40


def _f0(T):
    if T < mp.mpf("1e-30"):
        return mp.mpf(1)
    return mp.sqrt(mp.pi / T) / 2 * mp.erf(mp.sqrt(T))


def _r2(P, Q):
    return sum((p - q) ** 2 for p, q in zip(P, Q))


def _ss_value(kind, a, b, A, B, C=None, cexp=None, dexp=None, D=None):
    p = a + b
    mu = a * b / p
    K = mp.e ** (-mu * _r2(A, B))
    if kind == "overlap":
        return (mp.pi / p) ** mp.mpf("1.5") * K
    if kind == "kinetic":
        return mu * (3 - 2 * mu * _r2(A, B)) * (mp.pi / p) ** mp.mpf("1.5") * K
    if kind == "nuclear":
        P = [(a * Ax + b * Bx) / p for Ax, Bx in zip(A, B)]
        return 2 * mp.pi / p * K * _f0(p * _r2(P, C))
    if kind == "eri":
        q = cexp + dexp
        Kcd = mp.e ** (-cexp * dexp / q * _r2(C, D))
        P = [(a * Ax + b * Bx) / p for Ax, Bx in zip(A, B)]
        Q = [(cexp * Cx + dexp * Dx) / q for Cx, Dx in zip(C, D)]
        theta = p * q / (p + q)
        return (2 * mp.pi ** mp.mpf("2.5") / (p * q * mp.sqrt(p + q))
                * K * Kcd * _f0(theta * _r2(P, Q)))
    raise ValueError(kind)


def _raise_all(fn, centers_exps):
    """fn(c1, c2, c3, c4) -> value with centers as mp vectors; raise each
    center to its cartesian powers via numeric differentiation.

    centers_exps: list of (powers(3,), exponent, which_center_index)."""
    # recursively build a function of the centers with the powers applied
    def raised(fn, ci, d, pw_d, exponent):
        """Raise center ci, dimension d, to power pw_d."""
        if pw_d == 0:
            return fn

        lower = raised(fn, ci, d, pw_d - 1, exponent)
        lower2 = raised(fn, ci, d, pw_d - 2, exponent) if pw_d >= 2 else None

        def out(*centers):
            def g(x):
                cc = [list(c) for c in centers]
                cc[ci][d] = x
                return lower(*cc)
            val = mp.diff(g, centers[ci][d])
            if lower2 is not None:
                val = val + (pw_d - 1) * lower2(*centers)
            return val / (2 * exponent)
        return out

    for (pw, expo, ci) in centers_exps:
        for d in range(3):
            fn = raised(fn, ci, d, pw[d], expo)
    return fn


def prim_integral(kind, la_pow, a, A, lb_pow, b, B,
                  C=None, lc_pow=None, cexp=None, ld_pow=None, dexp=None,
                  D=None, digits=40):
    """Primitive cartesian integral of unnormalized gaussians
    x^i y^j z^k exp(-a (r-A)^2) etc. See module docstring."""
    mp.mp.dps = digits
    a_, b_ = mp.mpf(a), mp.mpf(b)
    A_ = [mp.mpf(v) for v in A]
    B_ = [mp.mpf(v) for v in B]
    C_ = [mp.mpf(v) for v in C] if C is not None else None
    D_ = [mp.mpf(v) for v in D] if D is not None else None
    ce = mp.mpf(cexp) if cexp is not None else None
    de = mp.mpf(dexp) if dexp is not None else None

    if kind in ("overlap", "kinetic"):
        base = lambda Ac, Bc: _ss_value(kind, a_, b_, Ac, Bc)
        fn = _raise_all(base, [(la_pow, a_, 0), (lb_pow, b_, 1)])
        return float(fn(A_, B_))
    if kind == "nuclear":
        base = lambda Ac, Bc: _ss_value(kind, a_, b_, Ac, Bc, C=C_)
        fn = _raise_all(base, [(la_pow, a_, 0), (lb_pow, b_, 1)])
        return float(fn(A_, B_))
    if kind == "eri":
        base = lambda Ac, Bc, Cc, Dc: _ss_value(
            kind, a_, b_, Ac, Bc, C=Cc, cexp=ce, dexp=de, D=Dc)
        fn = _raise_all(base, [(la_pow, a_, 0), (lb_pow, b_, 1),
                               (lc_pow, ce, 2), (ld_pow, de, 3)])
        return float(fn(A_, B_, C_, D_))
    raise ValueError(kind)
