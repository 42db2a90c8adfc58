"""Independent symbolic oracle for Gaussian integrals.

Strategy: the s-s integrals (overlap, kinetic, nuclear-attraction, ERI) have
textbook closed forms. Higher angular momenta follow by symbolic
differentiation w.r.t. the Gaussian centers:

    G_A(i+1 on x) = ( d/dAx G_A(i) + i * G_A(i-1) ) / (2a)

This is mathematically independent of the McMurchie-Davidson recursion used
by dqc_tpu, so agreement is strong evidence of correctness. All symbolic
(sympy), evaluated at 30 significant digits.
"""
from functools import lru_cache

import sympy as sp

_AX = sp.symbols("Ax Ay Az", real=True)
_BX = sp.symbols("Bx By Bz", real=True)
_CX = sp.symbols("Cx Cy Cz", real=True)
_DX = sp.symbols("Dx Dy Dz", real=True)
_a, _b, _c, _d = sp.symbols("a b c d", positive=True)


def _r2(P, Q):
    return sum((p - q) ** 2 for p, q in zip(P, Q))


def _f0(T):
    return sp.sqrt(sp.pi / T) / 2 * sp.erf(sp.sqrt(T))


@lru_cache(maxsize=None)
def _ss_base(kind):
    p = _a + _b
    mu = _a * _b / p
    K = sp.exp(-mu * _r2(_AX, _BX))
    if kind == "overlap":
        return (sp.pi / p) ** sp.Rational(3, 2) * K
    if kind == "kinetic":
        return mu * (3 - 2 * mu * _r2(_AX, _BX)) \
            * (sp.pi / p) ** sp.Rational(3, 2) * K
    if kind == "nuclear":
        P = [(_a * A + _b * B) / p for A, B in zip(_AX, _BX)]
        T = p * _r2(P, _CX)
        return 2 * sp.pi / p * K * _f0(T)
    if kind == "eri":
        q = _c + _d
        Kcd = sp.exp(-_c * _d / q * _r2(_CX, _DX))
        P = [(_a * A + _b * B) / p for A, B in zip(_AX, _BX)]
        Q = [(_c * C + _d * D) / q for C, D in zip(_CX, _DX)]
        theta = p * q / (p + q)
        T = theta * _r2(P, Q)
        return 2 * sp.pi ** sp.Rational(5, 2) / (p * q * sp.sqrt(p + q)) \
            * K * Kcd * _f0(T)
    raise ValueError(kind)


def _raise_center(expr, center_syms, exponent, powers):
    """Apply the raising recursion for one center to given cartesian powers."""
    # cache of expressions per power tuple, built recursively
    memo = {(0, 0, 0): expr}

    def get(pw):
        if pw in memo:
            return memo[pw]
        # find a dimension to lower
        for d in range(3):
            if pw[d] > 0:
                lower = list(pw)
                lower[d] -= 1
                lower = tuple(lower)
                g = get(lower)
                term = sp.diff(g, center_syms[d])
                if lower[d] > 0:
                    lower2 = list(lower)
                    lower2[d] -= 1
                    term = term + lower[d] * get(tuple(lower2))
                memo[pw] = sp.expand(term / (2 * exponent))
                return memo[pw]
        raise AssertionError
    return get(tuple(powers))


def prim_integral(kind, la_pow, a, A, lb_pow, b, B,
                  C=None, lc_pow=None, cexp=None, ld_pow=None, dexp=None,
                  D=None, digits=25):
    """Primitive cartesian integral of unnormalized gaussians
    x^i y^j z^k exp(-a (r-A)^2).

    kind: 'overlap' | 'kinetic' | 'nuclear' (C = point charge location,
    returns +<a|1/|r-C||b>) | 'eri' (chemist (ab|cd)).
    """
    expr = _ss_base(kind)
    expr = _raise_center(expr, _AX, _a, la_pow)
    expr = _raise_center(expr, _BX, _b, lb_pow)
    subs = {_a: sp.Rational(a), _b: sp.Rational(b)}
    for s, v in zip(_AX, A):
        subs[s] = sp.Rational(v)
    for s, v in zip(_BX, B):
        subs[s] = sp.Rational(v)
    if kind == "nuclear":
        for s, v in zip(_CX, C):
            subs[s] = sp.Rational(v)
    if kind == "eri":
        expr = _raise_center(expr, _CX, _c, lc_pow)
        expr = _raise_center(expr, _DX, _d, ld_pow)
        subs[_c] = sp.Rational(cexp)
        subs[_d] = sp.Rational(dexp)
        for s, v in zip(_CX, C):
            subs[s] = sp.Rational(v)
        for s, v in zip(_DX, D):
            subs[s] = sp.Rational(v)
    return float(expr.subs(subs).evalf(digits))
