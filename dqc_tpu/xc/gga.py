"""GGA functionals in pure JAX: PBE (x,c), B88, LYP.

Replaces libxc's gga_* used by the reference via pylibxc. Formulas from:
Perdew, Burke, Ernzerhof PRL 77, 3865 (1996); Becke PRA 38, 3098 (1988);
Lee, Yang, Parr PRB 37, 785 (1988) in the Miehlich form (CPL 157, 200
(1989)).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..utils.safeops import safepow, rho_eps, sig_eps
from .base import BaseXC
from .lda import LDA_C_PW, _rs, _zeta, _fzeta

_SIG_EPS = 1e-40


class GGA_X_PBE(BaseXC):
    family = 2
    _KAPPA = 0.8040
    _MU = 0.2195149727645171

    def _e_unpol(self, rho, sigma):
        # ex_unif * F(s); s^2 = sigma / (4 (3pi^2)^{2/3} n^{8/3})
        kf = ((3.0 * np.pi ** 2) ** (1.0 / 3.0)
              * safepow(rho, 1.0 / 3.0, rho_eps(rho)))
        ex_lda = -3.0 / (4.0 * np.pi) * kf * rho
        s2 = jnp.maximum(sigma, sig_eps(sigma)) / (4.0 * kf * kf
                                             * jnp.maximum(rho, rho_eps(rho)) ** 2)
        F = 1.0 + self._KAPPA - self._KAPPA / (1.0 + self._MU * s2 / self._KAPPA)
        return ex_lda * F

    def edens_unpol(self, rho, sigma=None, **kw):
        return self._e_unpol(rho, sigma)

    def edens_pol(self, rho_u, rho_d, sigma_uu=None, sigma_ud=None,
                  sigma_dd=None, **kw):
        # exact spin scaling: Ex[nu,nd] = (Ex[2nu] + Ex[2nd]) / 2
        return 0.5 * (self._e_unpol(2.0 * rho_u, 4.0 * sigma_uu)
                      + self._e_unpol(2.0 * rho_d, 4.0 * sigma_dd))


class GGA_C_PBE(BaseXC):
    family = 2
    _BETA = 0.06672455060314922
    _GAMMA = (1.0 - np.log(2.0)) / np.pi ** 2

    def __init__(self):
        self._pw = LDA_C_PW()

    def _h(self, n, sigma, z, ec_lda_per_n):
        phi = 0.5 * (safepow(1.0 + z, 2.0 / 3.0) + safepow(1.0 - z, 2.0 / 3.0))
        kf = (3.0 * np.pi ** 2 * jnp.maximum(n, rho_eps(n))) ** (1.0 / 3.0)
        ks = jnp.sqrt(4.0 * kf / np.pi)
        t2 = jnp.maximum(sigma, sig_eps(sigma)) / (4.0 * phi * phi * ks * ks
                                             * jnp.maximum(n, rho_eps(n)) ** 2)
        phi3 = phi ** 3
        bg = self._BETA / self._GAMMA
        expo = jnp.exp(-ec_lda_per_n / (self._GAMMA * phi3))
        A = bg / jnp.maximum(expo - 1.0,
                              1e-30 if expo.dtype == jnp.float64 else 1e-12)
        at2 = A * t2
        num = 1.0 + at2
        den = 1.0 + at2 + at2 * at2
        return self._GAMMA * phi3 * jnp.log1p(bg * t2 * num / den)

    def edens_pol(self, rho_u, rho_d, sigma_uu=None, sigma_ud=None,
                  sigma_dd=None, **kw):
        n = rho_u + rho_d
        z = _zeta(rho_u, rho_d)
        sigma = sigma_uu + 2.0 * sigma_ud + sigma_dd
        ec_lda = self._pw.edens_pol(rho_u, rho_d) / jnp.maximum(n, rho_eps(n))
        return n * (ec_lda + self._h(n, sigma, z, ec_lda))

    def edens_unpol(self, rho, sigma=None, **kw):
        ec_lda = self._pw.edens_unpol(rho) / jnp.maximum(rho, rho_eps(rho))
        z = jnp.zeros_like(rho)
        return rho * (ec_lda + self._h(rho, sigma, z, ec_lda))


class GGA_X_B88(BaseXC):
    family = 2
    _BETA = 0.0042

    def _e_spin(self, ns, sigma_ss):
        # per-spin: -Cx (2ns)^{4/3}/2 ... use the standard per-spin form:
        # e_s = ex_lda(ns) - beta ns^{4/3} x^2 / (1 + 6 beta x asinh x)
        n43 = safepow(ns, 4.0 / 3.0, rho_eps(ns))
        x = jnp.sqrt(jnp.maximum(sigma_ss, sig_eps(sigma_ss))) / n43
        cx = (3.0 / 2.0) * (3.0 / (4.0 * np.pi)) ** (1.0 / 3.0)
        e_lda = -cx * n43
        corr = -self._BETA * n43 * x * x / (1.0 + 6.0 * self._BETA * x
                                            * jnp.arcsinh(x))
        return e_lda + corr

    def edens_pol(self, rho_u, rho_d, sigma_uu=None, sigma_ud=None,
                  sigma_dd=None, **kw):
        return self._e_spin(rho_u, sigma_uu) + self._e_spin(rho_d, sigma_dd)

    def edens_unpol(self, rho, sigma=None, **kw):
        return 2.0 * self._e_spin(0.5 * rho, 0.25 * sigma)


class GGA_X_ITYH_B88(GGA_X_B88):
    """Short-range (erfc-complement) B88 exchange via the
    Iikura-Tsuneda-Yanai-Hirao attenuation (JCP 115, 3540 (2001), eqs 4-8;
    libxc gga_x_ityh). Building block for CAM-B3LYP / LC-BLYP-class
    range-separated hybrids — beyond the reference, whose KS engine has no
    exact exchange at all (/root/reference/dqc/qccalc/ks.py:176-187).

    Per spin: E_x^SR = sum_s int e_s(n_s, sigma_ss) F(a_s), with the GGA
    exchange written e_s = -(1/2) n_s^{4/3} K_s, a_s = w sqrt(K_s) /
    (6 sqrt(pi) n_s^{1/3}), and the exchange-hole attenuation factor
    F(a) = 1 - (8/3) a [sqrt(pi) erf(1/(2a)) - 3a + 4a^3
                        + (2a - 4a^3) exp(-1/(4a^2))]."""

    def __init__(self, omega: float):
        self.omega = float(omega)

    @staticmethod
    def _att(a):
        # Same F(a) as the SR-LDA kernel; _erf_attenuation carries the
        # large-a asymptotic-series branch (the closed form cancels 4a^3
        # terms against a ~a^-2 result and returns garbage beyond a~1e3;
        # that bug shipped here once: full B88 at omega=1e5).
        from .lda import _erf_attenuation
        return jnp.clip(_erf_attenuation(jnp.maximum(a, 1e-10)), 0.0, 1.0)

    def _e_spin(self, ns, sigma_ss):
        e_full = GGA_X_B88._e_spin(self, ns, sigma_ss)
        n43 = safepow(ns, 4.0 / 3.0, rho_eps(ns))
        n13 = safepow(ns, 1.0 / 3.0, rho_eps(ns))
        k = jnp.maximum(-2.0 * e_full / n43, 1e-15)
        a = self.omega * jnp.sqrt(k) / (6.0 * jnp.sqrt(jnp.pi) * n13)
        return e_full * self._att(a)


class GGA_C_LYP(BaseXC):
    family = 2
    _A, _B, _C, _D = 0.04918, 0.132, 0.2533, 0.349
    _CF = 0.3 * (3.0 * np.pi ** 2) ** (2.0 / 3.0)

    def edens_pol(self, rho_u, rho_d, sigma_uu=None, sigma_ud=None,
                  sigma_dd=None, **kw):
        a, b, c, d = self._A, self._B, self._C, self._D
        n = jnp.maximum(rho_u + rho_d, rho_eps(rho_u))
        nu = jnp.maximum(rho_u, 0.0)
        nd = jnp.maximum(rho_d, 0.0)
        n13 = safepow(n, 1.0 / 3.0)
        icbrt = 1.0 / n13
        denom = 1.0 + d * icbrt
        # log-space: n^{-11/3} alone overflows the TPU pow's f32 range for
        # n < ~1e-10 (inf * exp(-big) -> NaN); the combined exponent is
        # always moderate or -inf.
        log_omega = (-c * icbrt - (11.0 / 3.0) * jnp.log(n)
                     - jnp.log(denom))
        omega = jnp.exp(log_omega)
        delta = c * icbrt + d * icbrt / denom
        sigma = sigma_uu + 2.0 * sigma_ud + sigma_dd
        nund = nu * nd
        term1 = -4.0 * a * nund / (n * denom)
        t_cf = 2.0 ** (11.0 / 3.0) * self._CF * (safepow(nu, 8.0 / 3.0)
                                                 + safepow(nd, 8.0 / 3.0))
        t_ab = (47.0 / 18.0 - 7.0 * delta / 18.0) * sigma \
            - (5.0 / 2.0 - delta / 18.0) * (sigma_uu + sigma_dd) \
            - (delta - 11.0) / 9.0 * (nu * sigma_uu + nd * sigma_dd) / n
        t_rest = (-2.0 / 3.0 * n * n * sigma
                  + (2.0 / 3.0 * n * n - nu * nu) * sigma_dd
                  + (2.0 / 3.0 * n * n - nd * nd) * sigma_uu)
        return term1 - a * b * omega * (nund * (t_cf + t_ab) + t_rest)


class GGA_X_PBE_SOL(GGA_X_PBE):
    """PBEsol exchange: PBE with mu restored to the gradient-expansion
    value 10/81 (Perdew et al. PRL 100, 136406 (2008))."""
    _MU = 10.0 / 81.0


class GGA_X_REVPBE(GGA_X_PBE):
    """revPBE exchange: kappa = 1.245 (Zhang & Yang PRL 80, 890 (1998))."""
    _KAPPA = 1.245


class GGA_X_RPBE(GGA_X_PBE):
    """RPBE exchange: F(s) = 1 + kappa*(1 - exp(-mu s^2 / kappa))
    (Hammer, Hansen, Norskov PRB 59, 7413 (1999)). Same kappa/mu as PBE,
    different enhancement form (identical to second order in s)."""

    def _e_unpol(self, rho, sigma):
        kf = ((3.0 * np.pi ** 2) ** (1.0 / 3.0)
              * safepow(rho, 1.0 / 3.0, rho_eps(rho)))
        ex_lda = -3.0 / (4.0 * np.pi) * kf * rho
        s2 = jnp.maximum(sigma, sig_eps(sigma)) / (
            4.0 * kf * kf * jnp.maximum(rho, rho_eps(rho)) ** 2)
        F = 1.0 + self._KAPPA * (1.0 - jnp.exp(-self._MU * s2 / self._KAPPA))
        return ex_lda * F


class GGA_C_PBE_SOL(GGA_C_PBE):
    """PBEsol correlation: beta = 0.046 (PRL 100, 136406 (2008))."""
    _BETA = 0.046


class GGA_X_OPTX(BaseXC):
    """OPTX exchange (Handy & Cohen, Mol. Phys. 99, 403 (2001)) — libxc
    gga_x_optx; the exchange half of OLYP. Per-spin:
    e_s = -ns^{4/3} [a1*Cx + a2*(g*x^2/(1+g*x^2))^2], x = |grad ns|/ns^{4/3}.
    """
    family = 2
    _A1 = 1.05151
    _A2 = 1.43169
    _GAM = 0.006

    def _e_spin(self, ns, sigma_ss):
        n43 = safepow(ns, 4.0 / 3.0, rho_eps(ns))
        x2 = jnp.maximum(sigma_ss, sig_eps(sigma_ss)) / (n43 * n43)
        cx = (3.0 / 2.0) * (3.0 / (4.0 * np.pi)) ** (1.0 / 3.0)
        u = self._GAM * x2 / (1.0 + self._GAM * x2)
        return -n43 * (self._A1 * cx + self._A2 * u * u)

    def edens_pol(self, rho_u, rho_d, sigma_uu=None, sigma_ud=None,
                  sigma_dd=None, **kw):
        return self._e_spin(rho_u, sigma_uu) + self._e_spin(rho_d, sigma_dd)

    def edens_unpol(self, rho, sigma=None, **kw):
        return 2.0 * self._e_spin(0.5 * rho, 0.25 * sigma)
