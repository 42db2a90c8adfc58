"""Meta-GGA functionals: SCAN (Sun, Ruzsinszky, Perdew, PRL 115, 036402
(2015)) and TPSS (Tao, Perdew, Staroverov, Scuseria, PRL 91, 146401 (2003);
explicit forms in JCP 120, 6898 (2004)).

Pure-JAX replacements of libxc's mgga_x_scan / mgga_c_scan / mgga_x_tpss /
mgga_c_tpss used by the reference via pylibxc. The interpolation step
functions are implemented with branch-safe jnp.where (both branches
evaluated on clamped arguments) so gradients are NaN-free — vxc/fxc come
from jax.grad like every functional here.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..utils.safeops import safepow
from .base import BaseXC
from .lda import _RHO_EPS, _rs, _zeta

_TAU_EPS = 1e-30


def _alpha_iso(rho, sigma, tau, ds=1.0):
    """alpha = (tau - tau_W) / tau_unif, regularized."""
    tau_w = jnp.maximum(sigma, 0.0) / (8.0 * jnp.maximum(rho, _RHO_EPS))
    tau_unif = 0.3 * (3.0 * np.pi ** 2) ** (2.0 / 3.0) \
        * safepow(rho, 5.0 / 3.0, _RHO_EPS) * ds
    return (tau - tau_w) / jnp.maximum(tau_unif, _TAU_EPS)


def _interp_x(alpha):
    c1x, c2x, dx = 0.667, 0.8, 1.24
    a_lo = jnp.clip(alpha, 0.0, 1.0 - 1e-12)
    a_hi = jnp.maximum(alpha, 1.0 + 1e-12)
    f_lo = jnp.exp(-c1x * a_lo / (1.0 - a_lo))
    f_hi = -dx * jnp.exp(c2x / (1.0 - a_hi))
    return jnp.where(alpha < 1.0, f_lo, f_hi)


def _interp_c(alpha):
    c1c, c2c, dc = 0.64, 1.5, 0.7
    a_lo = jnp.clip(alpha, 0.0, 1.0 - 1e-12)
    a_hi = jnp.maximum(alpha, 1.0 + 1e-12)
    f_lo = jnp.exp(-c1c * a_lo / (1.0 - a_lo))
    f_hi = -dc * jnp.exp(c2c / (1.0 - a_hi))
    return jnp.where(alpha < 1.0, f_lo, f_hi)


class MGGA_X_SCAN(BaseXC):
    family = 4
    _K1 = 0.065
    _MU = 10.0 / 81.0

    def _e_unpol(self, rho, sigma, tau):
        n = jnp.maximum(rho, _RHO_EPS)
        kf = (3.0 * np.pi ** 2) ** (1.0 / 3.0) * n ** (1.0 / 3.0)
        s2 = jnp.maximum(sigma, 0.0) / (4.0 * kf * kf * n * n)
        s = jnp.sqrt(jnp.maximum(s2, 1e-40))
        alpha = _alpha_iso(n, sigma, tau)
        mu, k1 = self._MU, self._K1
        b2 = np.sqrt(5913.0 / 405000.0)
        b1 = (511.0 / 13500.0) / (2.0 * b2)
        b3 = 0.5
        b4 = mu * mu / k1 - 1606.0 / 18225.0 - b1 * b1
        one_m_a = 1.0 - alpha
        x = (mu * s2 * (1.0 + (b4 * s2 / mu) * jnp.exp(-jnp.abs(b4) * s2 / mu))
             + (b1 * s2 + b2 * one_m_a * jnp.exp(-b3 * one_m_a ** 2)) ** 2)
        h1x = 1.0 + k1 - k1 / (1.0 + x / k1)
        h0x = 1.174
        a1 = 4.9479
        gx = 1.0 - jnp.exp(-a1 / jnp.sqrt(jnp.maximum(s, 1e-20)))
        fx = _interp_x(alpha)
        Fx = (h1x + fx * (h0x - h1x)) * gx
        ex_lda = -3.0 / (4.0 * np.pi) * kf * n
        return ex_lda * Fx

    def edens_unpol(self, rho, sigma=None, lapl=None, tau=None):
        return self._e_unpol(rho, sigma, tau)

    def edens_pol(self, rho_u, rho_d, sigma_uu=None, sigma_ud=None,
                  sigma_dd=None, lapl_u=None, lapl_d=None,
                  tau_u=None, tau_d=None):
        return 0.5 * (self._e_unpol(2 * rho_u, 4 * sigma_uu, 2 * tau_u)
                      + self._e_unpol(2 * rho_d, 4 * sigma_dd, 2 * tau_d))


class MGGA_C_SCAN(BaseXC):
    family = 4
    _B1C, _B2C, _B3C = 0.0285764, 0.0889, 0.125541
    _GAMMA = 0.031090690869654895
    _CHI = 0.12802585262625815

    def _ec_pw_parts(self, rs, z):
        from .lda import _pw92_G, _fzeta
        ec0 = _pw92_G(rs, 0.0310907, 0.21370, 7.5957, 3.5876, 1.6382, 0.49294)
        ec1 = _pw92_G(rs, 0.01554535, 0.20548, 14.1189, 6.1977, 3.3662,
                      0.62517)
        mac = _pw92_G(rs, 0.0168869, 0.11125, 10.357, 3.6231, 0.88026,
                      0.49671)
        f = _fzeta(z)
        z4 = z ** 4
        fdd0 = 1.709920934161365
        return ec0 - mac * f / fdd0 * (1.0 - z4) + (ec1 - ec0) * f * z4

    def edens_pol(self, rho_u, rho_d, sigma_uu=None, sigma_ud=None,
                  sigma_dd=None, lapl_u=None, lapl_d=None,
                  tau_u=None, tau_d=None):
        n = jnp.maximum(rho_u + rho_d, _RHO_EPS)
        z = jnp.clip(_zeta(rho_u, rho_d), -1.0 + 1e-12, 1.0 - 1e-12)
        sigma = sigma_uu + 2.0 * sigma_ud + sigma_dd
        tau = tau_u + tau_d
        rs = _rs(n)
        phi = 0.5 * (safepow(1.0 + z, 2.0 / 3.0) + safepow(1.0 - z, 2.0 / 3.0))
        ds = 0.5 * (safepow(1.0 + z, 5.0 / 3.0) + safepow(1.0 - z, 5.0 / 3.0))
        alpha = _alpha_iso(n, sigma, tau, ds=ds)
        kf = (3.0 * np.pi ** 2) ** (1.0 / 3.0) * n ** (1.0 / 3.0)
        s2 = jnp.maximum(sigma, 0.0) / (4.0 * kf * kf * n * n)
        # --- ec1: PW92 + H1
        ec_pw = self._ec_pw_parts(rs, z)
        gam = self._GAMMA
        phi3 = phi ** 3
        t2 = (3.0 * np.pi ** 2 / 16.0) ** (2.0 / 3.0) * s2 / (phi * phi * rs)
        w1 = jnp.expm1(-ec_pw / (gam * phi3))
        beta = 0.066725 * (1.0 + 0.1 * rs) / (1.0 + 0.1778 * rs)
        A = beta / (gam * jnp.maximum(w1, 1e-30))
        g_at2 = (1.0 + 4.0 * A * t2) ** (-0.25)
        H1 = gam * phi3 * jnp.log1p(w1 * (1.0 - g_at2))
        ec1 = ec_pw + H1
        # --- ec0: LDA0 + H0
        b1c, b2c, b3c = self._B1C, self._B2C, self._B3C
        sqrs = jnp.sqrt(rs)
        ec_lda0 = -b1c / (1.0 + b2c * sqrs + b3c * rs)
        w0 = jnp.expm1(-ec_lda0 / b1c)
        ginf = (1.0 + 4.0 * self._CHI * s2) ** (-0.25)
        H0 = b1c * jnp.log1p(w0 * (1.0 - ginf))
        dx_z = 0.5 * (safepow(1.0 + z, 4.0 / 3.0) + safepow(1.0 - z, 4.0 / 3.0))
        Gc = (1.0 - 2.3631 * (dx_z - 1.0)) * (1.0 - z ** 12)
        ec0 = (ec_lda0 + H0) * Gc
        fc = _interp_c(alpha)
        ec = ec1 + fc * (ec0 - ec1)
        return n * ec

    def edens_unpol(self, rho, sigma=None, lapl=None, tau=None):
        h = 0.5 * rho
        q = 0.25 * sigma
        return self.edens_pol(h, h, q, q, q, tau_u=0.5 * tau, tau_d=0.5 * tau)


# --------------------------------------------------------------------------
# TPSS (Tao-Perdew-Staroverov-Scuseria 2003). Reference exposes these as
# libxc mgga_x_tpss / mgga_c_tpss (xc/libxc.py); here they are closed-form
# JAX so all derivative orders come from AD.

class MGGA_X_TPSS(BaseXC):
    family = 4
    _KAPPA = 0.804
    _MU = 0.21951
    _B = 0.40
    _C = 1.59096
    _E = 1.537

    def _e_unpol(self, rho, sigma, tau):
        n = jnp.maximum(rho, _RHO_EPS)
        sig = jnp.maximum(sigma, 0.0)
        kf2 = (3.0 * np.pi ** 2) ** (2.0 / 3.0) * safepow(n, 2.0 / 3.0)
        p = sig / (4.0 * kf2 * n * n)
        tau_w = sig / (8.0 * n)
        t = jnp.maximum(tau, _TAU_EPS)
        z = jnp.clip(tau_w / t, 0.0, 1.0)
        alpha = jnp.maximum(_alpha_iso(n, sig, t), 0.0)
        b = self._B
        qb = (0.45 * (alpha - 1.0)
              / jnp.sqrt(1.0 + b * alpha * (alpha - 1.0))
              + 2.0 * p / 3.0)
        kappa, mu, c, e = self._KAPPA, self._MU, self._C, self._E
        z2 = z * z
        tz2 = (0.6 * z) ** 2          # (3z/5)^2
        sq = jnp.sqrt(0.5 * tz2 ** 2 + 0.5 * p * p)
        x = ((10.0 / 81.0 + c * z2 / (1.0 + z2) ** 2) * p
             + 146.0 / 2025.0 * qb * qb
             - 73.0 / 405.0 * qb * sq
             + (10.0 / 81.0) ** 2 * p * p / kappa
             + 2.0 * np.sqrt(e) * (10.0 / 81.0) * tz2
             + e * mu * p ** 3)
        x = x / (1.0 + np.sqrt(e) * p) ** 2
        fx = 1.0 + kappa - kappa / (1.0 + x / kappa)
        ex_lda = -(3.0 / (4.0 * np.pi)) * (3.0 * np.pi ** 2) ** (1.0 / 3.0) \
            * safepow(n, 4.0 / 3.0)
        return ex_lda * fx

    def edens_unpol(self, rho, sigma=None, lapl=None, tau=None):
        return self._e_unpol(rho, sigma, tau)

    def edens_pol(self, rho_u, rho_d, sigma_uu=None, sigma_ud=None,
                  sigma_dd=None, lapl_u=None, lapl_d=None,
                  tau_u=None, tau_d=None):
        return 0.5 * (self._e_unpol(2 * rho_u, 4 * sigma_uu, 2 * tau_u)
                      + self._e_unpol(2 * rho_d, 4 * sigma_dd, 2 * tau_d))


class MGGA_C_TPSS(BaseXC):
    """TPSS correlation: revPKZB with self-interaction-free z^3 correction
    (JCP 120, 6898 (2004) eqs. 11-14). One-electron densities give
    exactly zero correlation (tested against the exact H-atom density)."""
    family = 4
    _D = 2.8

    def __init__(self):
        from .gga import GGA_C_PBE
        self._pbe = GGA_C_PBE()

    def _ec_pbe_per_n(self, rho_u, rho_d, suu, sud, sdd):
        n = jnp.maximum(rho_u + rho_d, _RHO_EPS)
        return self._pbe.edens_pol(rho_u, rho_d, suu, sud, sdd) / n

    def edens_pol(self, rho_u, rho_d, sigma_uu=None, sigma_ud=None,
                  sigma_dd=None, lapl_u=None, lapl_d=None,
                  tau_u=None, tau_d=None):
        nu = jnp.maximum(rho_u, 0.0)
        nd = jnp.maximum(rho_d, 0.0)
        n = jnp.maximum(nu + nd, _RHO_EPS)
        suu = jnp.maximum(sigma_uu, 0.0)
        sdd = jnp.maximum(sigma_dd, 0.0)
        sigma = jnp.maximum(suu + 2.0 * sigma_ud + sdd, 0.0)
        tau = jnp.maximum(tau_u + tau_d, _TAU_EPS)
        tau_w = sigma / (8.0 * n)
        z = jnp.clip(tau_w / tau, 0.0, 1.0)
        zeta = jnp.clip(_zeta(nu, nd), -1.0 + 1e-12, 1.0 - 1e-12)
        # xi = |grad zeta| / (2 (3 pi^2 n)^{1/3});
        # |grad zeta|^2 = 4 (nd^2 suu - 2 nu nd sud + nu^2 sdd) / n^4
        gz2 = 4.0 * jnp.maximum(
            nd * nd * suu - 2.0 * nu * nd * sigma_ud + nu * nu * sdd, 0.0) \
            / n ** 4
        xi2 = gz2 / (4.0 * (3.0 * np.pi ** 2 * n) ** (2.0 / 3.0))
        cz = (0.53 + 0.87 * zeta ** 2 + 0.50 * zeta ** 4
              + 2.26 * zeta ** 6)
        den = (1.0 + xi2 * 0.5 * (safepow(1.0 + zeta, -4.0 / 3.0)
                                  + safepow(1.0 - zeta, -4.0 / 3.0))) ** 4
        C = cz / den
        ec_pbe = self._ec_pbe_per_n(nu, nd, suu, sigma_ud, sdd)
        tiny = _RHO_EPS
        ec_u = self._ec_pbe_per_n(nu, tiny, suu, 0.0 * suu, 0.0 * suu)
        ec_d = self._ec_pbe_per_n(nd, tiny, sdd, 0.0 * sdd, 0.0 * sdd)
        ec_u = jnp.maximum(ec_u, ec_pbe)
        ec_d = jnp.maximum(ec_d, ec_pbe)
        z2 = z * z
        ec_rev = (ec_pbe * (1.0 + C * z2)
                  - (1.0 + C) * z2 * (nu / n * ec_u + nd / n * ec_d))
        ec = ec_rev * (1.0 + self._D * ec_rev * z2 * z)
        return n * ec

    def edens_unpol(self, rho, sigma=None, lapl=None, tau=None):
        h = 0.5 * rho
        q = 0.25 * sigma
        return self.edens_pol(h, h, q, q, q, tau_u=0.5 * tau, tau_d=0.5 * tau)
