"""XC functional values vs independently-known reference points, and
consistency checks (unpol == pol at zeta=0; vxc from autodiff).

Parity intent: reference test_xc.py validates against pylibxc to 2nd
derivative order; offline we use exact limits + internal consistency +
uniform-electron-gas values.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dqc_tpu.xc import get_xc
from dqc_tpu.xc.lda import LDA_X, LDA_C_PW, LDA_C_VWN5
from dqc_tpu.xc.gga import GGA_X_PBE, GGA_X_B88, GGA_C_LYP, GGA_C_PBE

RHO = jnp.asarray([1e-3, 0.05, 0.3, 1.0, 5.0])
SIG = jnp.asarray([1e-6, 1e-3, 0.05, 0.5, 10.0])


def test_lda_x_value():
    # e_x = -(3/4)(3/pi)^{1/3} rho^{4/3}
    e = LDA_X().edens_unpol(RHO)
    expect = -(3 / 4) * (3 / np.pi) ** (1 / 3) * np.asarray(RHO) ** (4 / 3)
    np.testing.assert_allclose(np.asarray(e), expect, rtol=1e-12)


def test_pol_equals_unpol_at_zero_zeta():
    for xc in (LDA_X(), LDA_C_PW(), LDA_C_VWN5(), GGA_X_PBE(), GGA_X_B88(),
               GGA_C_LYP(), GGA_C_PBE()):
        if xc.family == 1:
            e_u = xc.edens_unpol(RHO)
            e_p = xc.edens_pol(RHO / 2, RHO / 2)
        else:
            e_u = xc.edens_unpol(RHO, sigma=SIG)
            e_p = xc.edens_pol(RHO / 2, RHO / 2, SIG / 4, SIG / 4, SIG / 4)
        np.testing.assert_allclose(np.asarray(e_u), np.asarray(e_p),
                                   rtol=1e-10, err_msg=type(xc).__name__)


def test_pw92_known_values():
    """PW92 correlation energy per electron at rs = 1, 2, 5 (zeta=0):
    well-known values -0.0597, -0.0448, -0.0282 Ha (Perdew-Wang 1992)."""
    for rs, expect in [(1.0, -0.059776), (2.0, -0.044757), (5.0, -0.028216)]:
        rho = 3.0 / (4 * np.pi * rs ** 3)
        e = float(LDA_C_PW().edens_unpol(jnp.asarray([rho]))[0]) / rho
        assert abs(e - expect) < 2e-5, (rs, e)


def test_pbe_x_enhancement_limits():
    """F(s=0) = 1 (LDA limit), F(s->inf) -> 1 + kappa = 1.804."""
    rho = jnp.asarray([1.0])
    e0 = float(GGA_X_PBE().edens_unpol(rho, sigma=jnp.asarray([0.0]))[0])
    elda = float(LDA_X().edens_unpol(rho)[0])
    assert abs(e0 / elda - 1.0) < 1e-10
    ebig = float(GGA_X_PBE().edens_unpol(rho, sigma=jnp.asarray([1e8]))[0])
    assert abs(ebig / elda - 1.804) < 1e-3


def test_xc_algebra():
    xc = 0.25 * get_xc("lda_x") + 0.75 * get_xc("lda_x")
    e = xc.edens_unpol(RHO)
    np.testing.assert_allclose(np.asarray(e),
                               np.asarray(LDA_X().edens_unpol(RHO)),
                               rtol=1e-14)
    b3 = get_xc("b3lyp")
    assert abs(b3.exx_fraction - 0.2) < 1e-14
    assert b3.family == 2


def test_vxc_autodiff_matches_analytic_lda():
    """v_xc for LDA exchange = -(3/pi)^{1/3} rho^{1/3} (analytic)."""
    f = lambda r: jnp.sum(LDA_X().edens_unpol(r))
    v = jax.grad(f)(RHO)
    expect = -(3 / np.pi) ** (1 / 3) * np.asarray(RHO) ** (1 / 3)
    np.testing.assert_allclose(np.asarray(v), expect, rtol=1e-10)


def test_higher_derivatives_nan_free():
    """fxc and kxc (2nd, 3rd derivs) are finite for all families — the
    capability the reference gets from libxc deriv tables."""
    for name in ("lda_x", "lda_c_pw", "gga_x_pbe", "gga_c_pbe", "gga_x_b88",
                 "gga_c_lyp", "mgga_x_scan", "mgga_c_scan"):
        xc = get_xc(name)
        if xc.family == 1:
            f = lambda r: jnp.sum(xc.edens_unpol(r))
            args = (RHO,)
        elif xc.family == 2:
            f = lambda r, s: jnp.sum(xc.edens_unpol(r, sigma=s))
            args = (RHO, SIG)
        else:
            f = lambda r, s, t: jnp.sum(
                xc.edens_unpol(r, sigma=s, lapl=jnp.zeros_like(r), tau=t))
            args = (RHO, SIG, 0.3 * RHO ** (5 / 3) * 4.0)
        for order in range(1, 3):
            g = f
            for _ in range(order):
                g = jax.jacfwd(g)
            out = g(*args)
            assert np.all(np.isfinite(np.asarray(out))), (name, order)


# ---------------------------------------------------------------- TPSS ----

def _h_atom_grid(n=200):
    """Radial Gauss-Legendre grid + exact H-atom ground-state density
    quantities: rho = exp(-2r)/pi (one spin-up electron),
    sigma = |grad rho|^2 = 4 rho^2, tau = rho/2 (iso-orbital, z = 1)."""
    from numpy.polynomial.legendre import leggauss
    x, w = leggauss(n)
    # map (-1,1) -> (0, inf) via r = a(1+x)/(1-x)
    a = 1.0
    r = a * (1 + x) / (1 - x)
    dr = 2 * a / (1 - x) ** 2 * w
    dv = 4 * np.pi * r ** 2 * dr
    rho = np.exp(-2 * r) / np.pi
    return (jnp.asarray(rho), jnp.asarray(4 * rho ** 2),
            jnp.asarray(rho / 2), jnp.asarray(dv))


def test_tpss_x_hydrogen_exact():
    """TPSS exchange is constructed to give the exact H-atom exchange
    energy -0.3125 Ha on the exact density (Tao et al. PRL 91, 146401,
    constraint fixing c and e)."""
    from dqc_tpu.xc.mgga import MGGA_X_TPSS
    rho, sig, tau, dv = _h_atom_grid()
    zero = jnp.zeros_like(rho)
    e = MGGA_X_TPSS().edens_pol(rho, zero, sig, zero, zero,
                                tau_u=tau, tau_d=zero)
    ex = float(jnp.sum(e * dv))
    assert abs(ex - (-0.3125)) < 5e-4, ex


def test_tpss_c_one_electron_free():
    """TPSS correlation vanishes identically for any one-electron density
    (self-interaction-free by construction, JCP 120, 6898 eq. 12)."""
    from dqc_tpu.xc.mgga import MGGA_C_TPSS
    rho, sig, tau, dv = _h_atom_grid()
    zero = jnp.zeros_like(rho)
    e = MGGA_C_TPSS().edens_pol(rho, zero, sig, zero, zero,
                                tau_u=tau, tau_d=zero)
    ec = float(jnp.sum(e * dv))
    assert abs(ec) < 1e-8, ec


def test_tpss_uniform_gas_limits():
    """p=0, z=0, alpha=1: TPSS x -> LDA exchange; TPSS c -> PW92."""
    from dqc_tpu.xc.mgga import MGGA_X_TPSS, MGGA_C_TPSS
    rho = RHO
    tau_unif = 0.3 * (3 * np.pi ** 2) ** (2 / 3) * rho ** (5 / 3)
    zero = jnp.zeros_like(rho)
    ex = MGGA_X_TPSS().edens_unpol(rho, sigma=zero, tau=tau_unif)
    np.testing.assert_allclose(np.asarray(ex),
                               np.asarray(LDA_X().edens_unpol(rho)),
                               rtol=1e-10)
    ec = MGGA_C_TPSS().edens_unpol(rho, sigma=zero, tau=tau_unif)
    np.testing.assert_allclose(np.asarray(ec),
                               np.asarray(LDA_C_PW().edens_unpol(rho)),
                               rtol=1e-7)


def test_tpss_pol_unpol_consistency_and_grads():
    from dqc_tpu.xc.mgga import MGGA_X_TPSS, MGGA_C_TPSS
    rho, sig = RHO, SIG
    tau = 0.3 * (3 * np.pi ** 2) ** (2 / 3) * rho ** (5 / 3) * 1.3
    for xc in (MGGA_X_TPSS(), MGGA_C_TPSS()):
        e_u = xc.edens_unpol(rho, sigma=sig, tau=tau)
        e_p = xc.edens_pol(rho / 2, rho / 2, sig / 4, sig / 4, sig / 4,
                           tau_u=tau / 2, tau_d=tau / 2)
        np.testing.assert_allclose(np.asarray(e_u), np.asarray(e_p),
                                   rtol=1e-9, err_msg=type(xc).__name__)
        # vxc path: grads must be finite (NaN-safety of the clamped forms)
        g = jax.grad(lambda r: jnp.sum(
            xc.edens_unpol(r, sigma=sig, tau=tau)))(rho)
        assert np.all(np.isfinite(np.asarray(g))), type(xc).__name__


def test_vxc_assembly_matches_ad_oracle():
    """Closed-form V_xc assembly (exc_vxc / _vxc_assemble) == brute-force
    jax.grad(exc_energy) for LDA/GGA/MGGA, restricted and polarized, on a
    real molecular Becke grid."""
    import dqc_tpu
    from dqc_tpu.xc.integrate import (exc_energy, exc_vxc, setup_grid_theta,
                                      vxc_matrix_ad)
    mol = dqc_tpu.Mol("O 0 0 0.2217; H 0 1.4309 -0.8867; "
                      "H 0 -1.4309 -0.8867", basis="3-21G", grid=2)
    rng = np.random.RandomState(3)
    nao = mol.meta.nao
    d = 0.1 * rng.randn(nao, nao)
    dm_r = jnp.asarray(d + d.T) + 0.5 * jnp.eye(nao)
    d2 = 0.1 * rng.randn(2, nao, nao)
    dm_p = jnp.asarray(d2 + np.swapaxes(d2, -1, -2)) + 0.25 * jnp.eye(nao)
    grid = mol.setup_grid()
    for name in ("lda_x", "b3lyp", "mgga_x_scan"):
        xc = get_xc(name)
        gt = setup_grid_theta(mol.meta, mol.params, grid, family=xc.family)
        for pol, dm in ((False, dm_r), (True, dm_p)):
            e_ref = exc_energy(xc, dm, gt, pol)
            v_ref = vxc_matrix_ad(xc, dm, gt, pol)
            e, v = exc_vxc(xc, dm, gt, pol)
            np.testing.assert_allclose(float(e), float(e_ref), rtol=1e-12,
                                       err_msg=f"{name} pol={pol}")
            np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref),
                                       atol=1e-11,
                                       err_msg=f"{name} pol={pol}")


def test_pbe_variant_exchange_limits():
    """PBEsol / revPBE / RPBE enhancement-factor invariants: LDA limit at
    s=0; large-s limit 1+kappa; small-s slope = mu (checked against each
    variant's published constant via the s^2 expansion)."""
    from dqc_tpu.xc.gga import GGA_X_PBE_SOL, GGA_X_REVPBE, GGA_X_RPBE
    rho = jnp.asarray([1.0])
    elda = float(LDA_X().edens_unpol(rho)[0])
    kf2 = (3.0 * np.pi ** 2) ** (2.0 / 3.0)
    for xc, kappa, mu in [(GGA_X_PBE_SOL(), 0.804, 10.0 / 81.0),
                          (GGA_X_REVPBE(), 1.245, 0.2195149727645171),
                          (GGA_X_RPBE(), 0.804, 0.2195149727645171)]:
        name = type(xc).__name__
        e0 = float(xc.edens_unpol(rho, sigma=jnp.asarray([0.0]))[0])
        assert abs(e0 / elda - 1.0) < 1e-9, name
        ebig = float(xc.edens_unpol(rho, sigma=jnp.asarray([1e10]))[0])
        assert abs(ebig / elda - (1.0 + kappa)) < 1e-3, name
        # small-s expansion F = 1 + mu s^2: sigma = s^2 * 4 kf^2 rho^2
        s2 = 1e-6
        esm = float(xc.edens_unpol(rho,
                                   sigma=jnp.asarray([s2 * 4.0 * kf2]))[0])
        mu_fit = (esm / elda - 1.0) / s2
        assert abs(mu_fit - mu) < 1e-4 * mu, (name, mu_fit)


def test_pbe_variant_spin_scaling_and_pbesol_c():
    """Spin-scaling consistency for the new exchange variants; PBEsol
    correlation keeps the PW92 uniform-gas limit (H(t=0)=0) and differs
    from PBE correlation at finite gradient (beta 0.046 vs 0.0667)."""
    from dqc_tpu.xc.gga import (GGA_X_PBE_SOL, GGA_X_REVPBE, GGA_X_RPBE,
                                GGA_C_PBE_SOL)
    for xc in (GGA_X_PBE_SOL(), GGA_X_REVPBE(), GGA_X_RPBE(),
               GGA_C_PBE_SOL()):
        e_u = xc.edens_unpol(RHO, sigma=SIG)
        e_p = xc.edens_pol(RHO / 2, RHO / 2, SIG / 4, SIG / 4, SIG / 4)
        np.testing.assert_allclose(np.asarray(e_u), np.asarray(e_p),
                                   rtol=1e-10, err_msg=type(xc).__name__)
    rho = jnp.asarray([0.3])
    c_sol = GGA_C_PBE_SOL()
    c_pbe = GGA_C_PBE()
    e0_sol = float(c_sol.edens_unpol(rho, sigma=jnp.asarray([0.0]))[0])
    e0_pbe = float(c_pbe.edens_unpol(rho, sigma=jnp.asarray([0.0]))[0])
    assert abs(e0_sol - e0_pbe) < 1e-12          # same UEG limit
    eg_sol = float(c_sol.edens_unpol(rho, sigma=jnp.asarray([0.5]))[0])
    eg_pbe = float(c_pbe.edens_unpol(rho, sigma=jnp.asarray([0.5]))[0])
    assert abs(eg_sol - eg_pbe) > 1e-4           # beta genuinely differs
    # small-t expansion of H is beta*t^2: ratio of (e - e0) ~ beta ratio
    tiny = jnp.asarray([1e-5])
    r_sol = float(c_sol.edens_unpol(rho, sigma=tiny)[0]) - e0_sol
    r_pbe = float(c_pbe.edens_unpol(rho, sigma=tiny)[0]) - e0_pbe
    assert abs(r_sol / r_pbe - 0.046 / 0.06672455060314922) < 1e-3


def test_new_named_composites_resolve():
    from dqc_tpu.xc import get_xc
    for name, hyb in [("pbesol", 0.0), ("revpbe", 0.0), ("rpbe", 0.0),
                      ("bhandhlyp", 0.5)]:
        xc = get_xc(name)
        assert getattr(xc, "exx_fraction", 0.0) == hyb, name
        e = xc.edens_unpol(RHO, sigma=SIG)
        assert np.all(np.isfinite(np.asarray(e))), name
    # meta-GGA hybrids need lapl/kin args
    for name, hyb in [("tpssh", 0.10), ("scan0", 0.25)]:
        xc = get_xc(name)
        assert abs(getattr(xc, "exx_fraction", 0.0) - hyb) < 1e-12, name
        assert xc.family == 4, name
        e = xc.edens_unpol(RHO, sigma=SIG, lapl=0 * RHO, tau=RHO)
        assert np.all(np.isfinite(np.asarray(e))), name


def test_pz81_correlation():
    """PZ81 (lda_c_pz): continuous at rs=1, tracks PW92 (both fit the same
    Ceperley-Alder data; agreement ~1 mHa/electron), correct known value
    eps_c(rs=1, zeta=0) = -0.0596 Ha (Perdew-Zunger 1981 Table XII)."""
    from dqc_tpu.xc.lda import LDA_C_PZ, LDA_C_PW
    pz, pw = LDA_C_PZ(), LDA_C_PW()

    def eps(xc, rs):
        rho = 3.0 / (4 * np.pi * rs ** 3)
        return float(xc.edens_unpol(jnp.asarray([rho]))[0]) / rho

    assert abs(eps(pz, 1.0) - (-0.0596)) < 1e-4
    # continuity at the rs=1 branch switch (the published constants are
    # rounded; the residual jump is ~3.3e-5 Ha — same in libxc)
    assert abs(eps(pz, 1.0 - 1e-7) - eps(pz, 1.0 + 1e-7)) < 1e-4
    for rs in (0.2, 0.5, 2.0, 5.0, 10.0):
        assert abs(eps(pz, rs) - eps(pw, rs)) < 2.5e-3, rs
    # polarized consistency + finite grads through both branches
    e_u = pz.edens_unpol(RHO)
    e_p = pz.edens_pol(RHO / 2, RHO / 2)
    np.testing.assert_allclose(np.asarray(e_u), np.asarray(e_p), rtol=1e-10)
    g = jax.grad(lambda r: jnp.sum(pz.edens_unpol(r)))(RHO)
    assert np.all(np.isfinite(np.asarray(g)))


def test_optx_exchange():
    """OPTX (gga_x_optx): sigma=0 limit is a1 * LDA exchange with
    a1=1.05151 (Handy-Cohen 2001); finite at large gradients with the
    enhancement bounded by a1*Cx + a2; olyp composite resolves."""
    from dqc_tpu.xc.gga import GGA_X_OPTX
    from dqc_tpu.xc import get_xc
    optx = GGA_X_OPTX()
    e0 = np.asarray(optx.edens_unpol(RHO, sigma=jnp.zeros_like(RHO)))
    elda = np.asarray(LDA_X().edens_unpol(RHO))
    np.testing.assert_allclose(e0, 1.05151 * elda, rtol=1e-10)
    # x -> inf: u -> 1, so e/n^{4/3} -> -(a1*Cx + a2) per spin
    rho = jnp.asarray([1.0])
    ebig = float(optx.edens_unpol(rho, sigma=jnp.asarray([1e12]))[0])
    cx = 1.5 * (3.0 / (4 * np.pi)) ** (1 / 3)
    expect = -2.0 * (1.05151 * cx + 1.43169) * 0.5 ** (4 / 3)
    assert abs(ebig - expect) < 1e-3
    xc = get_xc("olyp")
    e = xc.edens_unpol(RHO, sigma=SIG)
    assert np.all(np.isfinite(np.asarray(e)))
    # spin-scaling consistency
    e_u = optx.edens_unpol(RHO, sigma=SIG)
    e_p = optx.edens_pol(RHO / 2, RHO / 2, SIG / 4, SIG / 4, SIG / 4)
    np.testing.assert_allclose(np.asarray(e_u), np.asarray(e_p), rtol=1e-10)


def test_third_derivative_fd_accuracy():
    """3rd-order functional derivatives (kxc level) are not just finite
    but CORRECT: d^3 e/d rho^3 from nested AD vs central FD of the exact
    2nd derivative, per family (reference parity: libxc deriv tables to
    4th order, xc/libxc_wrapper.py:76-373)."""
    cases = [
        ("lda_x", {}),
        ("lda_c_pw", {}),
        ("gga_x_pbe", {"sigma": 0.37}),
        ("gga_c_lyp", {"sigma": 0.37}),
        ("gga_x_b88", {"sigma": 0.37}),
        ("mgga_x_scan", {"sigma": 0.37, "tau": 0.8}),
    ]
    for name, kw in cases:
        xc = get_xc(name)

        def f(r):
            kws = {k: jnp.asarray([v]) for k, v in kw.items()}
            if xc.family >= 4:
                kws["lapl"] = jnp.zeros((1,))
            return xc.edens_unpol(jnp.asarray([r]), **kws)[0]

        d2 = jax.grad(jax.grad(f))
        d3 = jax.grad(d2)
        for r0 in (0.3, 1.1, 4.0):
            h = 1e-4 * r0
            fd = (d2(r0 + h) - d2(r0 - h)) / (2 * h)
            ad = d3(r0)
            assert np.isfinite(float(ad)), (name, r0)
            denom = max(abs(float(fd)), 1e-10)
            assert abs(float(ad) - float(fd)) / denom < 1e-5, (name, r0)


def test_fourth_derivative_finite():
    """lxc-level (4th) derivatives stay finite — the full derivative
    order libxc tables expose."""
    for name in ("lda_x", "gga_x_pbe", "gga_c_lyp"):
        xc = get_xc(name)

        def f(r):
            if xc.family == 1:
                return xc.edens_unpol(jnp.asarray([r]))[0]
            return xc.edens_unpol(jnp.asarray([r]),
                                  sigma=jnp.asarray([0.37]))[0]

        g = f
        for _ in range(4):
            g = jax.grad(g)
        assert np.isfinite(float(g(0.9))), name
