"""Range-separated (erf-attenuated) exact exchange: kernel, functional and
SCF-level validation.

The reference cannot express range-separated hybrids at all (no hybrid
exact exchange in its KS engine, /root/reference/dqc/qccalc/ks.py:176-187);
these tests therefore validate against exact mathematical limits and
high-precision oracles rather than reference numbers:
  - attenuated-ERI limits: omega->inf recovers the full Coulomb ERI,
    omega->0 kills it, and lr is monotone in omega;
  - (ss|ss) attenuated integral vs an mpmath oracle built from the
    1D Gaussian transform of the erf kernel (independent derivation);
  - the SR-LDA attenuation factor F(a) vs mpmath (closed form at 50
    digits), including the large-a series branch;
  - SCF: LC-LDA ("lda_x_erf(w) + lr_hf(w) + lda_c_pw") interpolates
    between pure LDA (w->0) and the 100% global hybrid
    ("hf + lda_c_pw", w->inf); dense and DF paths agree;
  - FD gradient check through the implicit SCF at mid omega.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dqc_tpu
from dqc_tpu import Mol
from dqc_tpu.ops.eri import eri_dense
from dqc_tpu.ops.shellstruct import pack_basis
from dqc_tpu.xc import get_xc


def _h2o(basis="sto-3g", **kw):
    return Mol("O 0 0 0.2217; H 0 1.4309 -0.8867; H 0 -1.4309 -0.8867",
               basis=basis, grid=1, **kw)


# ---------------------------------------------------------------- kernels

def test_lr_eri_limits():
    mol = _h2o()
    meta, params = mol.meta, mol.params
    g_full = np.asarray(eri_dense(meta, params))
    g_lr_big = np.asarray(eri_dense(meta, params, omega=1e5))
    g_lr_mid = np.asarray(eri_dense(meta, params, omega=0.5))
    g_lr_sml = np.asarray(eri_dense(meta, params, omega=1e-3))
    nrm = np.linalg.norm(g_full)
    # omega -> inf: erf(wr)/r -> 1/r
    assert np.linalg.norm(g_lr_big - g_full) / nrm < 1e-8
    # omega -> 0: kernel vanishes
    assert np.linalg.norm(g_lr_sml) / nrm < 1e-2
    # in between: strictly smaller than full on the diagonal, nonzero
    d_full = np.einsum("iijj->ij", g_full)
    d_mid = np.einsum("iijj->ij", g_lr_mid)
    assert np.all(d_mid > 0.0)
    assert np.all(d_mid < d_full + 1e-14)


def test_lr_eri_ssss_mpmath_oracle():
    """(00|erf(w r12)/r12|11) for two single-primitive s AOs vs an
    independent mpmath derivation. The L2-normalized AO densities
    chi_a^2, chi_b^2 are unit-charge Gaussians with exponents 2p, 2q, so
    the separation vector r12 is Gaussian-distributed with exponent
    t = (2p)(2q)/(2p+2q) around R; the ERI is the 1D radial expectation
    <erf(w r)/r> over that distribution, integrated at 40 digits —
    no McMurchie-Davidson / Boys machinery shared with the code path."""
    mp = pytest.importorskip("mpmath")
    mp.mp.dps = 40
    from dqc_tpu.utils.datastruct import CGTOBasis, AtomCGTOBasis

    p, q, R, w = 0.8, 1.3, 1.7, 0.6
    bas_a = AtomCGTOBasis(atomz=0, bases=[
        CGTOBasis(angmom=0, alphas=np.array([p]), coeffs=np.array([1.0]))],
        pos=np.array([0.0, 0.0, 0.0]))
    bas_b = AtomCGTOBasis(atomz=0, bases=[
        CGTOBasis(angmom=0, alphas=np.array([q]), coeffs=np.array([1.0]))],
        pos=np.array([0.0, 0.0, R]))
    meta, params = pack_basis([bas_a, bas_b])
    ours = float(np.asarray(eri_dense(meta, params, omega=w))[0, 0, 1, 1])

    theta = 2 * mp.mpf(p) * q / (p + q)   # exponent of the r12 Gaussian

    def integrand(r):
        # exact spherical average of the unit-charge r12 distribution:
        # P(r) = sqrt(theta/pi) (r/R) [e^{-theta(r-R)^2} - e^{-theta(r+R)^2}]
        return (mp.sqrt(theta / mp.pi) * (r / R)
                * (mp.e ** (-theta * (r - R) ** 2)
                   - mp.e ** (-theta * (r + R) ** 2))
                * mp.erf(w * r) / r)

    oracle = float(mp.quad(integrand, [0, R, mp.inf]))
    assert abs(ours - oracle) / abs(oracle) < 1e-10
    # and the full-range tensor matches the w->inf kernel limit
    ours_full = float(np.asarray(eri_dense(meta, params))[0, 0, 1, 1])
    full_analytic = float(mp.erf(mp.sqrt(theta) * R) / R)
    assert abs(ours_full - full_analytic) / full_analytic < 1e-12


def test_sr_lda_attenuation_factor_mpmath():
    mp = pytest.importorskip("mpmath")
    mp.mp.dps = 50
    from dqc_tpu.xc.lda import _erf_attenuation

    def F_mp(a):
        a = mp.mpf(a)
        return 1 - mp.mpf(8) / 3 * a * (
            mp.sqrt(mp.pi) * mp.erf(1 / (2 * a))
            + (2 * a - 4 * a ** 3) * mp.e ** (-1 / (4 * a ** 2))
            - 3 * a + 4 * a ** 3)

    for a in [1e-6, 0.01, 0.3, 1.0, 3.0, 5.9, 6.1, 10.0, 100.0, 1e4]:
        ours = float(_erf_attenuation(jnp.float64(a)))
        ref = float(F_mp(a))
        assert abs(ours - ref) / abs(ref) < 5e-9, (a, ours, ref)


def test_sr_lda_limits():
    """lda_x_erf -> lda_x as omega->0 (F->1) and -> 0 as omega->inf."""
    lda = get_xc("lda_x")
    rho = jnp.asarray([1e-3, 0.1, 1.0, 10.0])
    e_full = lda.edens_unpol(rho)
    e_sr0 = get_xc("lda_x_erf(1e-6)").edens_unpol(rho)
    e_srinf = get_xc("lda_x_erf(1e6)").edens_unpol(rho)
    assert np.allclose(np.asarray(e_sr0), np.asarray(e_full), rtol=1e-4)
    assert np.max(np.abs(np.asarray(e_srinf))) < 1e-6 * float(
        np.max(np.abs(np.asarray(e_full))))


# ---------------------------------------------------------------- algebra

def test_getxc_rsh_algebra():
    xc = get_xc("0.19*hf + 0.46*lr_hf(0.33) + 0.81*gga_c_lyp")
    assert abs(xc.exx_fraction - 0.19) < 1e-15
    assert len(xc.exx_lr) == 1
    c, w = xc.exx_lr[0]
    assert abs(c - 0.46) < 1e-15 and abs(w - 0.33) < 1e-15
    # sr_hf = hf - lr_hf
    xc2 = get_xc("0.25*sr_hf(0.11) + gga_c_pbe")
    assert abs(xc2.exx_fraction - 0.25) < 1e-15
    c2, w2 = xc2.exx_lr[0]
    assert abs(c2 + 0.25) < 1e-15 and abs(w2 - 0.11) < 1e-15
    # same-omega terms merge
    xc3 = get_xc("1*lr_hf(0.4) + -1*lr_hf(0.4)")
    assert xc3.exx_lr == ()


# ---------------------------------------------------------------- SCF

_LC_LDA = "lda_x_erf({w}) + 1*lr_hf({w}) + lda_c_pw"


def test_lc_lda_scf_limits():
    """The LC-LDA range-separated hybrid interpolates between pure LDA
    (omega->0) and the 100% global hybrid 'hf + lda_c_pw' (omega->inf)."""
    e_lda = float(dqc_tpu.KS(_h2o(), xc="lda_x + lda_c_pw").run().energy())
    e_hyb = float(dqc_tpu.KS(_h2o(), xc="1*hf + lda_c_pw").run().energy())
    e_w0 = float(dqc_tpu.KS(
        _h2o(), xc=_LC_LDA.format(w=1e-4)).run().energy())
    e_winf = float(dqc_tpu.KS(
        _h2o(), xc=_LC_LDA.format(w=1e4)).run().energy())
    e_mid = float(dqc_tpu.KS(
        _h2o(), xc=_LC_LDA.format(w=0.5)).run().energy())
    assert abs(e_w0 - e_lda) < 1e-6
    assert abs(e_winf - e_hyb) < 1e-6
    # mid-omega lands strictly between the limits
    lo, hi = sorted([e_lda, e_hyb])
    assert lo - 1e-8 < e_mid < hi + 1e-8


def test_lc_lda_dense_vs_df():
    """Attenuated-metric RI (df_lr) agrees with the dense attenuated ERI
    path at autoaux accuracy."""
    xc = _LC_LDA.format(w=0.5)
    e_dense = float(dqc_tpu.KS(_h2o(), xc=xc).run().energy())
    e_df = float(dqc_tpu.KS(_h2o().densityfit(), xc=xc).run().energy())
    assert abs(e_dense - e_df) < 2e-3


def test_lc_lda_force_fd():
    """FD check of the analytic nuclear gradient through the implicit SCF
    with a range-separated hybrid (exercises AD through the attenuated
    ERI + SR-LDA chain)."""
    mol = Mol("H -0.7 0 0; H 0.7 0 0", basis="sto-3g", grid=1)
    qc = dqc_tpu.KS(mol, xc=_LC_LDA.format(w=0.5))
    p0 = qc._all_params()

    @jax.jit
    def e_of_pos(pos):
        p = dict(p0)
        p["basis"] = dict(p0["basis"])
        p["basis"]["atompos"] = pos
        return qc.energy_fn(p)

    pos0 = p0["basis"]["atompos"]
    g = jax.jit(jax.grad(e_of_pos))(pos0)
    h = 1e-4
    fd = (e_of_pos(pos0.at[1, 0].add(h))
          - e_of_pos(pos0.at[1, 0].add(-h))) / (2 * h)
    assert abs(float(g[1, 0]) - float(fd)) < 1e-6


def test_rsh_pbc_gates():
    """Gamma-point PBC RSH is supported (tests/test_pbc.py); the k-point
    and PBC-densityfit RSH paths are still explicit capability gates."""
    from dqc_tpu import Sol
    kpts = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, np.pi / 3.0]])
    sol_k = Sol("H 0 0 0", alattice=np.eye(3) * 3.0, basis="sto-3g",
                kpts=kpts)
    with pytest.raises(NotImplementedError):
        dqc_tpu.KS(sol_k, xc="lda_x_erf(0.3) + 1*lr_hf(0.3)")
    sol_df = Sol("H 0 0 0", alattice=np.eye(3) * 3.0,
                 basis="sto-3g", spin=1).densityfit(method="gdf")
    qc = dqc_tpu.KS(sol_df, xc="lda_x_erf(0.3) + 1*lr_hf(0.3)")
    with pytest.raises(NotImplementedError):
        qc.run()


def test_ityh_b88_limits():
    """SR-B88 (ITYH attenuation): omega->0 recovers full B88; omega->inf
    kills the energy density; monotone decrease in omega."""
    from dqc_tpu.xc.gga import GGA_X_B88, GGA_X_ITYH_B88
    rho = jnp.asarray([1e-3, 0.02, 0.5, 3.0, 40.0])
    sig = jnp.asarray([1e-6, 1e-3, 0.3, 10.0, 2000.0])
    e_full = GGA_X_B88().edens_unpol(rho, sig)
    e_w0 = GGA_X_ITYH_B88(1e-7).edens_unpol(rho, sig)
    np.testing.assert_allclose(np.asarray(e_w0), np.asarray(e_full),
                               rtol=1e-6)
    e_big = GGA_X_ITYH_B88(1e5).edens_unpol(rho, sig)
    assert np.abs(np.asarray(e_big)).max() < 1e-4 * np.abs(
        np.asarray(e_full)).max()
    last = e_full
    for w in (0.2, 0.5, 1.5, 5.0):
        e_w = GGA_X_ITYH_B88(w).edens_unpol(rho, sig)
        assert np.all(np.asarray(e_w) >= np.asarray(last) - 1e-14)  # less negative
        last = e_w


def test_ityh_b88_sr_lda_consistency():
    """With sigma->0 the ITYH-attenuated B88 must reduce to the exact
    short-range Slater exchange lda_x_erf(w): same attenuation factor,
    and the ITYH a = w sqrt(K)/(6 sqrt(pi) n^(1/3)) collapses onto
    w/(2 kF) at the LDA enhancement."""
    from dqc_tpu.xc.gga import GGA_X_ITYH_B88
    from dqc_tpu.xc.lda import LDA_X_ERF
    rho = jnp.asarray([1e-3, 0.05, 0.7, 5.0, 80.0])
    sig = jnp.full_like(rho, 1e-14)
    w = 0.4
    e_sr_ityh = GGA_X_ITYH_B88(w).edens_unpol(rho, sig)
    e_sr_lda = LDA_X_ERF(w).edens_unpol(rho)
    np.testing.assert_allclose(np.asarray(e_sr_ityh),
                               np.asarray(e_sr_lda), rtol=2e-5)


def test_cam_b3lyp_assembles_and_limits():
    """camb3lyp composite: exx profile 0.19 + 0.46*erf(0.33 r); at
    omega->0 the same CAM algebra must collapse onto the global hybrid
    0.19*HF + 0.81*B88 + 0.19*VWN5 + 0.81*LYP (SCF-level equality)."""
    xc = get_xc("camb3lyp")
    assert abs(xc.exx_fraction - 0.19) < 1e-12
    assert len(xc.exx_lr) == 1
    (coef, om), = xc.exx_lr
    assert abs(coef - 0.46) < 1e-12 and abs(om - 0.33) < 1e-12

    desc = "H -0.7 0 0; H 0.7 0 0"
    cam0 = ("0.19*hf + 0.46*lr_hf(1e-7) + 0.35*gga_x_b88 "
            "+ 0.46*gga_x_ityh_b88(1e-7) + 0.19*lda_c_vwn5 "
            "+ 0.81*gga_c_lyp")
    glob = ("0.19*hf + 0.81*gga_x_b88 + 0.19*lda_c_vwn5 "
            "+ 0.81*gga_c_lyp")
    e0 = float(dqc_tpu.KS(Mol(desc, basis="3-21g", grid=1),
                          xc=cam0).run().energy())
    e1 = float(dqc_tpu.KS(Mol(desc, basis="3-21g", grid=1),
                          xc=glob).run().energy())
    assert abs(e0 - e1) < 5e-7


def test_cam_b3lyp_h2o_scf_runs():
    """End-to-end CAM-B3LYP SCF (dense path) converges and sits in a
    physically sane window bracketing B3LYP."""
    desc = "O 0 0 0.2217; H 0 1.4309 -0.8867; H 0 -1.4309 -0.8867"
    qc = dqc_tpu.KS(Mol(desc, basis="sto-3g", grid=1), xc="camb3lyp").run()
    e_cam = float(qc.energy())
    e_b3 = float(dqc_tpu.KS(Mol(desc, basis="sto-3g", grid=1),
                            xc="b3lyp5").run().energy())
    assert abs(e_cam - e_b3) < 0.2 and e_cam < -74.0


def test_lr_exchange_polarized_consistency():
    """Open-shell LR-exchange paths (engine.py fock_from_parts /
    energy_from_parts polarized branches): (a) restricted vs unrestricted
    LC-LDA on closed-shell H2 agree; (b) doublet H runs finite."""
    desc = "H -0.7 0 0; H 0.7 0 0"
    xc = "lda_x_erf(0.4) + 1*lr_hf(0.4) + lda_c_pw"
    e_r = float(dqc_tpu.KS(Mol(desc, basis="3-21g", grid=1),
                           xc=xc).run().energy())
    e_u = float(dqc_tpu.KS(Mol(desc, basis="3-21g", grid=1),
                           xc=xc, restricted=False).run().energy())
    assert abs(e_r - e_u) < 1e-8
    qc_h = dqc_tpu.KS(Mol("H 0 0 0", basis="3-21g", spin=1, grid=1),
                      xc=xc).run()
    assert np.isfinite(float(qc_h.energy()))
