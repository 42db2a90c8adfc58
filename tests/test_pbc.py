"""PBC foundations: Ewald vs Madelung constants; lattice-sum integrals
against the isolated-molecule limit (backend-free invariants)."""
import numpy as np
import jax.numpy as jnp

from dqc_tpu.system.lattice import Lattice, ewald_energy
from dqc_tpu.system.sol import Sol


def test_ewald_cscl_madelung():
    a = 2.0
    lat = Lattice(np.eye(3) * a)
    pos = np.array([[0., 0., 0.], [a / 2, a / 2, a / 2]])
    e = float(ewald_energy(np.array([1., -1.]), pos, lat))
    r_nn = np.sqrt(3) * a / 2
    assert abs(-e * r_nn - 1.76267477) < 1e-6


def test_ewald_nacl_madelung():
    # rocksalt: fcc cell with Na at corner, Cl at center offset
    a = 2.0
    lat = Lattice(np.array([[0., a, a], [a, 0., a], [a, a, 0.]]) / 2 * 2)
    pos = np.array([[0., 0., 0.], [a, a, a]])
    e = float(ewald_energy(np.array([1., -1.]), pos, lat))
    assert abs(-e * a - 1.74756459) < 1e-6


def test_pbc_overlap_isolated_limit():
    """For a huge cell, gamma-point lattice-sum S equals molecular S."""
    from dqc_tpu.ops.integrals import overlap, kinetic
    sol = Sol("H 0 0 0; H 1.4 0 0", np.eye(3) * 30.0, basis="sto-3g")
    S_pbc = np.asarray(sol.pbc_overlap())[0]
    T_pbc = np.asarray(sol.pbc_kinetic())[0]
    S_mol = np.asarray(overlap(sol.meta, sol.params))
    T_mol = np.asarray(kinetic(sol.meta, sol.params))
    assert np.abs(S_pbc.imag).max() < 1e-12
    np.testing.assert_allclose(S_pbc.real, S_mol, atol=1e-9)
    np.testing.assert_allclose(T_pbc.real, T_mol, atol=1e-9)


def test_pbc_overlap_kpoint_hermitian():
    sol = Sol("H 0 0 0", np.eye(3) * 3.0, basis="sto-3g",
              kpts=np.array([[0.1, 0.2, -0.3], [0.0, 0.0, 0.0]]))
    S = np.asarray(sol.pbc_overlap())
    for k in range(S.shape[0]):
        np.testing.assert_allclose(S[k], S[k].conj().T, atol=1e-12)
    # gamma-point diagonal larger than 1 (overlap with images adds)
    assert S[1, 0, 0].real > 1.0


def test_pair_ft_g0_equals_overlap():
    """F(G=0) = lattice-summed overlap (gamma) — invariant of the AFT
    machinery (ops/pbcft.py) vs the real-space lattice sum (ops/pbc.py)."""
    from dqc_tpu.ops.pbcft import pbc_pair_plan, pbc_pair_ft
    sol = Sol("H 0 0 0", np.eye(3) * 3.0, basis="3-21g", spin=1)
    S = np.asarray(sol.pbc_overlap())[0].real
    plan = pbc_pair_plan(sol.meta, sol.params, sol.lattice, 1e-12)
    Gv = np.array([[0.0, 0.0, 0.0]])
    Fre, Fim = pbc_pair_ft(sol.meta, sol.params, plan, Gv)
    np.testing.assert_allclose(np.asarray(Fre)[0], S, atol=1e-9)
    assert np.abs(np.asarray(Fim)[0]).max() < 1e-12


def test_pbc_grid_integrates_density():
    """Cell-wrapped Becke grid + lattice-summed AOs integrate the periodic
    density to the electron count."""
    import jax
    from dqc_tpu.ops.pbc import estimate_rcut
    from dqc_tpu.scf.pbc import setup_pbc_grid_theta
    sol = Sol("H 0 0 0", np.eye(3) * 3.0, basis="3-21g", spin=1, grid="sg2")
    pbcgrid = sol.setup_grid()
    ls_ao = sol.lattice.get_lattice_ls(estimate_rcut(sol.meta, sol.params, 1e-8))
    gt = jax.jit(lambda p: setup_pbc_grid_theta(sol.meta, p, pbcgrid, ls_ao)
                 )(sol.params)
    S = np.asarray(sol.pbc_overlap())[0].real
    # dm for one electron in the S-orthonormalized lowest combination:
    # any normalized vector c with c S c = 1 gives integral(rho) = 1
    w, v = np.linalg.eigh(S)
    c = v[:, -1] / np.sqrt(w[-1])
    dm = np.outer(c, c)
    ao = np.asarray(gt["ao"])
    rho = np.einsum("gi,ij,gj->g", ao, dm, ao)
    n = float(np.sum(np.asarray(gt["dvol"]) * rho))
    assert abs(n - 1.0) < 1e-3


# PySCF-GDF anchors from the reference's own PBC test
# (/root/reference/dqc/test/test_ks.py:534-570): H simple cubic a=3 Bohr,
# 3-21G, unrestricted, sg3 grid, rtol 1e-3.
import pytest


@pytest.mark.parametrize("xc,eref", [
    ("lda_x", -8.48464009e-01),
    ("gga_x_pbe", -8.55645550e-01),
])
def test_pbc_ks_energy(xc, eref):
    import dqc_tpu
    sol = Sol("H 0 0 0", np.eye(3) * 3.0, basis="3-21g", spin=1, grid="sg3")
    qc = dqc_tpu.KS(sol, xc=xc).run()
    e = float(qc.energy())
    assert abs(e - eref) < 1e-3 * abs(eref)


def test_kpoint_gamma_matches_gamma_engine():
    """The complex k-point engine at k~Gamma reproduces the real
    gamma-point path exactly."""
    import dqc_tpu
    a = np.eye(3) * 3.0
    s1 = Sol("He 0 0 0", a, basis="sto-3g", grid="sg2")
    e_gamma = float(dqc_tpu.KS(s1, xc="lda_x").run().energy())
    s2 = Sol("He 0 0 0", a, basis="sto-3g", grid="sg2",
             kpts=np.array([[1e-13, 0.0, 0.0]]))
    e_k = float(dqc_tpu.KS(s2, xc="lda_x").run().energy())
    assert abs(e_k - e_gamma) < 1e-10


def test_kpoint_supercell_invariant():
    """Bloch theorem: N-point k-mesh on the primitive cell == N-fold
    supercell at gamma (per cell). Backend-free oracle for the whole
    k-point pipeline (pair FT phases, complex SCF, k-summed density)."""
    import dqc_tpu
    a = 3.0
    kpts = np.array([[0.0, 0.0, 0.0], [np.pi / a, 0.0, 0.0]])
    s1 = Sol("He 0 0 0", np.eye(3) * a, basis="sto-3g", grid="sg2",
             kpts=kpts)
    e_k = float(dqc_tpu.KS(s1, xc="lda_x").run().energy())
    s2 = Sol(f"He 0 0 0; He {a} 0 0", np.diag([2 * a, a, a]),
             basis="sto-3g", grid="sg2")
    e_sc = float(dqc_tpu.KS(s2, xc="lda_x").run().energy())
    assert abs(e_k - e_sc / 2) < 1e-6


def test_eval_ao_ft_vs_numeric():
    """Analytic single-AO Fourier transform (ops/pbcft.eval_ao_ft, parity:
    reference eval_gto_ft) vs brute-force cube-grid quadrature, covering s
    and p functions."""
    import jax.numpy as jnp
    import dqc_tpu
    from dqc_tpu.ops.pbcft import eval_ao_ft
    from dqc_tpu.ops.aoeval import eval_ao
    m = dqc_tpu.Mol("C 0 0 0", basis="sto-3g")
    Gv = np.array([[0.0, 0.0, 0.0], [0.5, 0.0, 0.0], [0.3, -0.2, 0.7]])
    re, im = eval_ao_ft(m.meta, m.params, Gv)
    n = 101
    x = np.linspace(-7.0, 7.0, n)
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    pts = np.stack([X, Y, Z], -1).reshape(-1, 3)
    ao = np.asarray(eval_ao(m.meta, m.params, jnp.asarray(pts))["ao"])
    dv = (x[1] - x[0]) ** 3
    for g in range(3):
        ph = np.exp(-1j * pts @ Gv[g])
        num = (ao * ph[:, None]).sum(0) * dv
        np.testing.assert_allclose(num.real, np.asarray(re)[g], atol=2e-4)
        np.testing.assert_allclose(num.imag, np.asarray(im)[g], atol=2e-4)
