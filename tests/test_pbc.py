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
