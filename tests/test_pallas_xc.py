"""DS grid-XC Pallas kernels (ops/pallas_xc.py).

Real-TPU validation is integrity.maybe_build_dsg's run()-time probe
(kernels vs f64 einsum chain on the device) — here the kernel LOGIC
runs in Pallas interpret mode on CPU against the f64 oracles, and the
plane/split construction is checked for exactness. Interpret mode
evaluates the f32 chain with excess precision (see test_pallas_jk.py),
so these tests validate plumbing and the contraction pattern, not the
double-single arithmetic itself.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dqc_tpu.ops import pallas_xc


def _tables(ng, nao, seed=0):
    rng = np.random.default_rng(seed)
    ao = rng.standard_normal((ng, nao)) * np.exp(
        rng.uniform(-6, 2, (ng, nao)))
    ag = rng.standard_normal((3, ng, nao)) * np.exp(
        rng.uniform(-6, 2, (3, ng, nao)))
    return jnp.asarray(ao), jnp.asarray(ag)


def test_plane_split_exact():
    ao, ag = _tables(37, 11)
    planes = jax.jit(pallas_xc.grid_planes)(ao, ag)
    P, Gpad = planes["aoTh"].shape
    assert P % 8 == 0 and Gpad % pallas_xc.GBLK == 0
    back = (np.asarray(planes["aoTh"], dtype=np.float64)
            + np.asarray(planes["aoTl"], dtype=np.float64))
    scale = float(jnp.abs(ao).max())
    assert np.abs(back[:11, :37] - np.asarray(ao).T).max() \
        < 2.0 ** -46 * scale
    # padding exactly zero (dead rows/lanes contribute nothing)
    assert np.all(back[11:] == 0) and np.all(back[:, 37:] == 0)
    gback = (np.asarray(planes["agTh"], dtype=np.float64)
             + np.asarray(planes["agTl"], dtype=np.float64))
    assert gback.shape == (3, P, Gpad)
    assert np.all(gback[:, 11:] == 0) and np.all(gback[:, :, 37:] == 0)


def test_dens_reference_matches_einsum():
    ng, nao = 53, 9
    ao, ag = _tables(ng, nao, seed=1)
    rng = np.random.default_rng(2)
    dm = rng.standard_normal((nao, nao))
    dm = jnp.asarray(dm + dm.T)
    planes = pallas_xc.grid_planes(ao, ag)
    rho, gdot = pallas_xc.ds_dens_reference(planes, dm, ng)
    b = ao @ dm
    rho_ref = jnp.einsum("gi,gi->g", b, ao)
    gb = jnp.einsum("dgi,ij->dgj", ag, dm)
    gd_ref = 2.0 * jnp.einsum("dgi,gi->dg", gb, ao)
    np.testing.assert_allclose(np.asarray(rho), np.asarray(rho_ref),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(gdot), np.asarray(gd_ref),
                               rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("ng,nao", [(100, 10), (700, 26)])
def test_dens_kernel_interpret(ng, nao):
    ao, ag = _tables(ng, nao, seed=3)
    rng = np.random.default_rng(4)
    dm = rng.standard_normal((nao, nao))
    dm = jnp.asarray(dm + dm.T)
    planes = pallas_xc.grid_planes(ao, ag)
    rho, gdot = pallas_xc.ds_dens_gga(planes, dm, ng, interpret=True)
    rho_ref, gd_ref = pallas_xc.ds_dens_reference(planes, dm, ng)
    sr = float(jnp.abs(rho_ref).max())
    sg = float(jnp.abs(gd_ref).max())
    # NOTE: the Pallas INTERPRETER evaluates the f32 chain with excess
    # precision and rounds at ref stores — the TwoSum compensation
    # cannot see those roundings, so interpret mode carries ~f32-ulp
    # error per store and verifies PLUMBING only (same bound as
    # test_pallas_jk.py). Real DS accuracy is probed on-chip at every
    # run() (integrity.maybe_build_dsg, rel gate 1e-10).
    np.testing.assert_allclose(np.asarray(rho), np.asarray(rho_ref),
                               atol=1e-5 * sr)
    np.testing.assert_allclose(np.asarray(gdot), np.asarray(gd_ref),
                               atol=1e-5 * sg)


@pytest.mark.parametrize("ng,nao", [(100, 10), (700, 26)])
def test_vxc_kernel_interpret(ng, nao):
    ao, ag = _tables(ng, nao, seed=5)
    rng = np.random.default_rng(6)
    vr = jnp.asarray(rng.standard_normal(ng))
    vg = jnp.asarray(rng.standard_normal((3, ng)))
    planes = pallas_xc.grid_planes(ao, ag)
    wth, wtl = pallas_xc.build_wt(planes, vr, vg, ng)
    v = pallas_xc.ds_vxc_gga(planes, wth, wtl, nao, interpret=True)
    v_full = pallas_xc.ds_vxc_reference(planes, wth, wtl)
    v_ref = v_full[:nao, :nao]
    # and against the closed-form einsum assembly on the raw tables
    from dqc_tpu.xc.integrate import _vxc_assemble
    v_asm = _vxc_assemble({"rho": vr, "grad": vg},
                          {"ao": ao, "ao_grad": ag})
    scale = float(jnp.abs(v_asm).max())
    # interpret-mode plumbing bound (see test_dens_kernel_interpret)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref),
                               atol=1e-5 * scale)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_asm),
                               atol=1e-5 * scale)


def test_exc_vxc_dsg_integration(monkeypatch):
    """The full dsg fast path (_exc_vxc_dsg) against the einsum path on
    a real molecular grid theta — pallas in interpret mode."""
    monkeypatch.setenv("DQC_TPU_PALLAS_XC_INTERPRET", "1")
    import dqc_tpu
    from dqc_tpu.xc.getxc import get_xc
    from dqc_tpu.xc import integrate

    mol = dqc_tpu.Mol("H 0 0 0; H 0 0 1.4", basis="sto-3g", grid=1)
    grid = mol.setup_grid()
    tabs = integrate.setup_grid_theta(mol.meta, mol.params, grid,
                                      family=2)
    xc = get_xc("pbe")
    nao = tabs["ao"].shape[-1]
    rng = np.random.default_rng(7)
    dm = rng.standard_normal((nao, nao)) * 0.3
    dm = jnp.asarray(dm + dm.T) + 0.5 * jnp.eye(nao)
    exc_ref, v_ref = (integrate.exc_energy(xc, dm, tabs, False),
                      integrate.vxc_matrix(xc, dm, tabs, False))
    tabs_ds = dict(tabs)
    tabs_ds["dsg"] = pallas_xc.grid_planes(tabs["ao"], tabs["ao_grad"])
    assert integrate._dsg_usable(tabs_ds, xc, dm, 10 ** 9)
    exc_ds = integrate.exc_energy(xc, dm, tabs_ds, False)
    v_ds = integrate.vxc_matrix(xc, dm, tabs_ds, False)
    # interpret-mode plumbing bound (see test_dens_kernel_interpret)
    assert abs(float(exc_ds) - float(exc_ref)) \
        < 1e-5 * max(abs(float(exc_ref)), 1.0)
    np.testing.assert_allclose(np.asarray(v_ds), np.asarray(v_ref),
                               atol=1e-5 * float(jnp.abs(v_ref).max()))

    # polarized path: two per-spin kernel passes through the same planes
    dmp = jnp.stack([dm * 0.6, dm * 0.4])
    excp_ref = integrate.exc_energy(xc, dmp, tabs, True)
    vp_ref = integrate.vxc_matrix(xc, dmp, tabs, True)
    excp_ds = integrate.exc_energy(xc, dmp, tabs_ds, True)
    vp_ds = integrate.vxc_matrix(xc, dmp, tabs_ds, True)
    assert abs(float(excp_ds) - float(excp_ref)) \
        < 1e-5 * max(abs(float(excp_ref)), 1.0)
    np.testing.assert_allclose(np.asarray(vp_ds), np.asarray(vp_ref),
                               atol=1e-5 * float(jnp.abs(vp_ref).max()))
