"""Multi-device sharding correctness (SURVEY §2.10): every mesh axis the
framework exposes (dp = batch of molecules, grid = quadrature points,
tp = density-fitting aux dimension, k = k-point axis) must reproduce the
unsharded numerics exactly (f64, same contraction order up to XLA's
partitioned reductions).

The reference has no distributed execution at all (SURVEY §2.10 — no
NCCL/MPI/Gloo anywhere); these tests are the rebuild's own bar. They run
on the 8 virtual CPU devices configured in conftest.py.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

import dqc_tpu
from dqc_tpu.parallel.mesh import make_mesh, use_mesh
from dqc_tpu.xc.custom import CustomXC

pytestmark = pytest.mark.filterwarnings("ignore::UserWarning")

WATER = "O 0 0 0.2217; H 0 1.4309 -0.8867; H 0 -1.4309 -0.8867"


def test_mesh_requires_enough_devices():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    with pytest.raises(AssertionError):
        make_mesh(n_dp=16)


def test_tp_sharded_ri_jk_energy_matches_unsharded():
    """RI-J/RI-K hybrid Fock with j3c sharded over its aux dimension
    ('tp' axis, scf/df.py) == the single-device numerics. The sharded
    aux contraction is a partitioned reduction (psum over 8 shards), so
    even a single deterministic step differs at summation-order level
    (~1e-9 abs on a -73.6 Ha energy); the full fixed point additionally
    carries DIIS-stall noise (~1e-8)."""
    mol = dqc_tpu.Mol(WATER, basis="sto-3g", grid=0).densityfit()
    qc = dqc_tpu.KS(mol, xc="b3lyp")
    p = qc._all_params()
    theta = qc._build_theta(p)
    eng = qc.engine
    dm0 = jnp.zeros((mol.meta.nao, mol.meta.nao))
    step_e = lambda th, d: eng.energy(eng.step(d, th), th)  # noqa: E731
    e1_ref = float(jax.jit(step_e)(theta, dm0))
    e_ref = float(jax.jit(qc.energy_fn)(p))
    with use_mesh(make_mesh(n_tp=8)):
        e1_tp = float(jax.jit(step_e)(theta, dm0))
        e_tp = float(jax.jit(qc.energy_fn)(p))
    assert e1_tp == pytest.approx(e1_ref, abs=1e-7)
    assert e_tp == pytest.approx(e_ref, abs=5e-8)


def test_grid_sharded_ks_energy_matches_unsharded():
    """Quadrature-grid axis sharding (the long axis; xc/integrate.py
    applies the constraint) == unsharded."""
    mol = dqc_tpu.Mol("H -0.7 0 0; H 0.7 0 0", basis="3-21g", grid=1)
    qc = dqc_tpu.KS(mol, xc="gga_x_pbe")
    p = qc._all_params()
    e_ref = float(jax.jit(qc.energy_fn)(p))
    with use_mesh(make_mesh(n_grid=8)):
        e_g = float(jax.jit(qc.energy_fn)(p))
    assert e_g == pytest.approx(e_ref, abs=1e-11)


def _nnxc_setup():
    def nn_edens(p, d):
        rho = d["rho"]
        x = rho ** (1.0 / 3.0)
        h = jnp.tanh(x[..., None] * p["w1"] + p["b1"])
        f = 1.0 + 0.1 * jnp.tanh(h @ p["w2"] + p["b2"])[..., 0]
        c = 0.75 * (3.0 / jnp.pi) ** (1.0 / 3.0)
        return -c * rho ** (4.0 / 3.0) * f

    key = jax.random.PRNGKey(0)
    nn_params = {"w1": jax.random.normal(key, (4,)) * 0.1,
                 "b1": jnp.zeros(4),
                 "w2": jax.random.normal(key, (4, 1)) * 0.1,
                 "b2": jnp.zeros(1)}
    xc = CustomXC(nn_edens, nn_params, family=1, key="nnxc")
    mol = dqc_tpu.Mol("H -0.5 0 0; H 0.5 0 0", basis="sto-3g", grid=0)
    qc = dqc_tpu.KS(mol, xc=xc)
    p0 = qc._all_params()

    nbatch = 8
    dists = np.linspace(0.9, 1.4, nbatch)
    batch_pos = jnp.asarray(
        np.stack([[[-d / 2, 0, 0], [d / 2, 0, 0]] for d in dists]))
    targets = jnp.asarray(-1.05 - 0.05 * np.cos(dists))

    def energy_one(pos, xcp):
        p = dict(p0)
        p["basis"] = dict(p0["basis"])
        p["basis"]["atompos"] = pos
        p["xc_params"] = xcp
        return qc.energy_fn(p)

    def loss_and_grad(xcp, bp, tg):
        def loss(xcp):
            es = jax.vmap(lambda pos: energy_one(pos, xcp))(bp)
            return jnp.mean((es - tg) ** 2)
        return jax.value_and_grad(loss)(xcp)

    xcp = {"nnxc": nn_params}
    return loss_and_grad, xcp, batch_pos, targets


def test_dp_sharded_nnxc_grad_step_matches_unsharded():
    """Data-parallel batch of molecules: loss and NN-XC parameter
    gradients (through the SCF implicit fixed point) sharded over 'dp'
    == unsharded."""
    loss_and_grad, xcp, batch_pos, targets = _nnxc_setup()

    l_ref, g_ref = jax.jit(loss_and_grad)(xcp, batch_pos, targets)
    l_ref = float(l_ref)
    g_ref = jax.tree_util.tree_map(np.asarray, g_ref)

    mesh = make_mesh(n_dp=8)
    with use_mesh(mesh):
        bsh = NamedSharding(mesh, P("dp", None, None))
        rep = NamedSharding(mesh, P())
        bp = jax.device_put(batch_pos, bsh)
        tg = jax.device_put(targets, NamedSharding(mesh, P("dp")))
        xcp_r = jax.device_put(xcp, rep)
        l_dp, g_dp = jax.jit(
            loss_and_grad,
            in_shardings=(rep, bsh, NamedSharding(mesh, P("dp"))),
            out_shardings=(rep, rep))(xcp_r, bp, tg)
        l_dp = float(l_dp)
        g_dp = jax.tree_util.tree_map(np.asarray, g_dp)

    assert l_dp == pytest.approx(l_ref, rel=1e-12, abs=1e-14)
    flat_ref, _ = jax.tree_util.tree_flatten(g_ref)
    flat_dp, _ = jax.tree_util.tree_flatten(g_dp)
    for a, b in zip(flat_ref, flat_dp):
        np.testing.assert_allclose(b, a, rtol=1e-10, atol=1e-13)


def test_k_sharded_pbc_step_matches_unsharded():
    """k-point axis sharded over the mesh (the expert-parallel analog):
    one SCF step + energy on sharded (nk, nao, nao) tensors == unsharded."""
    from dqc_tpu.system.sol import Sol
    from dqc_tpu.scf.qccalc import _kpbc_ks

    a = 3.0
    kpts = np.array([[0.0, 0.0, 0.0], [np.pi / a, 0.0, 0.0]])
    nk = len(kpts)
    sol = Sol("He 0 0 0", np.eye(3) * a, basis="sto-3g", grid=0, kpts=kpts)
    qk = _kpbc_ks(sol, "lda_x")
    theta = qk._build_theta(qk._all_params(with_fields=False))
    eng = qk.engine

    dm0 = eng.init_dm()
    step_e = jax.jit(lambda d, t: eng.energy(eng.step(d, t), t))
    e_ref = float(step_e(dm0, theta))

    mesh_k = make_mesh(n_dp=nk)  # 'dp' carries the k axis here
    with use_mesh(mesh_k):
        def shard_k(x):
            if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == nk:
                spec = ["dp"] + [None] * (x.ndim - 1)
                return jax.device_put(x, NamedSharding(mesh_k, P(*spec)))
            return x
        th = jax.tree_util.tree_map(shard_k, theta)
        dmk = jax.device_put(dm0, NamedSharding(mesh_k, P("dp", None, None)))
        e_k = float(jax.jit(
            lambda d, t: eng.energy(eng.step(d, t), t))(dmk, th))

    assert e_k == pytest.approx(e_ref, abs=1e-11)


def test_tp_sharded_quartet_blocks_jk_matches_unsharded():
    """The exact-exchange quartet-block path (the headline kernel,
    scf/jk.jk_from_blocks) sharded along each block's bra-pair axis over
    the 'tp' mesh axis == unsharded (VERDICT r3 item 6). Covers both the
    J scatter-adds and the 4-pairing K einsums under GSPMD partitioning
    + psum."""
    from dqc_tpu.scf import qccalc as qmod
    from dqc_tpu.scf.jk import jk_from_blocks, theta_blocks

    saved = qmod.DENSE_ERI_BYTES_LIMIT
    qmod.DENSE_ERI_BYTES_LIMIT = 0     # force the blocked-quartet path
    try:
        mol = dqc_tpu.Mol(WATER, basis="3-21g", grid=0)
        qc = dqc_tpu.HF(mol)
        assert qc._expand_k_info is not None
        theta = qc._build_theta(qc._all_params(with_fields=False))
        theta.pop("eri_k", None)       # exercise the blocks contraction
        bmeta, jkm = qc._expand_k_info
    finally:
        qmod.DENSE_ERI_BYTES_LIMIT = saved

    rng = np.random.default_rng(5)
    d = rng.standard_normal((mol.meta.nao, mol.meta.nao))
    dm = jnp.asarray(d + d.T)
    blocks = theta_blocks(theta, jkm)

    fn = jax.jit(lambda bl, dd: jk_from_blocks(bmeta, jkm, bl, dd))
    j0, k0 = fn(blocks, dm)
    mesh = make_mesh(n_tp=8)
    with use_mesh(mesh):
        fn_sh = jax.jit(lambda bl, dd: jk_from_blocks(bmeta, jkm, bl, dd))
        j1, k1 = fn_sh(blocks, dm)
    np.testing.assert_allclose(np.asarray(j1), np.asarray(j0),
                               rtol=0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(k1), np.asarray(k0),
                               rtol=0, atol=1e-10)
    # and the full SCF energy through the sharded engine path
    e0 = float(qc.run().energy())
    qc2 = dqc_tpu.HF(dqc_tpu.Mol(WATER, basis="3-21g", grid=0))
    with use_mesh(mesh):
        e1 = float(qc2.run().energy())
    assert abs(e1 - e0) < 1e-8, (e1, e0)
