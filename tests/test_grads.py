"""Derivative correctness vs finite differences (jax.test_util.check_grads)
— the analog of the reference's torch.autograd.gradcheck/gradgradcheck
suite (dqc/test/test_libcint.py:247-463, test_ks.py:117-243; SURVEY §4):
integrals and end-to-end SCF energies w.r.t. atom positions, basis
exponents, contraction coefficients, and external fields, to 2nd order.
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.test_util import check_grads
import pytest

import dqc_tpu
from dqc_tpu.ops import integrals as I
from dqc_tpu.ops.eri import eri_dense


@pytest.fixture(scope="module")
def lih():
    # Li brings p functions into every integral class
    return dqc_tpu.Mol("Li 0 0 0; H 0 0 3.0", basis="sto-3g")


def _with(params, key, cls_idx, val):
    p = dict(params)
    if key == "atompos":
        p["atompos"] = val
    else:
        p[key] = list(p[key])
        p[key][cls_idx] = val
        p[key] = tuple(p[key]) if isinstance(params[key], tuple) else p[key]
    return p


def test_overlap_kinetic_grads_pos(lih):
    m = lih
    f = lambda pos: jnp.sum(I.overlap(m.meta, {**m.params, "atompos": pos}))
    g = lambda pos: jnp.sum(I.kinetic(m.meta, {**m.params, "atompos": pos}))
    check_grads(f, (m.params["atompos"],), order=2, modes=["rev"],
                atol=1e-6, rtol=1e-6)
    check_grads(g, (m.params["atompos"],), order=2, modes=["rev"],
                atol=1e-6, rtol=1e-6)


def test_nuclattr_grads_pos_and_z(lih):
    m = lih
    zs = jnp.asarray(m.atomzs, dtype=jnp.float64)

    def f(pos, z):
        return jnp.sum(I.nuclattr(m.meta, {**m.params, "atompos": pos}, z))

    check_grads(f, (m.params["atompos"], zs), order=2, modes=["rev"],
                atol=1e-6, rtol=1e-6)


def test_eri_grads_alpha_coeff(lih):
    m = lih
    w = jnp.cos(jnp.arange(m.meta.nao * 1.0))  # fixed probe vector

    def f(alphas0, coeffs0):
        p = dict(m.params)
        p["alphas"] = [alphas0] + list(m.params["alphas"][1:])
        p["coeffs"] = [coeffs0] + list(m.params["coeffs"][1:])
        G = eri_dense(m.meta, p)
        return jnp.einsum("ijkl,i,j,k,l->", G, w, w, w, w)

    check_grads(f, (m.params["alphas"][0], m.params["coeffs"][0]),
                order=1, modes=["rev"], atol=1e-5, rtol=1e-5)


def test_scf_energy_grad_basis_params():
    """d(E_SCF)/d(alphas, coeffs) through the implicit fixed point vs FD —
    the basis-optimization headline (reference examples/02)."""
    mol = dqc_tpu.Mol("H 0 0 0; H 1.4 0 0", basis="sto-3g")
    qc = dqc_tpu.HF(mol)
    p0 = qc._all_params()

    def e_of(alphas0):
        p = dict(p0)
        p["basis"] = dict(p0["basis"])
        p["basis"]["alphas"] = [alphas0]
        return qc.energy_fn(p)

    a0 = p0["basis"]["alphas"][0]
    g = jax.grad(e_of)(a0)
    h = 1e-5
    for idx in [(0, 0), (1, 2)]:
        da = np.zeros(a0.shape)
        da[idx] = h
        fd = (e_of(a0 + da) - e_of(a0 - da)) / (2 * h)
        assert abs(float(fd) - float(g[idx])) < 1e-6


def test_scf_energy_grad_efield():
    """dE/d(efield) = -dipole; cross-check the AD path against FD."""
    mol = dqc_tpu.Mol("O 0 0 0.2156; H 0 1.4749 -0.8625; H 0 -1.4749 -0.8625",
                      basis="sto-3g")
    qc = dqc_tpu.HF(mol)
    p0 = qc._all_params()

    def e_of(ef):
        p = dict(p0)
        p["efield"] = ef
        return qc.energy_fn(p)

    ef0 = p0["efield"]
    g = jax.grad(e_of)(ef0)
    h = 1e-5
    dz = jnp.zeros(3).at[2].set(h)
    fd = (e_of(ef0 + dz) - e_of(ef0 - dz)) / (2 * h)
    assert abs(float(fd) - float(g[2])) < 1e-7


def test_scf_force_blocked_jk_mode():
    """Implicit-diff force with the blocked-JK execution mode (quartet
    blocks cached in theta): AD flows through the block assembly in the
    theta build instead of the in-loop streaming quartets. FD-checked."""
    from dqc_tpu.scf import qccalc as qmod
    old = qmod.DENSE_ERI_BYTES_LIMIT
    try:
        qmod.DENSE_ERI_BYTES_LIMIT = 0   # dense off -> blocked wins
        mol = dqc_tpu.Mol("H 0 0 0; H 1.4 0 0", basis="3-21g")
        qc = dqc_tpu.HF(mol)
        assert qmod._jk_setup(mol, None)[0] == "blocked"
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
        assert abs(float(g[1, 0]) - float(fd)) < 1e-7

        # untrusted-expansion fallback (the TPU gradient path after a
        # failed expand_k probe, qccalc._trusted_expand_k): eri_k dropped
        # from the traced program, blocks-path K — same exact force
        qc._expand_k_device_ok = False

        def e_blocks(pos):
            p = dict(p0)
            p["basis"] = dict(p0["basis"])
            p["basis"]["atompos"] = pos
            return qc.energy_fn(p)

        g2 = jax.jit(jax.grad(e_blocks))(pos0)
        assert abs(float(g2[1, 0]) - float(g[1, 0])) < 1e-10
    finally:
        qmod.DENSE_ERI_BYTES_LIMIT = old


def test_scf_energy_grad_vext():
    """Grid-tabulated external potential (parity: reference
    hcgto.py:243-250, gradcheck'd in dqc test_ks.py:117-243):
    (a) vext=0 leaves the energy unchanged; (b) a constant shift c adds
    c * nelec (V_ext -> c * S_quadrature); (c) dE/dvext matches FD."""
    desc = "H -0.7 0 0; H 0.7 0 0"
    mol0 = dqc_tpu.Mol(desc, basis="sto-3g", grid=1)
    e_plain = float(dqc_tpu.HF(mol0).run().energy())

    ng = mol0.setup_grid().w0.shape[0]
    mol_z = dqc_tpu.Mol(desc, basis="sto-3g", grid=1,
                        vext=np.zeros(ng))
    assert float(dqc_tpu.HF(mol_z).run().energy()) == pytest.approx(
        e_plain, abs=1e-12)

    c = 0.037
    mol_c = dqc_tpu.Mol(desc, basis="sto-3g", grid=1,
                        vext=np.full(ng, c))
    e_c = float(dqc_tpu.HF(mol_c).run().energy())
    # quadrature S differs from analytic S at grid level 1 -> loose tol
    assert e_c - e_plain == pytest.approx(c * 2.0, abs=5e-4)

    # (c) FD gradient of KS energy w.r.t. per-point vext entries
    rng = np.random.RandomState(0)
    v0 = 0.01 * rng.randn(ng)
    mol_v = dqc_tpu.Mol(desc, basis="sto-3g", grid=1, vext=v0)
    qc = dqc_tpu.KS(mol_v, xc="lda_x")
    p0 = qc._all_params()

    def e_of(v):
        p = dict(p0)
        p["vext"] = v
        return qc.energy_fn(p)

    g = jax.grad(e_of)(p0["vext"])
    h = 1e-5
    for idx in (0, ng // 2, ng - 1):
        dv = jnp.zeros(ng).at[idx].set(h)
        fd = (e_of(p0["vext"] + dv) - e_of(p0["vext"] - dv)) / (2 * h)
        assert abs(float(fd) - float(g[idx])) < 1e-7


def test_expand_k_in_graph_arbitration(monkeypatch):
    """Traced-gradient exchange arbitration (scf/qccalc.solve_dm): with
    DQC_TPU_GRAD_EXPAND_K=cond the traced program checksums the device
    eri_k expansion against the blocks path and lax.cond-selects at
    runtime. (a) Sound expansion: energy/force equal the blocks-only
    ("drop") program. (b) Corrupted expansion (simulated miscompile):
    the cond must fall back to blocks and still be exact."""
    import dqc_tpu.scf.qccalc as qmod
    import dqc_tpu.scf.jk as jkmod
    old = qmod.DENSE_ERI_BYTES_LIMIT
    mol = dqc_tpu.Mol("H -0.7 0 0; H 0.7 0 0", basis="3-21g")
    try:
        qmod.DENSE_ERI_BYTES_LIMIT = 0   # dense off -> blocked + expand_k

        def e_and_g(env):
            monkeypatch.setenv("DQC_TPU_GRAD_EXPAND_K", env)
            qc = dqc_tpu.HF(mol)
            p = qc._all_params()
            e, g = jax.jit(jax.value_and_grad(
                qc.energy_fn))(p)
            return float(e), np.asarray(g["basis"]["atompos"])

        e_drop, g_drop = e_and_g("drop")
        e_cond, g_cond = e_and_g("cond")
        assert e_cond == pytest.approx(e_drop, abs=1e-12)
        np.testing.assert_allclose(g_cond, g_drop, atol=1e-11)

        real = jkmod.expand_k_tensor
        monkeypatch.setattr(jkmod, "expand_k_tensor",
                            lambda meta, jkm, bl: 1.5 * real(meta, jkm, bl))
        e_bad, g_bad = e_and_g("cond")
        assert e_bad == pytest.approx(e_drop, abs=1e-12)
        np.testing.assert_allclose(g_bad, g_drop, atol=1e-11)
    finally:
        qmod.DENSE_ERI_BYTES_LIMIT = old
