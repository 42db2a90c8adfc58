"""Streaming direct-SCF J/K vs the dense-ERI reference path."""
import numpy as np
import jax.numpy as jnp

import dqc_tpu
from dqc_tpu import Mol
from dqc_tpu.ops.eri import eri_dense
from dqc_tpu.scf.jk import build_jk_meta, build_jk_factors, jk_matrices


def test_stream_jk_matches_dense():
    mol = Mol("O 0 0 0.2217; H 0 1.4309 -0.8867; H 0 -1.4309 -0.8867",
              basis="3-21G")
    meta, params = mol.meta, mol.params
    rng = np.random.RandomState(0)
    d = rng.randn(meta.nao, meta.nao)
    dm = jnp.asarray(d + d.T)
    G = eri_dense(meta, params)
    J_ref = jnp.einsum("ijkl,kl->ij", G, dm)
    K_ref = jnp.einsum("ikjl,kl->ij", G, dm)
    jkm = build_jk_meta(meta)
    facs = build_jk_factors(meta, params, jkm)
    J, K = jk_matrices(meta, jkm, facs, dm)
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_ref), atol=1e-11)
    np.testing.assert_allclose(np.asarray(K), np.asarray(K_ref), atol=1e-11)


def test_stream_jk_polarized():
    mol = Mol("Li 0 0 0", basis="3-21G", spin=1)
    meta, params = mol.meta, mol.params
    rng = np.random.RandomState(1)
    d = rng.randn(2, meta.nao, meta.nao)
    dm = jnp.asarray(d + np.swapaxes(d, -1, -2))
    G = eri_dense(meta, params)
    K_ref = jnp.einsum("ikjl,skl->sij", G, dm)
    jkm = build_jk_meta(meta)
    facs = build_jk_factors(meta, params, jkm)
    _, K = jk_matrices(meta, jkm, facs, dm, want_j=False)
    np.testing.assert_allclose(np.asarray(K), np.asarray(K_ref), atol=1e-11)


def test_host_loop_stream_split_jk_matches_dense():
    """Host-driven DIIS with the per-combo jitted quartet stream (the
    def2-SVP-scale execution mode) reproduces the dense-ERI device-loop
    energy."""
    import dqc_tpu
    from dqc_tpu.scf import qccalc as qmod
    mol = dqc_tpu.Mol("O 0 0 0.2217; H 0 1.4309 -0.8867; H 0 -1.4309 -0.8867",
                      basis="3-21g")
    e_ref = float(dqc_tpu.HF(mol).run().energy())
    old_limit, old_nao = qmod.DENSE_ERI_BYTES_LIMIT, qmod.SCF_QCCalc.HOST_LOOP_NAO
    old_blocked = qmod.BLOCKED_JK_BYTES_LIMIT
    try:
        qmod.DENSE_ERI_BYTES_LIMIT = 0          # force streaming quartets
        qmod.BLOCKED_JK_BYTES_LIMIT = 0         # ... not the blocked cache
        qmod.SCF_QCCalc.HOST_LOOP_NAO = 1       # force host-driven DIIS
        mol2 = dqc_tpu.Mol(
            "O 0 0 0.2217; H 0 1.4309 -0.8867; H 0 -1.4309 -0.8867",
            basis="3-21g")
        e_host = float(dqc_tpu.HF(mol2).run().energy())
    finally:
        qmod.DENSE_ERI_BYTES_LIMIT = old_limit
        qmod.BLOCKED_JK_BYTES_LIMIT = old_blocked
        qmod.SCF_QCCalc.HOST_LOOP_NAO = old_nao
    assert abs(e_ref - e_host) < 1e-9, (e_ref, e_host)


def test_blocked_jk_matches_dense():
    """Cached canonical quartet blocks (theta "jkb{i}") contract to the
    same J/K as the dense ERI — restricted and spin-stacked."""
    from dqc_tpu.scf.jk import build_jk_block, jk_combos, jk_from_blocks
    mol = Mol("O 0 0 0.2217; H 0 1.4309 -0.8867; H 0 -1.4309 -0.8867",
              basis="3-21G")
    meta, params = mol.meta, mol.params
    rng = np.random.RandomState(2)
    d = rng.randn(meta.nao, meta.nao)
    dm = jnp.asarray(d + d.T)
    G = eri_dense(meta, params)
    J_ref = jnp.einsum("ijkl,kl->ij", G, dm)
    K_ref = jnp.einsum("ikjl,kl->ij", G, dm)
    jkm = build_jk_meta(meta)
    blocks = [build_jk_block(meta, params, jkm, ci)
              for ci in range(len(jk_combos(jkm)))]
    J, K = jk_from_blocks(meta, jkm, blocks, dm)
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_ref), atol=1e-11)
    np.testing.assert_allclose(np.asarray(K), np.asarray(K_ref), atol=1e-11)
    d2 = rng.randn(2, meta.nao, meta.nao)
    dm2 = jnp.asarray(d2 + np.swapaxes(d2, -1, -2))
    K2_ref = jnp.einsum("ikjl,skl->sij", G, dm2)
    _, K2 = jk_from_blocks(meta, jkm, blocks, dm2, want_j=False)
    np.testing.assert_allclose(np.asarray(K2), np.asarray(K2_ref),
                               atol=1e-11)


def test_expand_k_tensor_matches_dense():
    """Exchange-layout dense ERI assembled from the canonical blocks equals
    the transpose of the reference dense tensor: G_K = G.transpose(0,2,1,3),
    so K via "ijkl,skl->sij" on G_K == the dense-path K."""
    from dqc_tpu.scf.jk import (build_jk_block, expand_k_tensor, jk_combos)
    mol = Mol("O 0 0 0.2217; H 0 1.4309 -0.8867; H 0 -1.4309 -0.8867",
              basis="3-21G")
    meta, params = mol.meta, mol.params
    G = np.asarray(eri_dense(meta, params))
    jkm = build_jk_meta(meta)
    blocks = [build_jk_block(meta, params, jkm, ci)
              for ci in range(len(jk_combos(jkm)))]
    GK = np.asarray(expand_k_tensor(meta, jkm, blocks))
    np.testing.assert_allclose(GK, G.transpose(0, 2, 1, 3), atol=1e-11)
    # the host-numpy twin (integrity-probe recovery path) is identical
    from dqc_tpu.scf.jk import expand_k_tensor_host
    GK_h = expand_k_tensor_host(meta, jkm, [np.asarray(b) for b in blocks])
    np.testing.assert_allclose(GK_h, GK, atol=1e-12)


def test_grad_path_drops_untrusted_expand_k():
    """Differentiable paths (energy_fn via solve_dm) must not trace the
    device expand_k_tensor program when it is untrusted: the axon TPU
    miscompiles it at def2-SVP scale (STATUS.md) and no host oracle can
    arbitrate inside a jitted gradient. On CPU it is trusted by default;
    a failed probe verdict (_expand_k_device_ok=False) must force the
    blocks-path fallback (theta without "eri_k")."""
    import jax
    import dqc_tpu
    from dqc_tpu.scf import qccalc as qmod
    desc = "O 0 0 0.2217; H 0 1.4309 -0.8867; H 0 -1.4309 -0.8867"
    old_limit = qmod.DENSE_ERI_BYTES_LIMIT
    try:
        qmod.DENSE_ERI_BYTES_LIMIT = 0          # dense off -> blocked wins
        qc = dqc_tpu.HF(dqc_tpu.Mol(desc, basis="3-21g"))
        assert qc._expand_k_info is not None, "expand_k mode not active"
        params = qc._all_params()
        # CPU default: trusted -> traced theta includes eri_k
        assert qc._trusted_expand_k()
        _, theta_shapes = jax.eval_shape(qc.solve_dm, params)
        assert "eri_k" in theta_shapes
        # failed probe verdict: untrusted -> eri_k dropped from the trace
        qc._expand_k_device_ok = False
        assert not qc._trusted_expand_k()
        _, theta_shapes = jax.eval_shape(qc.solve_dm, params)
        assert "eri_k" not in theta_shapes
        # probe pass re-enables it
        qc._expand_k_device_ok = True
        _, theta_shapes = jax.eval_shape(qc.solve_dm, params)
        assert "eri_k" in theta_shapes
    finally:
        qmod.DENSE_ERI_BYTES_LIMIT = old_limit


def test_known_bad_device_expansion_host_recovery():
    """With the device expand_k verdict already False (as after a failed
    probe on the axon TPU), _materialize_theta skips the device program
    and host-expands directly — run() still converges to the correct
    energy with the exchange-layout contraction active."""
    import dqc_tpu
    from dqc_tpu.scf import qccalc as qmod
    desc = "O 0 0 0.2217; H 0 1.4309 -0.8867; H 0 -1.4309 -0.8867"
    e_ref = float(dqc_tpu.HF(dqc_tpu.Mol(desc, basis="3-21g")).run().energy())
    old_limit = qmod.DENSE_ERI_BYTES_LIMIT
    try:
        qmod.DENSE_ERI_BYTES_LIMIT = 0          # dense off -> blocked wins
        qc = dqc_tpu.HF(dqc_tpu.Mol(desc, basis="3-21g"))
        assert qc._expand_k_info is not None
        qc._expand_k_device_ok = False          # simulate failed probe
        e = float(qc.run().energy())
        assert "eri_k" in qc._theta, "host-expanded eri_k missing"
    finally:
        qmod.DENSE_ERI_BYTES_LIMIT = old_limit
    assert abs(e - e_ref) < 1e-9, (e, e_ref)


def test_host_loop_blocked_jk_matches_dense():
    """Host-driven DIIS in blocked-JK mode (the def2-SVP-scale execution
    mode after the quartet-block cache landed) reproduces the dense-ERI
    device-loop energy — KS/B3LYP so both J and hybrid K go through the
    blocks, plus the f32 warmup phase."""
    import dqc_tpu
    from dqc_tpu.scf import qccalc as qmod
    desc = "O 0 0 0.2217; H 0 1.4309 -0.8867; H 0 -1.4309 -0.8867"
    mol = dqc_tpu.Mol(desc, basis="3-21g", grid=2)
    e_ref = float(dqc_tpu.KS(mol, xc="b3lyp").run().energy())
    old_limit, old_nao = qmod.DENSE_ERI_BYTES_LIMIT, qmod.SCF_QCCalc.HOST_LOOP_NAO
    try:
        qmod.DENSE_ERI_BYTES_LIMIT = 0          # dense off -> blocked wins
        qmod.SCF_QCCalc.HOST_LOOP_NAO = 1       # force host-driven DIIS
        mol2 = dqc_tpu.Mol(desc, basis="3-21g", grid=2)
        qc = dqc_tpu.KS(mol2, xc="b3lyp").run()
        e_host = float(qc.energy())
        assert any(k.startswith("jkb") for k in qc._theta), "not blocked mode"
        assert "eri_k" in qc._theta, "exchange-layout expansion not active"
    finally:
        qmod.DENSE_ERI_BYTES_LIMIT = old_limit
        qmod.SCF_QCCalc.HOST_LOOP_NAO = old_nao
    assert abs(e_ref - e_host) < 1e-8, (e_ref, e_host)
