"""Direct unit tests of the derived-ERI integrity state machine
(scf/integrity.py — probe/arbitrate/evict, factored out of the qccalc
driver per VERDICT r3 item 10).

The machinery guards against backend miscompiles of the big fused f64
expansion programs (the distilled axon-TPU add+transpose bug,
tools/expand_k_repro.py). Here the "miscompile" is injected by hand so
every arm of the state machine runs deterministically on CPU:
  - clean device expansion -> verdict True, eri_k kept (abs oracle on/off)
  - corrupted eri_k -> verdict False, host-expanded tensor substituted
    (it matches the oracle, so it is kept)
  - maybe_expand_j: trusted eri_k -> eri_j derived + blocks evicted to
    host; corrupted eri_k -> blocks path kept; bytes_limit=0 -> no-op.
"""
import os

import numpy as np
import pytest
import jax.numpy as jnp

import dqc_tpu
from dqc_tpu.scf import integrity
from dqc_tpu.scf import qccalc as qmod


@pytest.fixture(scope="module")
def blocked_setup():
    """A small molecule forced onto the blocked-quartet path, with its
    materialized theta blocks."""
    saved = qmod.DENSE_ERI_BYTES_LIMIT
    qmod.DENSE_ERI_BYTES_LIMIT = 0      # force 'stream' -> 'blocked'
    try:
        mol = dqc_tpu.Mol(
            "O 0 0 0.2217; H 0 1.4309 -0.8867; H 0 -1.4309 -0.8867",
            basis="sto-3g", grid=1)
        qc = dqc_tpu.HF(mol)
        assert qc._expand_k_info is not None
        params = qc._all_params(with_fields=False)
        theta = qc._build_theta(params)
        assert "jkb0" in theta
    finally:
        qmod.DENSE_ERI_BYTES_LIMIT = saved
    return mol, qc._expand_k_info, theta


def _fresh_theta(blocked_setup):
    _, info, theta = blocked_setup
    return dict(theta), info


def test_probe_clean_expansion_trusted(blocked_setup):
    mol, (bmeta, jkm), _ = blocked_setup
    theta, _ = _fresh_theta(blocked_setup)
    fns = {}
    integrity.expand_k_into(theta, bmeta, jkm, fns)
    assert "eri_k" in theta
    # relative probe only (paths agree; oracle not forced)
    assert integrity.probe_expand_k(theta, bmeta, jkm, mol.meta.nao,
                                    force_abs=False) is True
    assert "eri_k" in theta
    # absolute oracle pass
    assert integrity.probe_expand_k(theta, bmeta, jkm, mol.meta.nao,
                                    force_abs=True) is True
    assert "eri_k" in theta


def test_probe_corrupted_expansion_substituted(blocked_setup):
    """An injected 'miscompile' (scaled tensor) must be caught by the
    relative probe, arbitrated by the host oracle, and replaced by the
    host-expanded tensor (which passes)."""
    mol, (bmeta, jkm), _ = blocked_setup
    theta, _ = _fresh_theta(blocked_setup)
    fns = {}
    integrity.expand_k_into(theta, bmeta, jkm, fns)
    good = np.asarray(theta["eri_k"])
    theta["eri_k"] = jnp.asarray(good * 1.5)       # corrupt
    with pytest.warns(UserWarning, match="failed the host oracle"):
        verdict = integrity.probe_expand_k(theta, bmeta, jkm,
                                           mol.meta.nao, force_abs=False)
    assert verdict is False
    # the substituted host tensor equals the clean expansion
    np.testing.assert_allclose(np.asarray(theta["eri_k"]), good,
                               rtol=0, atol=1e-12)


def test_probe_unaffordable_oracle_falls_back(blocked_setup):
    """When the nao^4 tensor is too large for the host oracle, a failed
    relative probe must DROP eri_k (blocks path serves) rather than
    trusting either device path."""
    mol, (bmeta, jkm), _ = blocked_setup
    theta, _ = _fresh_theta(blocked_setup)
    fns = {}
    integrity.expand_k_into(theta, bmeta, jkm, fns)
    theta["eri_k"] = theta["eri_k"] * 2.0
    with pytest.warns(UserWarning, match="falling back to the blocks"):
        verdict = integrity.probe_expand_k(
            theta, bmeta, jkm, mol.meta.nao, force_abs=False,
            host_limit_bytes=0)
    assert verdict is False and "eri_k" not in theta


def test_expand_j_trusted_evicts_blocks(blocked_setup):
    mol, (bmeta, jkm), _ = blocked_setup
    theta, _ = _fresh_theta(blocked_setup)
    fns = {}
    integrity.expand_k_into(theta, bmeta, jkm, fns)
    n_blocks = sum(1 for k in theta if k.startswith("jkb"))
    theta2, jkb_host = integrity.maybe_expand_j(
        theta, bmeta, jkm, mol.meta.nao,
        bytes_limit=10 * 1024 ** 3, fn_cache=fns)
    assert "eri_j" in theta2
    assert jkb_host is not None and len(jkb_host) == n_blocks
    assert not any(k.startswith("jkb") for k in theta2)
    # the derived Coulomb layout is the (0,2,1,3) transpose of eri_k
    np.testing.assert_allclose(
        np.asarray(theta2["eri_j"]),
        np.asarray(theta["eri_k"]).transpose(0, 2, 1, 3), atol=0)


def test_expand_j_corrupt_keeps_blocks(blocked_setup):
    mol, (bmeta, jkm), _ = blocked_setup
    theta, _ = _fresh_theta(blocked_setup)
    fns = {}
    integrity.expand_k_into(theta, bmeta, jkm, fns)
    theta["eri_k"] = theta["eri_k"] * 3.0
    with pytest.warns(UserWarning, match="keeping the blocks path"):
        theta2, jkb_host = integrity.maybe_expand_j(
            theta, bmeta, jkm, mol.meta.nao,
            bytes_limit=10 * 1024 ** 3, fn_cache=fns)
    assert "eri_j" not in theta2 and jkb_host is None
    assert "jkb0" in theta2


def test_expand_j_bytes_limit_noop(blocked_setup):
    mol, (bmeta, jkm), _ = blocked_setup
    theta, _ = _fresh_theta(blocked_setup)
    fns = {}
    integrity.expand_k_into(theta, bmeta, jkm, fns)
    theta2, jkb_host = integrity.maybe_expand_j(
        theta, bmeta, jkm, mol.meta.nao, bytes_limit=0, fn_cache=fns)
    assert "eri_j" not in theta2 and jkb_host is None
