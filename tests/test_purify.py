"""Canonical purification (scf/purify.py) vs the eigh route.

The device-batched SCF phases swap the per-iteration eigensolver for
Palser-Manolopoulos purification on TPU (emulated f64 eigh is ~0.3 s/call
at nao~114; purification is ~40 MXU matmuls). These tests pin exact
equality of the resulting density matrix against engine
orthogonal_fock_to_dm on CPU LAPACK."""
import numpy as np
import jax.numpy as jnp

from dqc_tpu.scf.engine import orthogonal_fock_to_dm
from dqc_tpu.scf.orth import orthogonalizer
from dqc_tpu.scf.purify import fock_to_dm_purify


def _rand_spd_overlap(n, rng, cond=30.0):
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    w = np.geomspace(1.0 / cond, 1.0, n)
    return (q * w) @ q.T


def _occ(n, nocc, f):
    occ = np.zeros(n)
    occ[:nocc] = f
    return jnp.asarray(occ)


def test_purify_matches_eigh_restricted():
    rng = np.random.default_rng(0)
    n, nocc = 24, 7
    s = _rand_spd_overlap(n, rng)
    X, keep = orthogonalizer(jnp.asarray(s))
    fock = rng.standard_normal((n, n))
    fock = jnp.asarray(0.5 * (fock + fock.T))
    occ = _occ(n, nocc, 2.0)
    dm_e, _, _ = orthogonal_fock_to_dm(fock, X, keep, occ)
    dm_p = fock_to_dm_purify(fock, X, keep, occ)
    np.testing.assert_allclose(np.asarray(dm_p), np.asarray(dm_e),
                               atol=1e-10)
    # electron count through the metric
    ne = float(jnp.einsum("ij,ji->", dm_p, jnp.asarray(s)))
    assert abs(ne - 2.0 * nocc) < 1e-10


def test_purify_matches_eigh_polarized_batch():
    rng = np.random.default_rng(1)
    n = 18
    s = _rand_spd_overlap(n, rng)
    X, keep = orthogonalizer(jnp.asarray(s))
    f = rng.standard_normal((2, n, n))
    fock = jnp.asarray(0.5 * (f + np.swapaxes(f, -1, -2)))
    occ = jnp.stack([_occ(n, 5, 1.0), _occ(n, 4, 1.0)])
    dm_e, _, _ = orthogonal_fock_to_dm(fock, X, keep, occ)
    dm_p = fock_to_dm_purify(fock, X, keep, occ)
    np.testing.assert_allclose(np.asarray(dm_p), np.asarray(dm_e),
                               atol=1e-10)


def test_purify_overcomplete_masked():
    """Near-singular overlap: dropped orthogonalizer columns must stay
    unoccupied under the adaptive pin."""
    rng = np.random.default_rng(2)
    n, nocc = 16, 4
    s = _rand_spd_overlap(n, rng, cond=5.0)
    # make two directions numerically dependent
    v = rng.standard_normal((n, 2))
    s = s + 1e3 * (v @ v.T)          # huge spread -> relative cutoff drops
    s = s / np.abs(s).max()
    X, keep = orthogonalizer(jnp.asarray(s), threshold=1e-3)
    assert int(np.sum(~np.asarray(keep))) >= 1
    fock = rng.standard_normal((n, n))
    fock = jnp.asarray(0.5 * (fock + fock.T))
    occ = _occ(n, nocc, 2.0)
    dm_e, _, _ = orthogonal_fock_to_dm(fock, X, keep, occ)
    dm_p = fock_to_dm_purify(fock, X, keep, occ)
    np.testing.assert_allclose(np.asarray(dm_p), np.asarray(dm_e),
                               atol=1e-9)


def test_purify_zero_occupation_spin():
    """A spin channel with zero electrons (e.g. H atom down-spin) must
    return an exactly zero density matrix, not NaNs."""
    rng = np.random.default_rng(3)
    n = 10
    s = _rand_spd_overlap(n, rng)
    X, keep = orthogonalizer(jnp.asarray(s))
    f = rng.standard_normal((2, n, n))
    fock = jnp.asarray(0.5 * (f + np.swapaxes(f, -1, -2)))
    occ = jnp.stack([_occ(n, 1, 1.0), _occ(n, 0, 1.0)])
    dm_p = fock_to_dm_purify(fock, X, keep, occ)
    assert np.all(np.isfinite(np.asarray(dm_p)))
    assert np.abs(np.asarray(dm_p)[1]).max() < 1e-12
