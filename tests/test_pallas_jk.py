"""Fused double-single Pallas J/K kernel (ops/pallas_jk.py).

The real-TPU validation is integrity.maybe_build_ds's run()-time probe
(kernel vs f64 einsum on the device) + tools/pallas_jk_lab.py; here the
kernel LOGIC runs in Pallas interpret mode on CPU against the f64
einsum oracle, and the plane split is checked for exactness.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dqc_tpu.ops import pallas_jk


def _eri_like(n, seed=0):
    rng = np.random.default_rng(seed)
    t = rng.standard_normal((n, n, n, n)) * np.exp(
        rng.uniform(-8, 1, (n, n, n, n)))
    # physical (ij|kl) symmetries so the J/K contraction identities hold
    t = t + t.transpose(1, 0, 2, 3)
    t = t + t.transpose(0, 1, 3, 2)
    t = t + t.transpose(2, 3, 0, 1)
    return t


def test_plane_split_exact():
    t = _eri_like(6)
    hi, lo = jax.jit(pallas_jk.ds_planes)(jnp.asarray(t))
    n = 6
    back = np.asarray(hi, dtype=np.float64) + np.asarray(lo,
                                                         dtype=np.float64)
    assert back.shape[2] % 8 == 0 and back.shape[3] % 128 == 0
    # hi + lo reconstructs t to double-single accuracy (2^-48 relative:
    # lo itself is the f32 rounding of t - hi)
    scale = np.abs(t).max()
    assert np.abs(back[:, :n, :n, :n] - t).max() < 2.0 ** -46 * scale
    # padding is exactly zero (dead-lane rule: valid inputs everywhere)
    assert np.all(back[:, n:] == 0) and np.all(back[:, :, n:] == 0) \
        and np.all(back[:, :, :, n:] == 0)


def test_reference_matches_einsum():
    n = 6
    t = _eri_like(n)
    rng = np.random.default_rng(1)
    dm = rng.standard_normal((n, n))
    dm = dm + dm.T
    hi, lo = pallas_jk.ds_planes(jnp.asarray(t))
    j, k = pallas_jk.ds_jk_reference(hi, lo, jnp.asarray(dm))
    j_ref = np.einsum("ijkl,kl->ij", t, dm)
    k_ref = np.einsum("ikjl,kl->ij", t, dm)
    np.testing.assert_allclose(np.asarray(j), j_ref, atol=1e-12)
    np.testing.assert_allclose(np.asarray(k), k_ref, atol=1e-12)


@pytest.mark.parametrize("n", [10, 18])
def test_kernel_interpret_mode(n):
    t = _eri_like(n, seed=2)
    rng = np.random.default_rng(3)
    dm = rng.standard_normal((n, n))
    dm = dm + dm.T
    hi, lo = pallas_jk.ds_planes(jnp.asarray(t))
    j, k = pallas_jk.ds_jk(hi, lo, jnp.asarray(dm), interpret=True)
    j_ref = np.einsum("ijkl,kl->ij", t, dm)
    k_ref = np.einsum("ikjl,kl->ij", t, dm)
    scale = max(np.abs(j_ref).max(), np.abs(k_ref).max())
    # NOTE: the Pallas INTERPRETER evaluates the f32 chain with excess
    # precision (f64) and rounds once at the output store — the Dekker
    # TwoProd error terms vanish and the result carries ~one f32
    # rounding (2^-24 relative). This bounds what interpret mode can
    # verify: kernel plumbing (block maps, broadcasts, reductions,
    # outputs), not the double-single arithmetic. The REAL accuracy is
    # measured on the live chip: rel ~1e-14 at nao=114
    # (tools/pallas_jk_lab.py) and probed at every run() against the
    # f64 einsum (scf/integrity.maybe_build_ds, rel gate 1e-10).
    assert np.abs(np.asarray(j) - j_ref).max() / scale < 1e-5
    assert np.abs(np.asarray(k) - k_ref).max() / scale < 1e-5


def test_kplanes_wrapper_identity():
    """ds_jk_kplanes on exchange-layout planes reproduces the engine's
    J/K einsum contractions of eri_k (the production wiring)."""
    n = 8
    e_j = _eri_like(n, seed=5)          # J-layout (ij|kl)
    eri_k = e_j.transpose(0, 2, 1, 3)   # exchange layout (qccalc)
    rng = np.random.default_rng(6)
    dm = rng.standard_normal((n, n))
    dm = dm + dm.T
    hi, lo = pallas_jk.ds_planes(jnp.asarray(eri_k))
    # reference path (pure jnp) with outputs swapped as in the wrapper
    k, j = pallas_jk.ds_jk_reference(hi, lo, jnp.asarray(dm))
    j_ref = np.einsum("ikjl,kl->ij", eri_k, dm)   # engine J of eri_k
    k_ref = np.einsum("ijkl,kl->ij", eri_k, dm)   # engine K of eri_k
    np.testing.assert_allclose(np.asarray(j), j_ref, atol=1e-11)
    np.testing.assert_allclose(np.asarray(k), k_ref, atol=1e-11)
    # and J/K equal the J-layout contractions of the original tensor
    np.testing.assert_allclose(j_ref,
                               np.einsum("ijkl,kl->ij", e_j, dm),
                               atol=1e-11)
    np.testing.assert_allclose(k_ref,
                               np.einsum("ikjl,kl->ij", e_j, dm),
                               atol=1e-11)
