"""Ozaki-scheme f64 GEMM (ops/ozaki.py) + its grid-density integration.

Real-TPU validation: integrity.maybe_build_ozaki's run()-time probe +
tools/ozaki_lab.py timings. Here: slice/recombine exactness bounds on
CPU and the density_from_tables "ozk" branch against the einsum path.
"""
import numpy as np
import jax
import jax.numpy as jnp

from dqc_tpu.ops import ozaki


def test_matmul_sliced_accuracy():
    rng = np.random.default_rng(0)
    M, K, N = 600, 114, 114
    A = rng.standard_normal((M, K)) * np.exp(rng.uniform(-6, 2, (M, K)))
    B = rng.standard_normal((K, N))
    w, S, U, kc = ozaki.params_for_k(K)
    a_sl, e = ozaki.row_slices(jnp.asarray(A), w, S)
    b_sl, f = ozaki.col_slices(jnp.asarray(B), w, S)
    C = ozaki.matmul_sliced(a_sl, e, b_sl, f, w, U, kc=kc)
    C_ref = A @ B
    scale = (np.abs(A).max(axis=1)[:, None]
             * np.abs(B).max(axis=0)[None, :] * K)
    rel = np.abs(np.asarray(C) - C_ref) / np.maximum(scale, 1e-300)
    assert rel.max() < 1e-11, rel.max()


def test_matmul_sliced_chunked():
    rng = np.random.default_rng(1)
    M, K, N = 40, 2048, 30
    A = rng.standard_normal((M, K))
    B = rng.standard_normal((K, N))
    w, S, U, kc = 7, 6, 7, 512
    a_sl, e = ozaki.row_slices(jnp.asarray(A), w, S)
    b_sl, f = ozaki.col_slices(jnp.asarray(B), w, S)
    C = ozaki.matmul_sliced(a_sl, e, b_sl, f, w, U, kc=kc)
    C_ref = A @ B
    scale = (np.abs(A).max(axis=1)[:, None]
             * np.abs(B).max(axis=0)[None, :] * K)
    rel = np.abs(np.asarray(C) - C_ref) / np.maximum(scale, 1e-300)
    assert rel.max() < 1e-11, rel.max()


def test_density_tables_ozk_branch():
    """density_from_tables with injected "ozk" slices == einsum path."""
    from dqc_tpu.xc.integrate import density_from_tables
    rng = np.random.default_rng(2)
    ng, nao = 500, 20
    ao = rng.standard_normal((ng, nao)) * np.exp(
        rng.uniform(-6, 0, (ng, nao)))
    ag = rng.standard_normal((3, ng, nao))
    dm = rng.standard_normal((nao, nao))
    dm = dm + dm.T
    tabs = {"ao": jnp.asarray(ao), "ao_grad": jnp.asarray(ag)}
    ref = density_from_tables(tabs, jnp.asarray(dm), 2, False)
    w, S, U, _ = ozaki.params_for_k(nao)
    ozk = {"ao": ozaki.row_slices(tabs["ao"], w, S)}
    for d in range(3):
        ozk[f"ag{d}"] = ozaki.row_slices(tabs["ao_grad"][d], w, S)
    tabs2 = dict(tabs)
    tabs2["ozk"] = ozk
    got = density_from_tables(tabs2, jnp.asarray(dm), 2, False)
    np.testing.assert_allclose(np.asarray(got["rho"]),
                               np.asarray(ref["rho"]), atol=1e-10)
    np.testing.assert_allclose(np.asarray(got["grad"]),
                               np.asarray(ref["grad"]), atol=1e-10)
