"""Boys function vs scipy oracle + derivative identity."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.special import gamma, gammainc

from dqc_tpu.ops.boys import boys


def boys_ref(T, m):
    return gamma(m + 0.5) * gammainc(m + 0.5, T) / (2 * T ** (m + 0.5))


def test_boys_accuracy():
    T = np.logspace(-8, 3.0, 120)
    mmax = 20
    f = np.asarray(boys(T, mmax))
    for m in range(mmax + 1):
        r = boys_ref(T, m)
        # relative where representable, absolute below 1e-30
        err = np.abs(f[:, m] - r) / np.maximum(np.abs(r), 1e-30)
        mask = r > 1e-30
        assert err[mask].max() < 1e-11


def test_boys_at_zero():
    f = np.asarray(boys(np.array(0.0), 12))
    np.testing.assert_allclose(f, 1.0 / (2 * np.arange(13) + 1), rtol=1e-14)


def test_boys_grad_identity():
    # dF_m/dT = -F_{m+1}
    t = jnp.asarray(3.7)
    g = jax.jacfwd(lambda x: boys(x, 3))(t)
    expect = -np.asarray(boys(t, 4))[1:]
    np.testing.assert_allclose(np.asarray(g), expect, rtol=1e-12)


def test_boys_higher_order_ad():
    from jax.test_util import check_grads
    check_grads(lambda x: boys(x, 4), (jnp.asarray(2.3),), order=2,
                modes=["fwd", "rev"])
