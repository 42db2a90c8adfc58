"""Boys function F_m(T) = \\int_0^1 t^{2m} exp(-T t^2) dt, vectorized in JAX.

This replaces the Boys evaluation buried inside libcint's C drivers in the
reference (/root/reference/dqc/hamilton/intor/molintor.py calls libcint which
computes it internally). TPU-native design notes:
  - two static branches (power series for small T, upward recursion from the
    closed-form F_0 for large T) combined with jnp.where — no data-dependent
    control flow, so it traces to straight-line XLA code.
  - derivatives to arbitrary order via custom_jvp using dF_m/dT = -F_{m+1};
    the rule recursively calls `boys` so higher-order AD works.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.scipy.special import erf

# series F_m(T) = e^{-T} sum_k (2T)^k (2m-1)!! / (2m+2k+1)!!
# all-positive terms; converges for T < T_SWITCH within NTERMS in f64.
T_SWITCH = 27.0
NTERMS = 90


def _boys_series(T, mmax: int):
    """F_m for m = 0..mmax via downward recursion from the series at mmax.

    T must be <= T_SWITCH (caller clamps). Returns (..., mmax+1)."""
    # series at m = mmax
    m = mmax
    # term_k = (2T)^k / prod_{j=1..k} (2m+2j+1), times 1/(2m+1)
    def series_step(k, carry):
        acc, term = carry
        term = term * (2.0 * T) / (2 * m + 2 * k + 1)
        return (acc + term, term)
    term0 = jnp.ones_like(T) / (2 * m + 1)
    acc, _ = jax.lax.fori_loop(1, NTERMS, series_step, (term0, term0))
    expT = jnp.exp(-T)
    f_m = acc * expT
    # downward: F_{m-1} = (2T F_m + e^{-T}) / (2m-1)
    fs = [f_m]
    for mm in range(mmax, 0, -1):
        fs.append((2.0 * T * fs[-1] + expT) / (2 * mm - 1))
    return jnp.stack(fs[::-1], axis=-1)


def _boys_asymptotic(T, mmax: int):
    """F_m for m = 0..mmax via upward recursion from F_0 (large T)."""
    sqT = jnp.sqrt(T)
    expT = jnp.exp(-T)
    f0 = 0.5 * jnp.sqrt(jnp.pi) * erf(sqT) / sqT
    fs = [f0]
    for mm in range(mmax):
        fs.append(((2 * mm + 1) * fs[-1] - expT) / (2.0 * T))
    return jnp.stack(fs, axis=-1)


@partial(jax.custom_jvp, nondiff_argnums=(1,))
def boys(T, mmax: int):
    """Boys functions F_0..F_mmax. T: any shape; returns shape T.shape+(mmax+1,)."""
    T = jnp.asarray(T)
    t_small = jnp.minimum(T, T_SWITCH)
    t_large = jnp.maximum(T, T_SWITCH)
    small = _boys_series(t_small, mmax)
    large = _boys_asymptotic(t_large, mmax)
    return jnp.where((T < T_SWITCH)[..., None], small, large)


@boys.defjvp
def _boys_jvp(mmax, primals, tangents):
    (T,), (T_dot,) = primals, tangents
    f = boys(T, mmax + 1)
    primal_out = f[..., :-1]
    tangent_out = -f[..., 1:] * T_dot[..., None]
    return primal_out, tangent_out
