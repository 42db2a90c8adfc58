"""Boys function F_m(T) = \\int_0^1 t^{2m} exp(-T t^2) dt, vectorized in JAX.

This replaces the Boys evaluation buried inside libcint's C drivers in the
reference (/root/reference/dqc/hamilton/intor/molintor.py calls libcint which
computes it internally). TPU-native design notes (measured on v5e, where
f64 elementwise/transcendental ops are emulated at ~1-2 Gop/s and dominate
the streaming J/K build):
  - tabulated branch for T <= 700: Taylor expansion around sqrt-spaced grid
    points T_i = (i h)^2,
        F_m(T) = sum_k F_{m+k}(T_i) (T_i - T)^k / k!
    One small-table row gather + NTAYLOR fused multiply-adds, *no erf and
    no exp*. The Taylor terms are bounded by F_m (T_i - T)^k ((2m+1)/2T)^k
    -ish, and sqrt spacing keeps |T_i - T| (2m+1)/(2T) small uniformly:
    relative error ~1e-13 for m <= 12 at h = 0.04 (h = 0.02 for higher m).
  - pure-power branch for T > 700: exp(-700) < 1e-304 underflows f64, so
    F_0 = sqrt(pi/T)/2 and F_{m+1} = (2m+1)/(2T) F_m are *exact* — a
    rsqrt and m multiplies, no transcendentals at all.
  - no data-dependent control flow: both branches trace to straight-line
    XLA code combined with jnp.where.
  - derivatives to arbitrary order via custom_jvp using dF_m/dT = -F_{m+1};
    the rule recursively calls `boys` so higher-order AD works.
"""
from __future__ import annotations

from functools import partial
from math import factorial

import numpy as np
import jax
import jax.numpy as jnp

T_MAX_TABLE = 700.0   # exp(-T) underflows f64 beyond this: power branch exact
NTAYLOR = 8

_TABLES: dict = {}


def _grid_h(mmax: int) -> float:
    # Taylor term ratio ~ |dT| (2m+1)/(2T) with |dT| <= h sqrt(T): halve the
    # spacing for high m so the mmax=20 stress tests stay at ~1e-12.
    return 0.04 if mmax <= 12 else 0.02


def _reference_boys_numpy(T: np.ndarray, mmax: int) -> np.ndarray:
    """Accurate f64 Boys values on the host (table construction only) via
    the regularized lower incomplete gamma: F_m(T) = g(m+1/2) P(m+1/2, T)
    / (2 T^(m+1/2)); same oracle the unit tests use."""
    from scipy.special import gamma, gammainc
    T = np.asarray(T, dtype=np.float64)
    out = np.empty(T.shape + (mmax + 1,))
    Tsafe = np.where(T > 0, T, 1.0)
    for m in range(mmax + 1):
        fm = gamma(m + 0.5) * gammainc(m + 0.5, Tsafe) \
            / (2.0 * Tsafe ** (m + 0.5))
        out[..., m] = np.where(T > 0, fm, 1.0 / (2 * m + 1))
    return out


def _get_table(mmax: int) -> np.ndarray:
    """(ngrid, mmax + NTAYLOR) table of F_m(T_i), T_i = (i h)^2."""
    tab = _TABLES.get(mmax)
    if tab is None:
        h = _grid_h(mmax)
        n = int(np.ceil(np.sqrt(T_MAX_TABLE) / h)) + 1
        ts = (np.arange(n) * h) ** 2
        tab = _reference_boys_numpy(ts, mmax + NTAYLOR - 1)
        _TABLES[mmax] = tab
    return tab


@partial(jax.custom_jvp, nondiff_argnums=(1,))
def boys_list(T, mmax: int):
    """Boys functions as a list [F_0, ..., F_mmax], each of T's shape.

    This is the layout-friendly core: the gathered table rows live on the
    *leading* axis ((mmax+NTAYLOR,) + T.shape) so every per-m Horner step
    is a contiguous elementwise op. On TPU, arrays with a small minor
    dimension (e.g. (N, 8)) hit pathological vreg layouts: the
    (N,8)-einsum Taylor ran at ~0.6 Gflop/s while the same math as Horner
    over leading-axis rows is ~50x faster (measured)."""
    T = jnp.asarray(T)
    tabT = jnp.asarray(_get_table(mmax).T.copy(), dtype=T.dtype)
    h = _grid_h(mmax)
    ngrid = tabT.shape[1]

    # table branch: sqrt-spaced nearest node + Taylor in (T - T_i)
    sqT = jnp.sqrt(T)
    idx = jnp.clip(jnp.round(sqT * (1.0 / h)).astype(jnp.int32), 0, ngrid - 1)
    ti = idx.astype(T.dtype) * h
    dT = ti * ti - T                   # Taylor variable (T_i - T)
    rows = jnp.take(tabT, idx, axis=1)  # (mmax+NTAYLOR,) + T.shape

    # power branch (T > 700): exp(-T) == 0 in f64, closed form is exact
    t_large = jnp.maximum(T, T_MAX_TABLE)
    inv2T = 0.5 / t_large
    f_large = jnp.sqrt(jnp.pi * inv2T * 0.5)

    is_small = T < T_MAX_TABLE
    out = []
    for m in range(mmax + 1):
        acc = rows[m + NTAYLOR - 1] * (1.0 / factorial(NTAYLOR - 1))
        for k in range(NTAYLOR - 2, -1, -1):
            acc = acc * dT + rows[m + k] * (1.0 / factorial(k))
        out.append(jnp.where(is_small, acc, f_large))
        if m < mmax:
            f_large = (2 * m + 1) * inv2T * f_large
    return out


@boys_list.defjvp
def _boys_list_jvp(mmax, primals, tangents):
    # dF_m/dT = -F_{m+1}, recursively through boys_list so higher-order AD
    # stays exact (AD through the truncated Taylor would lose one order of
    # accuracy per derivative).
    (T,), (T_dot,) = primals, tangents
    f = boys_list(T, mmax + 1)
    return list(f[:-1]), [-f[m + 1] * T_dot for m in range(mmax + 1)]


def boys(T, mmax: int):
    """Boys functions F_0..F_mmax. T: any shape; returns shape T.shape+(mmax+1,)."""
    return jnp.stack(boys_list(T, mmax), axis=-1)
