"""NaN-safe / differentiable helper ops.

Parity surface with the reference (/root/reference/dqc/utils/safeops.py):
occnumber (differentiable fractional occupations), safepow, safenorm,
safe_cdist.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

EPS = 1e-15


def occnumber(a, n: int, dtype=jnp.float64):
    """Occupation vector of length n summing to `a` (possibly traced,
    possibly fractional): floor(a) ones then the fractional remainder.

    The integer split uses the *static* value when `a` is concrete; for
    traced fractional occupations the caller supplies n >= ceil(a) and the
    gradient flows through the fractional element (parity: reference
    safeops.py:21-77)."""
    import numpy as np
    a_arr = jnp.asarray(a, dtype=dtype)
    # static floor from best-known concrete value
    try:
        aval = float(a)
        nint = int(math.floor(aval + 1e-12))
    except TypeError:
        raise ValueError(
            "occnumber requires a concrete total for the integer split; "
            "pass the fractional part separately for traced occupations")
    if nint > n:
        raise ValueError(f"Cannot fit {a} electrons in {n} orbitals")
    base = jnp.concatenate([jnp.ones(nint, dtype=dtype),
                            jnp.zeros(n - nint, dtype=dtype)])
    if nint < n:
        frac = a_arr - nint
        base = base.at[nint].set(frac)
    else:
        # a exactly fills all n orbitals: distribute any traced difference
        base = base + (a_arr - nint) / max(n, 1)
    return base


def safepow(x, p, eps: float = EPS):
    """x**p safe for x ~ 0 with fractional p (gradient-stable)."""
    return jnp.maximum(x, eps) ** p


def safenorm(x, axis=-1, eps: float = EPS):
    """L2 norm with nonzero gradient at 0."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis) + eps * eps)


def safe_cdist(a, b, add_diag_eps: bool = False):
    """Pairwise distances |a_i - b_j| with NaN-safe gradient; optionally
    regularize the diagonal (for self-distance exclusion)."""
    d = a[..., :, None, :] - b[..., None, :, :]
    d2 = jnp.sum(d * d, axis=-1)
    if add_diag_eps:
        n = d2.shape[-1]
        d2 = d2 + jnp.eye(n, dtype=d2.dtype)
    return jnp.sqrt(jnp.maximum(d2, EPS * EPS))


def rho_eps(x):
    """Density floor, dtype-aware: the f64 value (1e-28) squares/cubes to
    zero in f32, turning guard divisions into inf and vxc grads into NaN."""
    import jax.numpy as jnp
    # f32 floor must keep *squared* guard denominators (e.g.
    # (4 kf^2 rho^2)^2 ~ rho^{16/3} in the PBE backward) above the f32
    # min-normal 1.2e-38: 1e-7 aligns with the f32 density screen.
    return 1e-28 if x.dtype == jnp.float64 else 1e-7


def sig_eps(x):
    """|grad rho|^2 floor, dtype-aware (see rho_eps)."""
    import jax.numpy as jnp
    return 1e-40 if x.dtype == jnp.float64 else 1e-14
