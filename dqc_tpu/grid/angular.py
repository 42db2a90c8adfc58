"""Angular quadrature on the unit sphere.

Two rule families:
  - Lebedev-Laikov tables (grid/lebedev.py; the same standard published
    data the reference vendors) — ~(L+1)^2/3 points at degree L, the
    default (fewer points = direct XC-stage savings);
  - generated product grids (Gauss-Legendre in cos(theta) x equispaced
    phi) — ~(L+1)^2/2 points but available at ANY degree; the fallback
    beyond degree 131 and the DQC_TPU_ANGULAR=product escape hatch.
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np


@lru_cache(maxsize=None)
def product_angular_grid(degree: int):
    """Quadrature exact for spherical harmonics up to `degree`.

    Returns (points (n,3) unit vectors, weights (n,) summing to 4 pi)."""
    ntheta = degree // 2 + 1
    nphi = degree + 1
    ct, wt = np.polynomial.legendre.leggauss(ntheta)   # cos(theta) nodes
    phi = 2.0 * np.pi * np.arange(nphi) / nphi
    wphi = 2.0 * np.pi / nphi
    st = np.sqrt(1.0 - ct ** 2)
    x = (st[:, None] * np.cos(phi)[None, :]).ravel()
    y = (st[:, None] * np.sin(phi)[None, :]).ravel()
    z = np.broadcast_to(ct[:, None], (ntheta, nphi)).ravel()
    w = np.broadcast_to((wt * wphi)[:, None], (ntheta, nphi)).ravel()
    pts = np.stack([x, y, z], axis=1)
    return pts, w.copy()


# number of Lebedev points per precision (the reference's tables,
# lebedev_%03d) -> we provide the same *degree* with a product grid.
LEBEDEV_PRECISIONS = [3, 5, 7, 9, 11, 13, 15, 17, 19, 21, 23, 25, 27, 29, 31,
                      35, 41, 47, 53, 59, 65, 71, 77, 83, 89, 95, 101, 107,
                      113, 119, 125, 131]


def angular_rule_tag() -> str:
    """Identifier of the active angular rule family (cache-signature
    component: switching rules changes every grid table)."""
    import os
    return ("prod" if os.environ.get("DQC_TPU_ANGULAR", "").lower()
            == "product" else "leb")


def angular_rule(degree: int):
    """Quadrature exact for spherical harmonics up to `degree`:
    the vendored Lebedev rule (~(L+1)^2/3 points) by default, the
    generated product rule (~(L+1)^2/2 points, any degree) for degrees
    beyond the tables or when DQC_TPU_ANGULAR=product.

    Returns (points (n, 3) unit vectors, weights (n,) summing to 4 pi)."""
    if angular_rule_tag() == "leb" and degree <= 131:
        from .lebedev import lebedev_by_degree
        return lebedev_by_degree(int(degree))
    return product_angular_grid(int(degree))


def angular_grid_by_precision(prec: int):
    """Grid exact to spherical-harmonic degree >= prec."""
    return angular_rule(int(prec))
