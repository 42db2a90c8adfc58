"""Angular quadrature on the unit sphere.

TPU-native design decision: instead of vendoring the 32 Lebedev tables the
reference ships (/root/reference/dqc/datasets/lebedevquad/), we *generate*
spherical product grids (Gauss-Legendre in cos(theta) x equispaced phi) at
any polynomial degree. A product grid of degree L uses ~2x the points of the
Lebedev rule of the same degree but is exactly generatable offline-first and
any-size — a better fit for static-shape batching. The factory maps the
reference's Lebedev precision levels to equivalent-degree product grids.
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


def angular_grid_by_precision(prec: int):
    """Grid exact to spherical-harmonic degree >= prec."""
    return product_angular_grid(int(prec))
