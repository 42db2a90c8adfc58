"""Quadrature grid tests (parity intent: reference test_grid.py — dvolume
integrates known functions)."""
import numpy as np
import jax.numpy as jnp
import pytest

from dqc_tpu.grid.angular import product_angular_grid
from dqc_tpu.grid.radial import (TreutlerM4Transformation, DE2Transformation,
                                 LogM3Transformation, radial_grid)
from dqc_tpu.grid.factory import get_predefined_grid
from dqc_tpu.xc.integrate import setup_grid_theta
from dqc_tpu.ops.shellstruct import pack_basis
from dqc_tpu.utils.datastruct import AtomCGTOBasis, CGTOBasis


def test_angular_orthonormality():
    """Product grid integrates spherical harmonics exactly to its degree."""
    pts, w = product_angular_grid(17)
    assert abs(w.sum() - 4 * np.pi) < 1e-12
    # low-order moments: int x^2 dOmega = 4pi/3, int x^4 = 4pi/5
    assert abs((w * pts[:, 0] ** 2).sum() - 4 * np.pi / 3) < 1e-12
    assert abs((w * pts[:, 2] ** 4).sum() - 4 * np.pi / 5) < 1e-12
    assert abs((w * pts[:, 0] * pts[:, 1]).sum()) < 1e-12


@pytest.mark.parametrize("transform", [
    TreutlerM4Transformation(xi=1.0), DE2Transformation(),
    LogM3Transformation()])
def test_radial_gaussian_integral(transform):
    """int_0^inf r^2 exp(-a r^2) dr = sqrt(pi)/(4 a^{3/2})."""
    r, w = radial_grid(99, transform)
    for a in (0.5, 2.0, 10.0):
        val = float((w * np.exp(-a * r ** 2)).sum())
        exact = np.sqrt(np.pi) / (4 * a ** 1.5)
        assert abs(val - exact) / exact < 1e-10, a


def test_chebyshev_pjsf_quadrature():
    """The Perez-Jorda & San-Fabian transformed Gauss-Chebyshev rule
    (reference radial_grid.py:87-98, doi:10.1063/1.475719 eq 9-10):
    exact-to-rounding on smooth (-1,1) integrands and usable as the
    radial integrator."""
    from dqc_tpu.grid.radial import chebyshev_quadrature
    x, w = chebyshev_quadrature(60)
    assert abs(w.sum() - 2.0) < 1e-12                      # int 1 dx
    assert abs((w * x).sum()) < 1e-13                      # odd
    assert abs((w * x ** 2).sum() - 2.0 / 3.0) < 1e-12
    assert abs((w * np.exp(x)).sum() - (np.e - 1.0 / np.e)) < 1e-10
    # radial map: same gaussian-moment check as the other quadratures
    r, wr = radial_grid(99, TreutlerM4Transformation(xi=1.0),
                        quadrature="chebyshev")
    for a in (0.5, 2.0, 10.0):
        val = float((wr * np.exp(-a * r ** 2)).sum())
        exact = np.sqrt(np.pi) / (4 * a ** 1.5)
        assert abs(val - exact) / exact < 1e-9, a


def test_molecular_grid_integrates_density():
    """Becke-stitched grid integrates normalized AO densities to 1."""
    bas = [CGTOBasis(0, np.array([1.2, 0.3]), np.array([0.7, 0.5]))]
    ab = [AtomCGTOBasis(1, bas, [0.0, 0.0, 0.0]),
          AtomCGTOBasis(1, bas, [1.5, 0.4, -0.2])]
    meta, params = pack_basis(ab)
    grid = get_predefined_grid(3, [1, 1], np.asarray(params["atompos"]),
                               prune=False)
    gt = setup_grid_theta(meta, params, grid, family=1)
    # <phi_i | phi_j> via quadrature vs analytic overlap
    S_quad = jnp.einsum("gi,g,gj->ij", gt["ao"], gt["dvol"], gt["ao"])
    from dqc_tpu.ops.integrals import overlap
    S = overlap(meta, params)
    np.testing.assert_allclose(np.asarray(S_quad), np.asarray(S), atol=1e-6)
