"""User-defined (e.g. neural-network) XC functionals.

Parity with the reference's CustomXC hook (/root/reference/dqc/xc/
custom_xc.py) — the xcnn entry point. TPU-native: the functional is a pure
function `fn(params, densinfo_dict) -> e(r)`; its parameter pytree travels in
theta['xc_params'][key], so jax.grad differentiates the SCF solution w.r.t.
NN weights through the implicit fixed point (training configs 4-5 of
BASELINE.json).

densinfo_dict keys: 'rho' (or 'rho_u'/'rho_d'), and per family:
'sigma' ('sigma_uu'/'sigma_ud'/'sigma_dd'), 'lapl', 'tau' (spin variants).
"""
from __future__ import annotations

from typing import Callable

from .base import BaseXC


class CustomXC(BaseXC):
    def __init__(self, fn: Callable, params, family: int = 1,
                 key: str = "custom", exx_fraction: float = 0.0):
        self.fn = fn
        self.init_params = params
        self.family = family
        self.key = key
        self.exx_fraction = exx_fraction

    # the integrate layer calls apply_* with the xc_params dict
    def apply_unpol(self, xcparams, rho, sigma=None, lapl=None, tau=None):
        p = xcparams[self.key] if xcparams and self.key in xcparams \
            else self.init_params
        d = {"rho": rho}
        if self.family >= 2:
            d["sigma"] = sigma
        if self.family >= 4:
            d["lapl"] = lapl
            d["tau"] = tau
        return self.fn(p, d)

    def apply_pol(self, xcparams, rho_u, rho_d, sigma_uu=None, sigma_ud=None,
                  sigma_dd=None, lapl_u=None, lapl_d=None, tau_u=None,
                  tau_d=None):
        p = xcparams[self.key] if xcparams and self.key in xcparams \
            else self.init_params
        d = {"rho_u": rho_u, "rho_d": rho_d}
        if self.family >= 2:
            d.update(sigma_uu=sigma_uu, sigma_ud=sigma_ud, sigma_dd=sigma_dd)
        if self.family >= 4:
            d.update(lapl_u=lapl_u, lapl_d=lapl_d, tau_u=tau_u, tau_d=tau_d)
        return self.fn(p, d)
