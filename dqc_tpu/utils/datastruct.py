"""Core data structures: SpinParam, ValGrad, basis containers.

TPU-native redesign of the reference's datastructures
(/root/reference/dqc/utils/datastruct.py). SpinParam and ValGrad are
registered JAX pytrees so they flow through jit/grad/vmap transparently —
this replaces the reference's EditableModule/getparamnames protocol, which
dissolves in a functional framework.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Callable, Generic, List, Optional, Sequence, TypeVar, Union

import numpy as np
import jax

T = TypeVar("T")


@dataclass
class SpinParam(Generic[T]):
    """Container for spin-polarized quantities (u = up/alpha, d = down/beta).

    Mirrors the reference's SpinParam API (datastruct.py:79-137): apply_fcn,
    sum, reduce — but as a JAX pytree, so `jax.grad` etc. see through it.
    """
    u: T
    d: T

    def sum(self):
        return self.u + self.d

    def reduce(self, fcn: Callable):
        return fcn(self.u, self.d)

    @staticmethod
    def apply_fcn(fcn: Callable, *params):
        """Apply fcn elementwise over SpinParam members; non-SpinParam args
        are broadcast to both channels. Returns SpinParam if any arg is one,
        else plain value."""
        if any(isinstance(p, SpinParam) for p in params):
            us = [p.u if isinstance(p, SpinParam) else p for p in params]
            ds = [p.d if isinstance(p, SpinParam) else p for p in params]
            return SpinParam(u=fcn(*us), d=fcn(*ds))
        return fcn(*params)

    @staticmethod
    def sum_if(x):
        return x.sum() if isinstance(x, SpinParam) else x


jax.tree_util.register_pytree_node(
    SpinParam,
    lambda sp: ((sp.u, sp.d), None),
    lambda aux, ch: SpinParam(u=ch[0], d=ch[1]),
)


@dataclass
class ValGrad:
    """Density information bundle at grid points.

    value: density n(r) — (*B, nr)
    grad:  gradient (d/dx, d/dy, d/dz) n(r) — (*B, 3, nr) or None
    lapl:  laplacian — (*B, nr) or None
    kin:   kinetic energy density tau — (*B, nr) or None

    Parity with reference datastruct.py:140-185 including + and * operators.
    """
    value: object
    grad: Optional[object] = None
    lapl: Optional[object] = None
    kin: Optional[object] = None

    def __add__(self, other: "ValGrad") -> "ValGrad":
        def _a(x, y):
            if x is None and y is None:
                return None
            if x is None or y is None:
                raise ValueError("Cannot add ValGrad with mismatched components")
            return x + y
        return ValGrad(value=self.value + other.value,
                       grad=_a(self.grad, other.grad),
                       lapl=_a(self.lapl, other.lapl),
                       kin=_a(self.kin, other.kin))

    def __mul__(self, f):
        return ValGrad(value=self.value * f,
                       grad=None if self.grad is None else self.grad * f,
                       lapl=None if self.lapl is None else self.lapl * f,
                       kin=None if self.kin is None else self.kin * f)

    __rmul__ = __mul__


def _valgrad_flatten(vg):
    return ((vg.value, vg.grad, vg.lapl, vg.kin), None)


jax.tree_util.register_pytree_node(
    ValGrad,
    _valgrad_flatten,
    lambda aux, ch: ValGrad(value=ch[0], grad=ch[1], lapl=ch[2], kin=ch[3]),
)


@dataclass
class CGTOBasis:
    """One contracted Gaussian shell: angular momentum + primitives.

    Host-side (numpy) description; device arrays are built by the shell
    packer (dqc_tpu/ops/shellstruct.py). Parity: reference datastruct.py:28-67.
    """
    angmom: int
    alphas: np.ndarray   # (nprim,)
    coeffs: np.ndarray   # (nprim,)
    normalized: bool = False

    def wfnormalize_(self) -> "CGTOBasis":
        """Normalize primitives then the contraction so the contracted
        spherical GTO has unit self-overlap (matches libcint/PySCF convention,
        reference datastruct.py:34-61)."""
        from scipy.special import gammaln
        if self.normalized:
            return self
        l = self.angmom
        a = np.asarray(self.alphas, dtype=np.float64)
        c = np.asarray(self.coeffs, dtype=np.float64)
        # primitive norm: <g|g> for the radial part r^l e^{-a r^2} with
        # spherical harmonic of unit L2 norm:
        # N(a) = sqrt( 2 (2a)^{l+1.5} / Gamma(l+1.5) )
        lognorm = 0.5 * (np.log(2.0) + (l + 1.5) * np.log(2.0 * a)
                         - gammaln(l + 1.5))
        c = c * np.exp(lognorm)
        # contracted self-overlap with *unnormalized* radial primitives:
        # <r^l e^{-ai r^2} | r^l e^{-aj r^2}> = Gamma(l+1.5) / (2 p^{l+1.5})
        aij = a[:, None] + a[None, :]
        ovlp = np.exp(gammaln(l + 1.5) - np.log(2.0)
                      - (l + 1.5) * np.log(aij))
        s = float(np.einsum("i,j,ij->", c, c, ovlp))
        c = c / np.sqrt(s)
        return CGTOBasis(angmom=l, alphas=a, coeffs=c, normalized=True)


@dataclass
class AtomCGTOBasis:
    atomz: Union[int, float]
    bases: List[CGTOBasis]
    pos: Sequence[float]  # (3,) in Bohr


@dataclass
class DensityFitInfo:
    method: str
    auxbases: List[AtomCGTOBasis]
