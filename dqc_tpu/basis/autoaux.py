"""Automatic even-tempered auxiliary basis generation for density fitting.

The reference relies on downloading named fitting bases (def2-svp-jkfit);
offline-first we also provide an "autoaux" generator (in the spirit of
Stoychev, Auer, Neese JCTC 13, 554 (2017)): for each atom, product-density
exponent ranges of the orbital basis expanded on an even-tempered grid, for
l up to 2*lmax.
"""
from __future__ import annotations

from typing import List

import numpy as np

from ..utils.datastruct import AtomCGTOBasis, CGTOBasis


def autoaux_for_atom(bases: List[CGTOBasis], beta: float = 2.2,
                     lmax_cap: int = 4) -> List[CGTOBasis]:
    lmax = max(b.angmom for b in bases)
    # exponent range of products per l
    amin = min(float(np.min(b.alphas)) for b in bases)
    amax = max(float(np.max(b.alphas)) for b in bases)
    out = []
    for l in range(min(2 * lmax, lmax_cap) + 1):
        # product densities of shells with la+lb >= l span [2 amin, 2 amax]
        lo = 2.0 * amin * (0.5 if l > 0 else 1.0)
        hi = 2.0 * amax / (1.0 + 0.5 * l)
        n = max(int(np.ceil(np.log(hi / lo) / np.log(beta))) + 1, 1)
        exps = lo * beta ** np.arange(n)
        for a in exps:
            out.append(CGTOBasis(angmom=l, alphas=np.array([a]),
                                 coeffs=np.array([1.0])))
    return out


def autoaux(atombases: List[AtomCGTOBasis]) -> List[AtomCGTOBasis]:
    return [AtomCGTOBasis(atomz=ab.atomz,
                          bases=autoaux_for_atom(ab.bases),
                          pos=ab.pos) for ab in atombases]
