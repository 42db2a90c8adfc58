"""Orbital orthogonalizer: S -> X with X^T S X = I (on the kept subspace).

Parity with the reference's OrbitalOrthogonalizer
(/root/reference/dqc/hamilton/orbconverter.py:67-124): symmetric
orthogonalization with small-eigenvalue cutoff for overcomplete bases.

TPU twist: XLA needs static shapes, so instead of dropping near-null
directions we *mask* them (their X columns are zeroed) and report the mask;
the SCF engine pins the Fock matrix diagonal to +LARGE on masked columns so
they are never occupied.
"""
from __future__ import annotations

import jax.numpy as jnp

from .eigh import safe_eigh

LARGE = 1e7


def orthogonalizer(ovlp, threshold: float = 1e-9):
    """Returns (X, keep_mask). X: (nao, nao) with masked columns zeroed."""
    w, v = safe_eigh(ovlp)
    keep = w > threshold * w[-1]
    inv_sqrt = jnp.where(keep, 1.0 / jnp.sqrt(jnp.where(keep, w, 1.0)), 0.0)
    X = v * inv_sqrt[None, :]
    return X, keep
