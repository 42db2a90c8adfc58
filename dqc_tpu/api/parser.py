"""Molecule description parser.

Parity with the reference (/root/reference/dqc/api/parser.py):
"H 1 0 0; H -1 0 0" or (atomzs, atompos) -> (atomzs, atompos) arrays in Bohr.
Returns jnp arrays so fractional Z / positions stay differentiable.
"""
from __future__ import annotations

from typing import Tuple, Union, Sequence

import numpy as np
import jax.numpy as jnp

from ..utils.periodictable import get_atomz
from ..utils.units import length_to_au

MolDesc = Union[str, Tuple[Sequence, object]]


def parse_moldesc(moldesc: MolDesc, unit: str = None):
    """Parse the molecule description into (atomzs, atompos).

    atomzs: (natoms,) jnp array (float64 — may be fractional)
    atompos: (natoms, 3) jnp array in Bohr
    """
    if isinstance(moldesc, str):
        atomzs = []
        pos = []
        for chunk in moldesc.replace("\n", ";").split(";"):
            chunk = chunk.strip()
            if not chunk:
                continue
            toks = chunk.split()
            if len(toks) != 4:
                raise ValueError(f"Bad atom spec: {chunk!r}")
            atomzs.append(get_atomz(toks[0]))
            pos.append([float(t) for t in toks[1:]])
        atomzs_arr = jnp.asarray(np.asarray(atomzs, dtype=np.float64))
        pos_arr = jnp.asarray(np.asarray(pos, dtype=np.float64))
    else:
        zs, p = moldesc
        if isinstance(zs, (list, tuple)):
            zs = [get_atomz(z) if isinstance(z, str) else z for z in zs]
        atomzs_arr = jnp.asarray(zs, dtype=jnp.float64)
        pos_arr = jnp.asarray(p, dtype=jnp.float64)
        if pos_arr.ndim != 2 or pos_arr.shape[-1] != 3:
            raise ValueError("atompos must have shape (natoms, 3)")
    pos_arr = length_to_au(pos_arr, unit) if unit else pos_arr
    return atomzs_arr, pos_arr
