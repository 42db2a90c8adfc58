"""Periodic solid system description.

Parity surface with the reference Sol (/root/reference/dqc/system/sol.py):
lattice, Ewald nuclei energy, k-point sampling, PBC Hamiltonian hooks.

Round-1 scope: lattice/Ewald/overlap/kinetic lattice sums (all
differentiable — exceeding the reference, whose PBC integral backward is
NotImplemented). The PBC Coulomb/GDF pipeline lands in a later round
(tracked in SURVEY §7 stage 8).
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..api.parser import parse_moldesc
from ..ops.shellstruct import pack_basis
from ..utils.datastruct import AtomCGTOBasis
from .lattice import Lattice, ewald_energy
from .mol import _load_atom_basis


class Sol:
    """Periodic solid: soldesc + lattice vectors `alattice` (3,3) Bohr."""

    def __init__(self, soldesc, alattice, basis="3-21G", *,
                 spin: Optional[int] = None, kpts=None,
                 grid="sg2"):
        self.atomzs, self.atompos = parse_moldesc(soldesc)
        self.zs_int = [int(round(float(z))) for z in np.asarray(self.atomzs)]
        self.lattice = Lattice(alattice)
        from .mol import resolve_atom_bases
        atombases = []
        for i, bas_i in enumerate(resolve_atom_bases(self.zs_int, basis)):
            atombases.append(AtomCGTOBasis(atomz=self.zs_int[i], bases=bas_i,
                                           pos=np.asarray(self.atompos)[i]))
        self.atombases = atombases
        self.meta, self.params = pack_basis(atombases)
        self.params["atompos"] = self.atompos
        nelec = sum(self.zs_int)  # no charged solids (reference sol.py:74)
        self.spin = spin if spin is not None else nelec % 2
        nup = (nelec + self.spin) / 2.0
        ndn = (nelec - self.spin) / 2.0
        self.nelec = (nup, ndn)
        self.polarized = self.spin != 0
        self.kpts = np.zeros((1, 3)) if kpts is None else np.asarray(kpts)
        self.grid_level = grid
        self.efield = None          # no efield for PBC (reference sol.py:300)
        self._grid = None
        self._cache_fname: Optional[str] = None

    @property
    def dfinfo(self):
        return getattr(self, "_dfinfo", None)

    def densityfit(self, method: str = "aft", auxbasis="autoaux"):
        """PBC density fitting (reference sol.py:108-142 / df/dfpbc.py).

        method="aft" (default): the G-space AFT Coulomb already plays the
        density-fitting role — no-op. method="gdf"/"coulomb": fit pair
        densities onto a Gaussian auxiliary basis in the periodic Coulomb
        metric (scf/pbc.build_pbc_gdf); per-SCF-iteration J/K then cost
        nao^2*naux matmuls instead of G-space contractions."""
        if method == "aft":
            return self
        from ..utils.datastruct import DensityFitInfo
        if isinstance(auxbasis, str) and auxbasis.lower() == "autoaux":
            from ..basis.autoaux import autoaux
            auxb = autoaux(self.atombases)
        else:
            auxb = []
            for i, zi in enumerate(self.zs_int):
                bas_i = _load_atom_basis(zi, auxbasis)
                auxb.append(AtomCGTOBasis(atomz=zi, bases=bas_i,
                                          pos=np.asarray(self.atompos)[i]))
        self._dfinfo = DensityFitInfo(method=method, auxbases=auxb)
        return self

    def get_orb_weights(self, polarized: Optional[bool] = None):
        from ..utils.datastruct import SpinParam
        from ..utils.safeops import occnumber
        nao = self.meta.nao
        nup, ndn = self.nelec
        pol = self.polarized if polarized is None else polarized
        if pol:
            return SpinParam(u=occnumber(nup, nao), d=occnumber(ndn, nao))
        if abs(nup - ndn) > 1e-12:
            raise ValueError("Restricted calculation requires spin 0")
        return 2.0 * occnumber(nup, nao)

    def setup_grid(self):
        if self._grid is None:
            from ..grid.factory import get_predefined_grid, pbc_wrap_grid
            spec = get_predefined_grid(self.grid_level, self.zs_int,
                                       np.asarray(self.params["atompos"]),
                                       pbc=True)
            self._grid = pbc_wrap_grid(spec, self.params["atompos"],
                                       self.lattice)
        return self._grid

    def set_cache(self, fname: str, paramnames=None):
        self._cache_fname = fname
        self._cache_paramnames = (None if paramnames is None
                                  else list(paramnames))
        return self

    @property
    def cache_signature(self) -> str:
        import hashlib
        # rounded before hashing (see Mol.cache_signature: TPU f64 device
        # round-trips can perturb the last ulp between processes)
        pos = np.round(np.asarray(self.atompos, dtype=np.float64),
                       10).tobytes()
        zs = np.asarray(self.zs_int).tobytes()
        lat = np.round(np.asarray(self.lattice.lattice_vectors(),
                                  dtype=np.float64), 10).tobytes()
        h = hashlib.sha256(pos + zs + lat).hexdigest()[:16]
        return f"sol-{h}-grid{self.grid_level}-s{self.spin}"

    def get_nuclei_energy(self):
        """Ewald sum (parity: reference sol.py:176-228)."""
        return ewald_energy(self.atomzs, self.params["atompos"], self.lattice)

    def pbc_overlap(self, precision: float = 1e-10):
        from ..ops.pbc import estimate_rcut, pbc_overlap
        rcut = estimate_rcut(self.meta, self.params, precision)
        ls = self.lattice.get_lattice_ls(rcut)
        return pbc_overlap(self.meta, self.params, ls, self.kpts)

    def pbc_kinetic(self, precision: float = 1e-10):
        from ..ops.pbc import estimate_rcut, pbc_kinetic
        rcut = estimate_rcut(self.meta, self.params, precision)
        ls = self.lattice.get_lattice_ls(rcut)
        return pbc_kinetic(self.meta, self.params, ls, self.kpts)
