"""Molecular system description.

Parity with the reference's Mol (/root/reference/dqc/system/mol.py):
moldesc parsing, basis assignment, charge/spin -> occupation logic including
fractional charge/spin (frac_mode), density fitting hook, grid setup.

TPU-native: Mol is a *host-side builder*. It produces (meta, params) — the
static shell metadata and the differentiable parameter pytree — plus
occupation vectors; all physics downstream is pure functions of params.
"""
from __future__ import annotations

import math
from typing import List, Optional, Union

import numpy as np
import jax.numpy as jnp

from ..api.parser import parse_moldesc
from ..basis import loadbasis
from ..basis.loader import parse_gaussian94
from ..utils.datastruct import AtomCGTOBasis, CGTOBasis, SpinParam, DensityFitInfo
from ..utils.periodictable import get_atomz
from ..utils.safeops import occnumber
from ..ops.shellstruct import pack_basis


def _load_atom_basis(z_int: int, basis) -> List[CGTOBasis]:
    if isinstance(basis, str):
        if "\n" in basis:  # raw Gaussian94 text
            return parse_gaussian94(basis, normalize=False)[z_int]
        return loadbasis(f"{z_int}:{basis}", normalize=False)
    if isinstance(basis, (list, tuple)) and basis and isinstance(basis[0], CGTOBasis):
        return list(basis)
    raise TypeError(f"Cannot interpret basis spec: {basis!r}")


def resolve_atom_bases(zs_int, basis) -> List[List[CGTOBasis]]:
    """Resolve a user basis spec into per-atom CGTOBasis lists.

    Accepted forms (parity: reference mol.py:110-121): a name, raw
    Gaussian94 text, a flat List[CGTOBasis] (same shells on every atom),
    a dict {Z or symbol: spec}, or a per-atom list of any of the above
    (including List[List[CGTOBasis]])."""
    out = []
    per_atom = (isinstance(basis, (list, tuple)) and len(basis) > 0
                and not isinstance(basis[0], CGTOBasis))
    if per_atom and len(basis) != len(zs_int):
        raise ValueError(
            f"per-atom basis list has {len(basis)} entries for "
            f"{len(zs_int)} atoms")
    for i, zi in enumerate(zs_int):
        if isinstance(basis, dict):
            key = zi if zi in basis else (
                [k for k in basis if get_atomz(k) == zi] or [None])[0]
            out.append(_load_atom_basis(zi, basis[key]))
        elif per_atom:
            out.append(_load_atom_basis(zi, basis[i]))
        else:
            out.append(_load_atom_basis(zi, basis))
    return out


class Mol:
    """Isolated molecule.

    moldesc: "H 1 0 0; H -1 0 0" or (atomzs, atompos in Bohr)
    basis: name, Gaussian94 text, dict {Z or symbol: spec}, or list per atom
    spin: 2*S_z (None -> 0 or 1 by electron parity); may be fractional
    charge: total charge; may be fractional (frac Z mode)
    orb_weights: optional occupation override — SpinParam of (nao,) arrays
    (polarized) or a (nao,) array (restricted); parity with the reference
    (mol.py:144-168), e.g. for non-aufbau/excited occupations.
    """

    def __init__(self, moldesc, basis: Union[str, dict, list] = "3-21G", *,
                 spin: Optional[Union[int, float]] = None,
                 charge: Union[int, float] = 0,
                 orthogonalize_basis: bool = True,
                 efield=None,
                 efield_grad=None,
                 efield_grad2=None,
                 vext=None,
                 orb_weights=None,
                 grid: Union[int, str] = "sg3",
                 dtype=jnp.float64):
        self.atomzs, self.atompos = parse_moldesc(moldesc)
        zs_concrete = np.asarray(self.atomzs)
        self.zs_int = [int(round(float(z))) for z in zs_concrete]
        self._frac_z = any(abs(float(z) - zi) > 1e-12
                           for z, zi in zip(zs_concrete, self.zs_int))

        # basis per atom
        atombases = []
        for i, bas_i in enumerate(resolve_atom_bases(self.zs_int, basis)):
            atombases.append(AtomCGTOBasis(atomz=self.zs_int[i], bases=bas_i,
                                           pos=np.asarray(self.atompos)[i]))
        self.atombases = atombases
        self.meta, self.params = pack_basis(atombases)
        # keep positions in sync with parsed (possibly traced) values
        self.params["atompos"] = self.atompos

        # electrons / occupations (parity: reference mol.py:395-443)
        nelec_tot = float(np.sum(zs_concrete)) - float(charge)
        if nelec_tot < 0:
            raise ValueError("More charge than electrons")
        self.charge = charge
        frac_elec = abs(nelec_tot - round(nelec_tot)) > 1e-12
        if spin is None:
            spin = 0 if round(nelec_tot) % 2 == 0 else 1
            if frac_elec:
                spin = nelec_tot - 2 * math.floor(nelec_tot / 2.0)
        self.spin = spin
        nup = (nelec_tot + float(spin)) / 2.0
        ndn = (nelec_tot - float(spin)) / 2.0
        if ndn < -1e-12:
            raise ValueError("spin > number of electrons")
        self.nelec = (nup, ndn)
        self.polarized = float(spin) != 0.0
        self._orb_weights = orb_weights
        if isinstance(orb_weights, SpinParam):
            self.polarized = True
        self.efield = efield
        # static field gradient (3,3) and second gradient (3,3,3): couple
        # through the quadrupole / octupole multipole integrals (parity:
        # reference r0r0 / r0r0r0 efield orders, namemgr.py:21-25)
        self.efield_grad = efield_grad
        self.efield_grad2 = efield_grad2
        # grid-tabulated external potential (ngrid,), contracted into hcore
        # (parity: reference mol.py:89,98 + hcgto.py:144-146,243-250)
        self.vext = vext
        self.orthogonalize_basis = orthogonalize_basis
        self.grid_level = grid
        self._dfinfo: Optional[DensityFitInfo] = None
        self._grid = None
        self._cache_fname: Optional[str] = None

    def set_cache(self, fname: str, paramnames=None):
        """Cache expensive theta tensors (integrals, grid tables) on disk,
        keyed by a system signature (parity: reference mol.py:217-244).
        paramnames optionally restricts caching to the named theta parts
        (e.g. ["core", "grid"]); None caches everything."""
        self._cache_fname = fname
        self._cache_paramnames = (None if paramnames is None
                                  else list(paramnames))
        return self

    @property
    def cache_signature(self) -> str:
        import hashlib
        # round before hashing: device round-trips (TPU f64 emulation) can
        # perturb the last ulp between processes, which must not change
        # the signature
        pos = np.round(np.asarray(self.atompos, dtype=np.float64),
                       10).tobytes()
        zs = np.asarray(self.zs_int).tobytes()
        shells = str([(b.angmom,
                       ["%.10e" % float(a) for a in np.asarray(b.alphas)],
                       ["%.10e" % float(c) for c in np.asarray(b.coeffs)])
                      for ab in self.atombases for b in ab.bases])
        vext_b = (b"" if self.vext is None
                  else np.round(np.asarray(self.vext, dtype=np.float64),
                                10).tobytes())
        h = hashlib.sha256(pos + zs + shells.encode() + vext_b).hexdigest()[:16]
        # v2: ao_grad grid tables stored as (3, ng, nao) — layout change
        # invalidates v1 caches. Angular-rule tag: switching Lebedev <->
        # product rules changes every grid table.
        from ..grid.angular import angular_rule_tag
        return (f"mol2-{h}-grid{self.grid_level}-{angular_rule_tag()}"
                f"-q{self.charge}-s{self.spin}")

    # --- occupations -----------------------------------------------------
    def get_orb_weights(self, polarized: Optional[bool] = None):
        if self._orb_weights is not None:
            w = self._orb_weights
            pol = self.polarized if polarized is None else polarized
            if isinstance(w, SpinParam):
                if not pol:
                    raise ValueError(
                        "SpinParam orb_weights requires a polarized calc")
                return SpinParam(u=jnp.asarray(w.u), d=jnp.asarray(w.d))
            if pol:
                half = 0.5 * jnp.asarray(w)
                return SpinParam(u=half, d=half)
            return jnp.asarray(w)
        """Occupation vector(s) over nao orbitals sorted by energy.

        restricted -> (nao,) with weights up to 2;
        polarized -> SpinParam of (nao,). Parity: reference mol.py:144-168."""
        nao = self.meta.nao
        nup, ndn = self.nelec
        pol = self.polarized if polarized is None else polarized
        if pol:
            wu = occnumber(nup, nao)
            wd = occnumber(ndn, nao)
            return SpinParam(u=wu, d=wd)
        if abs(nup - ndn) > 1e-12:
            raise ValueError("Restricted calculation requires spin 0")
        return 2.0 * occnumber(nup, nao)

    # --- hooks ------------------------------------------------------------
    def densityfit(self, method: str = "coulomb", auxbasis="autoaux"):
        """Use density fitting for the 2-electron integrals.
        Parity: reference mol.py:170-208. auxbasis: a named fitting basis or
        "autoaux" for the generated even-tempered fit (offline-first)."""
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

    @property
    def dfinfo(self):
        return self._dfinfo

    def get_nuclei_energy(self):
        from ..scf.hamilton import nuclear_repulsion
        return nuclear_repulsion(self.atomzs, self.params["atompos"])

    def setup_grid(self):
        if self._grid is None:
            from ..grid.factory import get_predefined_grid
            self._grid = get_predefined_grid(
                self.grid_level, self.zs_int, np.asarray(self.params["atompos"]))
        return self._grid

    def make_copy(self, **kwargs):
        """Copy with modified constructor kwargs (geometry scans etc.;
        parity: reference mol.py:298-326)."""
        opts = dict(
            moldesc=(self.atomzs, kwargs.pop("atompos", self.params["atompos"])),
            basis=kwargs.pop("basis", None),
            spin=self.spin, charge=self.charge,
            orthogonalize_basis=self.orthogonalize_basis,
            efield=self.efield, efield_grad=self.efield_grad,
            efield_grad2=self.efield_grad2, vext=self.vext,
            grid=self.grid_level,
        )
        if opts["basis"] is None:
            opts["basis"] = [ab.bases for ab in self.atombases]
        opts.update(kwargs)
        return Mol(opts.pop("moldesc"), **opts)
