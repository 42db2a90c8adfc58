"""PBC (gamma-point) SCF theta builder: AFT electrostatics + periodic grid.

TPU-native counterpart of the reference's HamiltonCGTO_PBC.build()
(/root/reference/dqc/hamilton/hcgto_pbc.py:91-185) and DFPBC
(/root/reference/dqc/df/dfpbc.py): overlap/kinetic are real-space lattice
sums (ops/pbc.py); nuclear attraction and the Coulomb matrix are assembled
in reciprocal space from analytic pair Fourier transforms (ops/pbcft.py)
instead of the reference's compensating-Gaussian GDF plumbing. The XC grid
is the cell-wrapped Becke grid with lattice-summed AO tables.

Everything downstream of the params pytree is jnp math, so PBC energies
are differentiable w.r.t. atom positions and basis parameters — the
reference's PBC integral backward is NotImplemented (pbcintor.py:246,271).

Exact exchange (which the reference lacks entirely for PBC —
hcgto_pbc.py:183-185 raises NotImplementedError) is assembled in G-space
from the same pair-FT tensors (ops/pbcft.aft_k) with a probe-charge Ewald
(Madelung) correction for the dropped G=0 term, enabling periodic
Hartree-Fock and hybrid functionals at gamma.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..grid.becke import becke_weights
from ..ops.aoeval import eval_ao_pbc
from ..ops.chunks import map_blocks
from ..ops.pbc import estimate_rcut, pbc_kinetic, pbc_overlap
from ..ops.pbcft import (aft_vnuc, coulomb_gweights, gcut_estimate,
                         pbc_pair_ft, pbc_pair_plan)
from ..system.lattice import ewald_energy
from .orth import orthogonalizer

BECKE_CHUNK = 512
AO_PT_CHUNK = 2048


def setup_pbc_grid_theta(meta, params, pbcgrid, ls_ao, family: int = 1):
    """PBCGridSpec -> in-graph grid tables (same keys as the molecular
    setup_grid_theta): coords, dvol, and lattice-summed AO tables."""
    atompos = params["atompos"]
    aidx = jnp.asarray(pbcgrid.atom_idx.astype(np.int64))
    coords = (atompos[aidx]
              + jnp.asarray(pbcgrid.ratom)[:, None] * jnp.asarray(pbcgrid.dirs)
              + jnp.asarray(pbcgrid.shift))
    vpos = atompos[jnp.asarray(pbcgrid.vowner)] + jnp.asarray(pbcgrid.vshift)
    vradii = jnp.asarray(pbcgrid.atom_radii)[jnp.asarray(pbcgrid.vowner)]
    vidx = jnp.asarray(pbcgrid.vatom_idx)
    ng = coords.shape[0]
    import jax
    # remat: the chunk bodies' internals (per-image AO polynomials, the
    # (chunk, nv, nv) Becke cell arrays) are recomputed in the backward
    # instead of being saved per lax.map step — without this the reverse
    # pass materializes hundreds of GB of residuals.
    w_becke = map_blocks(
        jax.checkpoint(
            lambda args: becke_weights(args["c"], args["i"], vpos, vradii)),
        {"c": coords, "i": vidx}, ng, BECKE_CHUNK)
    dvol = jnp.asarray(pbcgrid.w0) * w_becke
    deriv = 0 if family <= 1 else (1 if family <= 2 else 2)
    tabs = map_blocks(
        jax.checkpoint(
            lambda c: eval_ao_pbc(meta, params, c, ls_ao, deriv=deriv)),
        coords, ng, AO_PT_CHUNK)
    out = {"coords": coords, "dvol": dvol, "family": family,
           "ao": tabs["ao"]}
    if deriv >= 1:
        out["ao_grad"] = tabs["ao_grad"]
    if deriv >= 2:
        out["ao_lapl"] = tabs["ao_lapl"]
    return out


def madelung_constant(lattice) -> float:
    """Probe-charge Madelung constant of the cell: minus twice the Ewald
    energy of a single unit point charge in a neutralizing background
    (PySCF's exxdiv="ewald" convention). Positive; ~2.8373/L for a simple
    cubic cell of edge L. Host-side (call outside jit: the lattice is
    static, so this is a frozen scalar of the calculation)."""
    import numpy as _np
    e = ewald_energy(_np.ones(1), _np.zeros((1, 3)), lattice)
    return -2.0 * float(e)


def build_pbc_core_theta(sol, params, atomzs, *, precision: float = 1e-9,
                         madelung=None):
    """params -> theta for the gamma-point PBC SCF: real ovlp/hcore from
    lattice sums + AFT, pair-FT Coulomb factors, Ewald nuclei energy."""
    meta = sol.meta
    lat = sol.lattice
    rcut = estimate_rcut(meta, sol.params, precision)
    ls = lat.get_lattice_ls(rcut)
    kpts = np.zeros((1, 3))
    ovlp = pbc_overlap(meta, params, ls, kpts)[0].real
    kin = pbc_kinetic(meta, params, ls, kpts)[0].real

    gcut = gcut_estimate(meta, sol.params, precision)
    Gv, _ = lat.get_gvgrids(gcut)
    plan = pbc_pair_plan(meta, sol.params, lat, precision)
    Fre, Fim = pbc_pair_ft(meta, params, plan, Gv)
    w = coulomb_gweights(Gv, lat.volume())
    vne = aft_vnuc(Fre, Fim, w, atomzs, params["atompos"], Gv)

    X, keep = orthogonalizer(ovlp, 1e-9)
    return {
        "hcore": kin + vne,
        "ovlp": ovlp,
        "X": X,
        "keep": keep,
        "enuc": ewald_energy(atomzs, params["atompos"], lat),
        "pbcft": {"Fre": Fre, "Fim": Fim, "wcoul": w,
                  "madelung": madelung},
    }
