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
                         madelung=None, gdf_aux=None, lr_omegas=()):
    """params -> theta for the gamma-point PBC SCF: real ovlp/hcore from
    lattice sums + AFT, pair-FT Coulomb factors, Ewald nuclei energy.

    gdf_aux: optional (meta_aux, params_aux) — Gaussian density fitting in
    the periodic Coulomb metric (counterpart of the reference's DFPBC,
    df/dfpbc.py:39-160): pair densities are fitted onto the auxiliary
    basis with the G-space metric, then per-iteration J/K are
    nao^2*naux MXU matmuls (scf/df.df_j/df_k) instead of per-iteration
    G-space contractions. The G=0 (charged-fit / compensating-charge)
    subtlety is handled as in the AFT path: the uniform component is
    projected out of the metric and 3c integrals alike (jellium
    convention), and the exchange G=0 term is restored by the Madelung
    probe-charge correction carried in the df dict."""
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
    theta = {
        "hcore": kin + vne,
        "ovlp": ovlp,
        "X": X,
        "keep": keep,
        "enuc": ewald_energy(atomzs, params["atompos"], lat),
    }
    # RSH: short-range (erfc) kernel G-weights per distinct omega — the
    # SR kernel FT is finite at G=0 (pi/omega^2/V), so these carry no
    # Madelung term; engine._k_lr assembles LR = full - SR
    from ..ops.pbcft import coulomb_gweights_sr
    if gdf_aux is None:
        theta["pbcft"] = {"Fre": Fre, "Fim": Fim, "wcoul": w,
                          "madelung": madelung}
        for i, om in enumerate(lr_omegas):
            theta["pbcft"][f"wsr{i}"] = coulomb_gweights_sr(
                Gv, lat.volume(), om)
    else:
        theta["df"] = build_pbc_gdf(Fre, Fim, w, gdf_aux[0], gdf_aux[1],
                                    Gv, madelung=madelung, ovlp=ovlp)
        # GDF RSH: a second fit per omega in the SHORT-RANGE metric (the
        # same build with the finite-at-G=0 erfc weights and no Madelung
        # term); engine._k_lr then assembles LR = K_df_full - K_df_sr
        for i, om in enumerate(lr_omegas):
            theta[f"df_sr{i}"] = build_pbc_gdf(
                Fre, Fim, coulomb_gweights_sr(Gv, lat.volume(), om),
                gdf_aux[0], gdf_aux[1], Gv)
    return theta


def build_pbc_gdf(Fre, Fim, w, meta_aux, params_aux, Gv, *, madelung=None,
                  ovlp=None):
    """Periodic-Coulomb-metric density fitting tensors from the pair FT.

    j3c_{ij,P} = sum_G w_G Re[F_ij(G) chi_P(G)^*]   (nao, nao, naux)
    v_{PQ}     = sum_G w_G Re[chi_P(G) chi_Q(G)^*]  (naux, naux)

    with chi_P the aux-AO Fourier transforms (ops/pbcft.eval_ao_ft — the
    lattice-periodic aux function's Bloch sum at gamma has exactly the
    single-center FT on the reciprocal lattice). The returned dict plugs
    into scf/df.df_j/df_k unchanged; "madelung"/"ovlp" carry the
    exact-exchange G=0 probe-charge correction."""
    from ..ops.pbcft import eval_ao_ft
    nao = Fre.shape[-1]
    ng = Fre.shape[0]
    cre, cim = eval_ao_ft(meta_aux, params_aux, jnp.asarray(Gv))
    fre = Fre.reshape(ng, nao * nao)
    fim = Fim.reshape(ng, nao * nao)
    j3c = (jnp.einsum("gx,g,gp->xp", fre, w, cre)
           + jnp.einsum("gx,g,gp->xp", fim, w, cim)).reshape(nao, nao, -1)
    v = (jnp.einsum("gp,g,gq->pq", cre, w, cre)
         + jnp.einsum("gp,g,gq->pq", cim, w, cim))
    v = 0.5 * (v + v.T)
    from .eigh import safe_eigh
    ew, ev = safe_eigh(v)
    keep = ew > 1e-10 * jnp.max(ew)
    inv_w = jnp.where(keep, 1.0 / jnp.where(keep, ew, 1.0), 0.0)
    v_inv = (ev * inv_w[None, :]) @ ev.T
    out = {"j3c": j3c, "v_inv": v_inv}
    if madelung is not None:
        out["madelung"] = jnp.asarray(madelung)
        out["ovlp"] = ovlp
    return out
