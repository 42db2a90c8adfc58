"""Grid integration of XC: density info, E_xc, and V_xc by autodiff.

Replaces the reference's hand-assembled chain _dm2densinfo -> xc.get_vxc ->
_get_vxc_from_potinfo (/root/reference/dqc/hamilton/hcgto.py:260-495 +
base_xc.py:39-125): here V_xc = d E_xc / d(dm) via one jax.grad, exact for
LDA/GGA/MGGA alike, since E_xc is a pure function of the density matrix.

Grid tables are built in-graph from atom positions (Becke weights and point
coordinates move with the atoms), so nuclear gradients include quadrature
terms exactly. The grid axis is processed in fixed-size chunks via lax.map —
the TPU analog of the reference's chunkify (SURVEY §5.7) and the natural
axis to shard across devices.
"""
from __future__ import annotations

from functools import partial

import os

import numpy as np
import jax
import jax.numpy as jnp

from ..grid.becke import becke_weights
from ..ops.aoeval import eval_ao
from ..ops.chunks import map_reduce_blocks

GRID_CHUNK = 8192
# AO tables are evaluated in chunks of this many points during setup (bounds
# peak memory of the polynomial machinery); the tables themselves persist.
AO_EVAL_CHUNK = 16384


def _deriv_of_family(family: int) -> int:
    return 0 if family <= 1 else (1 if family <= 2 else 2)


def setup_grid_theta(meta, params, grid, family: int = 1):
    """GridSpec -> in-graph grid tables: coords, dvol, AO value tables.

    AO tables (phi, grad phi, lapl phi at every point) depend only on the
    basis params — computed ONCE here, so the SCF loop's exc/vxc are pure
    einsums over them (the reference similarly tabulates AOs at setup,
    hcgto.py:152-186)."""
    atompos = params["atompos"]
    atom_idx = jnp.asarray(grid.atom_idx.astype(np.int64))
    coords = (atompos[atom_idx]
              + jnp.asarray(grid.ratom)[:, None] * jnp.asarray(grid.dirs))
    w_becke = becke_weights(coords, atom_idx, atompos,
                            jnp.asarray(grid.atom_radii))
    dvol = jnp.asarray(grid.w0) * w_becke
    deriv = _deriv_of_family(family)
    from ..ops.chunks import map_blocks
    from ..parallel.mesh import shard_grid_axis
    tabs = map_blocks(lambda c: eval_ao(meta, params, c, deriv=deriv),
                      coords, coords.shape[0], AO_EVAL_CHUNK)
    out = {"coords": shard_grid_axis(coords),
           "dvol": shard_grid_axis(dvol), "family": family}
    out["ao"] = shard_grid_axis(tabs["ao"])
    if deriv >= 1:
        # store as (3, ng, nao): a minor-dimension-3 axis hits a
        # pathological vreg layout on TPU in every downstream contraction
        out["ao_grad"] = shard_grid_axis(
            jnp.moveaxis(tabs["ao_grad"], 1, 0), axis=1)
    if deriv >= 2:
        out["ao_lapl"] = shard_grid_axis(tabs["ao_lapl"])
    return out


def vext_matrix(meta, params, grid, vext):
    """Grid-tabulated arbitrary external potential: V_ext[ij] =
    sum_g vext_g dvol_g phi_i(r_g) phi_j(r_g), added to hcore.

    Parity: reference HamiltonCGTO.get_vext (hcgto.py:243-250), where
    vext (ngrid,) enters the core Hamiltonian via the basis_dvolume
    contraction (hcgto.py:144-146). Differentiable w.r.t. vext, basis
    params, and atom positions (the quadrature itself moves with the
    atoms through the in-graph Becke weights)."""
    tabs = setup_grid_theta(meta, params, grid, family=1)
    w = jnp.asarray(vext) * tabs["dvol"]
    return jnp.einsum("gi,g,gj->ij", tabs["ao"], w, tabs["ao"])


def density_from_tables(tabs, dm, family: int, polarized: bool):
    """Densities at grid points from AO tables + dm.

    Accepts ao_grad in either (3, ng, nao) (preferred TPU layout, built by
    setup_grid_theta) or (ng, 3, nao) (PBC/eval_ao raw layout); the 'grad'
    output is always (3, ng) — leading component axis."""
    deriv = _deriv_of_family(family)
    ao = tabs["ao"]                                      # (ng,nao)
    ag = tabs.get("ao_grad")
    lead3 = ag is not None and ag.ndim == 3 and ag.shape[0] == 3 \
        and ag.shape[1] == ao.shape[0]

    # Ozaki MXU path (ops/ozaki.py): the (ng,nao)@(nao,nao) f64 GEMMs
    # run ~2.5x faster from cached bf16 slices of the constant AO tables
    # (built by integrity.maybe_build_ozaki into run()-materialized
    # theta only — the slice extraction is non-differentiable, so traced
    # gradient programs never see "ozk"; scf/adjoint.py pops it).
    ozk = tabs.get("ozk")
    use_ozk = (ozk is not None and getattr(dm, "dtype", None)
               == jnp.float64)
    if use_ozk:
        from ..ops import ozaki as _oz
        _w, _S, _U, _ = _oz.params_for_k(ao.shape[-1])

    def _oz_mm(key, dm_sl):
        sl, sc = ozk[key]
        return _oz.matmul_sliced(sl, sc, dm_sl[0], dm_sl[1], _w, _U)

    def grad_of(dmi, dm_sl=None):
        if use_ozk:
            gb = jnp.stack([_oz_mm(f"ag{d}", dm_sl) for d in range(3)])
            gdot = 2.0 * jnp.einsum("dgi,gi->dg", gb, ao)
            return gb, gdot
        if lead3:
            gb = jnp.einsum("dgi,ij->dgj", ag, dmi)
            gdot = 2.0 * jnp.einsum("dgi,gi->dg", gb, ao)
        else:
            gb = jnp.einsum("gdi,ij->gdj", ag, dmi)
            gdot = 2.0 * jnp.einsum("gdi,gi->dg", gb, ao)
        return gb, gdot

    def dens_of(dmi):
        dm_sl = None
        if use_ozk:
            dm_sl = _oz.col_slices(dmi, _w, _S)
            b = _oz_mm("ao", dm_sl)
        else:
            b = ao @ dmi                                 # (ng,nao)
        rho = jnp.einsum("gi,gi->g", b, ao)
        out = {"rho": rho}
        if deriv >= 1:
            out["grad"] = grad_of(dmi, dm_sl)[1]
        if deriv >= 2:
            lap_b = tabs["ao_lapl"] @ dmi
            t1 = jnp.einsum("gi,gi->g", lap_b, ao)
            gb, _ = grad_of(dmi, dm_sl)
            gg = (jnp.einsum("dgi,dgi->g", gb, ag)
                  if (lead3 or use_ozk)
                  else jnp.einsum("gdi,gdi->g", gb, ag))
            out["lapl"] = 2.0 * t1 + 2.0 * gg
            out["tau"] = 0.5 * gg
        return out

    if polarized:
        return {"u": dens_of(dm[0]), "d": dens_of(dm[1])}
    return dens_of(dm)


def density_info(meta, params, dm, coords, family: int, polarized: bool):
    """Densities at arbitrary coords (re-evaluates AOs; for grid-table use
    density_from_tables)."""
    deriv = _deriv_of_family(family)
    tabs = eval_ao(meta, params, coords, deriv=deriv)
    return density_from_tables(tabs, dm, family, polarized)


# grid points with density below this threshold contribute zero energy and
# zero gradient (double-where screening); prevents rho->0 tails from
# poisoning vxc with inf*0 NaNs (the reference relies on libxc's internal
# density thresholds for the same thing).
DENS_THRESHOLD = 1e-12


def _dens_threshold(dtype):
    """f32 needs a far larger screen: GGA potential terms scale like
    rho^(-11/3), which overflows f32 (max ~3e38) for rho below ~1e-8 —
    the masked lanes would then poison vxc = grad(Exc) with inf*0 NaNs
    even though the energy primal is protected by the double-where.

    The TPU needs the same screen even at f64: its emulated-f64 pow
    saturates at the f32 RANGE (CLAUDE.md), and while the energy and
    first-order vxc chains stay under ~1e26 at rho=1e-12, the
    SECOND-order chains of the adjoint/Hessian paths carry
    rho^(-14/3)-class factors (~1e44) that overflow -> inf -> NaN in the
    step-transpose VJP (measured: benzene B3LYP adjoint matvec non-finite
    on the axon TPU, finite on CPU). Screening at 1e-7 costs ~<1e-9 Ha
    of XC energy on production grids."""
    if dtype != jnp.float64:
        return 1e-7
    if (jax.default_backend() == "tpu"
            and os.environ.get("DQC_TPU_DENS_SCREEN_TPU") == "1"):
        # opt-in: needed only if second-order functional-derivative
        # chains must RUN ON the TPU (the adjoint defaults its cotangent
        # modules to the CPU backend instead — scf/adjoint.py — both
        # because of this overflow and because the big fused f64 VJP
        # programs hit the backend's miscompile class: device pullbacks
        # gave |dF| 1.4e-2 vs 3e-5 with CPU pullbacks at identical
        # forward state). The 1e-7 screen costs ~3e-6 Ha / ~3e-5 in
        # forces vs the 1e-12 screen on this system class.
        return 1e-7
    return DENS_THRESHOLD


def _screen(mask, x, fill=1.0):
    return jnp.where(mask, x, fill)


def _edens_at(xc, dens, polarized: bool, xcparams=None):
    fam = xc.family
    if polarized:
        du, dd = dens["u"], dens["d"]
        mask = (du["rho"] + dd["rho"]) > _dens_threshold(du["rho"].dtype)
        kw = {}
        if fam >= 2:
            # grad layout: (3, ng) — component axis leading
            kw["sigma_uu"] = _screen(mask, jnp.sum(du["grad"] ** 2, axis=0))
            kw["sigma_ud"] = _screen(
                mask, jnp.sum(du["grad"] * dd["grad"], axis=0))
            kw["sigma_dd"] = _screen(mask, jnp.sum(dd["grad"] ** 2, axis=0))
        if fam >= 4:
            kw.update(lapl_u=_screen(mask, du["lapl"]),
                      lapl_d=_screen(mask, dd["lapl"]),
                      tau_u=_screen(mask, du["tau"]),
                      tau_d=_screen(mask, dd["tau"]))
        ru = _screen(mask, du["rho"])
        rd = _screen(mask, dd["rho"])
        if hasattr(xc, "apply_pol"):
            e = xc.apply_pol(xcparams, ru, rd, **kw)
        else:
            e = xc.edens_pol(ru, rd, **kw)
        return jnp.where(mask, e, 0.0)
    mask = dens["rho"] > _dens_threshold(dens["rho"].dtype)
    kw = {}
    if fam >= 2:
        kw["sigma"] = _screen(mask, jnp.sum(dens["grad"] ** 2, axis=0))
    if fam >= 4:
        kw.update(lapl=_screen(mask, dens["lapl"]),
                  tau=_screen(mask, dens["tau"]))
    r = _screen(mask, dens["rho"])
    if hasattr(xc, "apply_unpol"):
        e = xc.apply_unpol(xcparams, r, **kw)
    else:
        e = xc.edens_unpol(r, **kw)
    return jnp.where(mask, e, 0.0)


# elements budget for one (chunk, nao) intermediate in the XC contraction;
# chosen so several live copies stay well under HBM. Chunking engages only
# beyond it — nested while(map(remat)) programs have crashed the TPU
# runtime, so prefer a single chunk whenever it fits.
XC_CHUNK_ELEMS = 50_000_000


def exc_energy(xc, dm, grid_theta, polarized: bool, xcparams=None,
               chunk: int = None):
    """E_xc = sum_g dvol_g e(r_g) over the precomputed AO tables.

    Chunked (lax.map) + rematerialized over the grid axis so the reverse
    pass (vxc) holds only one chunk of (ng, nao) intermediates — the memory
    control the reference gets from chunkify (SURVEY §5.7)."""
    fam = xc.family
    ng = grid_theta["dvol"].shape[0]
    if chunk is None:
        nao = grid_theta["ao"].shape[-1]
        chunk = max(65536, XC_CHUNK_ELEMS // max(nao, 1))

    def body(tabs):
        dens = density_from_tables(tabs, dm, fam, polarized)
        e = _edens_at(xc, dens, polarized, xcparams)
        return jnp.sum(e * tabs["dvol"])

    if _dsg_usable(grid_theta, xc, dm, chunk):
        dsg = grid_theta["dsg"]
        w = grid_theta["dvol"]
        if polarized:
            dens = {"u": _dsg_dens(dsg, dm[0], ng),
                    "d": _dsg_dens(dsg, dm[1], ng)}
        else:
            dens = _dsg_dens(dsg, dm, ng)
        return jnp.sum(_edens_at(xc, dens, polarized, xcparams) * w)
    tab_keys = [k for k in ("ao", "ao_grad", "ao_lapl", "dvol")
                if k in grid_theta]
    import jax as _jax
    if ng <= chunk:
        tabs0 = {k: grid_theta[k] for k in tab_keys}
        if "ozk" in grid_theta:
            tabs0["ozk"] = grid_theta["ozk"]   # unchunked path only
        # remat: the vxc backward recomputes the pointwise XC math instead
        # of storing every (ng, nao) intermediate
        return _jax.checkpoint(body)(tabs0)
    # chunked path maps over the leading (grid) axis: the (3, ng, nao)
    # ao_grad layout must be chunk-axis-first here, so swap for the map and
    # back per block (rare: engages only beyond XC_CHUNK_ELEMS points)
    tabs_in = {}
    for k in tab_keys:
        v = grid_theta[k]
        if k == "ao_grad" and v.shape[0] == 3 and v.shape[1] == ng:
            v = jnp.moveaxis(v, 0, 1)
        tabs_in[k] = v

    def body_chunk(tabs):
        tabs = dict(tabs)
        if "ao_grad" in tabs:
            tabs["ao_grad"] = jnp.moveaxis(tabs["ao_grad"], 1, 0)
        return body(tabs)

    from ..ops.chunks import map_reduce_blocks
    return map_reduce_blocks(_jax.checkpoint(body_chunk), tabs_in, ng, chunk)


def _vxc_assemble(vbar, tabs):
    """Closed-form V_xc assembly from pointwise-potential cotangents.

    vbar is d(Exc)/d(density-info arrays) — the *pointwise* adjoints (vrho,
    v_gradrho (3,ng), v_lapl, v_tau), dvol already folded in. The dm
    derivative of each as-written density expression (density_from_tables)
    is then a fixed pattern of AO-table contractions; assembling them
    directly keeps the big (ng,nao) matmuls out of the AD graph (jax.grad
    through exc_energy re-runs them in the backward + remat recompute, ~2x
    the matmul traffic of this form). Raw (unsymmetrized) result."""
    ao = tabs["ao"]
    ag = tabs.get("ao_grad")   # (3, ng, nao) preferred layout
    if ag is not None and not (ag.ndim == 3 and ag.shape[0] == 3
                               and ag.shape[1] == ao.shape[0]):
        ag = jnp.moveaxis(ag, 1, 0)
    V = jnp.einsum("gi,g,gj->ij", ao, vbar["rho"], ao)
    vg = vbar.get("grad")
    if vg is not None:
        # d(grad rho_d)/ddm_ij = 2 ag_dgi ao_gj (as written in
        # density_from_tables: gdot = 2 <gb, ao>)
        V = V + 2.0 * jnp.einsum("dgi,dg,gj->ij", ag, vg, ao)
    vl = vbar.get("lapl")
    if vl is not None:
        L = tabs["ao_lapl"]
        # lapl = 2 t1 + 2 gg, t1 = <L dm, ao>, gg = <ag dm, ag>
        V = V + 2.0 * jnp.einsum("gi,g,gj->ij", L, vl, ao)
        V = V + 2.0 * jnp.einsum("dgi,g,dgj->ij", ag, vl, ag)
    vt = vbar.get("tau")
    if vt is not None:
        V = V + 0.5 * jnp.einsum("dgi,g,dgj->ij", ag, vt, ag)
    return V


def _dsg_dens(dsg, dm, ng: int):
    """GGA density info via the DS Pallas kernel (ops/pallas_xc)."""
    from ..ops import pallas_xc
    rho, gdot = pallas_xc.ds_dens_gga(dsg, dm, ng)
    return {"rho": rho, "grad": gdot}


def _dsg_assemble(dsg, vbar, ng: int, nao: int):
    from ..ops import pallas_xc
    wth, wtl = pallas_xc.build_wt(dsg, vbar["rho"], vbar.get("grad"), ng)
    return pallas_xc.ds_vxc_gga(dsg, wth, wtl, nao)


def _exc_vxc_dsg(xc, dm, grid_theta, polarized: bool, xcparams):
    """One-pass (E_xc, raw V_xc) on the DS Pallas grid kernels: density
    and assembly run as double-single VPU programs (~8-15x the XLA
    emulated-f64 skinny GEMMs on the axon v5e); AD still runs only
    through the pointwise functional chain. Forward-only (the dsg
    planes never appear in traced gradient programs)."""
    dsg = grid_theta["dsg"]
    ng = grid_theta["dvol"].shape[0]
    nao = grid_theta["ao"].shape[-1]
    w = grid_theta["dvol"]
    if polarized:
        dens = {"u": _dsg_dens(dsg, dm[0], ng),
                "d": _dsg_dens(dsg, dm[1], ng)}
    else:
        dens = _dsg_dens(dsg, dm, ng)

    def esum(d):
        return jnp.sum(_edens_at(xc, d, polarized, xcparams) * w)

    exc, vbar = jax.value_and_grad(esum)(dens)
    if polarized:
        V = jnp.stack([_dsg_assemble(dsg, vbar["u"], ng, nao),
                       _dsg_assemble(dsg, vbar["d"], ng, nao)])
    else:
        V = _dsg_assemble(dsg, vbar, ng, nao)
    return exc, V


def _dsg_usable(grid_theta, xc, dm, chunk):
    """The DS grid path serves exactly: GGA family, f64 dm, unchunked
    grid, planes present (integrity-probed at theta build)."""
    if "dsg" not in grid_theta or xc.family != 2:
        return False
    if grid_theta["dvol"].shape[0] > chunk:
        return False
    return jnp.result_type(dm) == jnp.float64


def _exc_vxc_tabs(xc, dm, tabs, polarized: bool, xcparams):
    """One-pass (E_xc partial, raw V_xc partial) over one set of tables."""
    dens = density_from_tables(tabs, dm, xc.family, polarized)
    w = tabs["dvol"]

    def esum(d):
        return jnp.sum(_edens_at(xc, d, polarized, xcparams) * w)

    exc, vbar = jax.value_and_grad(esum)(dens)
    if polarized:
        V = jnp.stack([_vxc_assemble(vbar["u"], tabs),
                       _vxc_assemble(vbar["d"], tabs)])
    else:
        V = _vxc_assemble(vbar, tabs)
    return exc, V


def exc_vxc(xc, dm, grid_theta, polarized: bool, xcparams=None):
    """(E_xc, V_xc) with the pointwise-adjoint + closed-form assembly:
    AD runs only through the per-point functional chain (cheap elementwise
    arrays), never through the (ng,nao) AO-table matmuls. Chunked over the
    grid axis beyond XC_CHUNK_ELEMS (same policy as exc_energy)."""
    ng = grid_theta["dvol"].shape[0]
    nao = grid_theta["ao"].shape[-1]
    chunk = max(65536, XC_CHUNK_ELEMS // max(nao, 1))
    if _dsg_usable(grid_theta, xc, dm, chunk):
        exc, V = _exc_vxc_dsg(xc, dm, grid_theta, polarized, xcparams)
        return exc, 0.5 * (V + jnp.swapaxes(V, -1, -2))
    tab_keys = [k for k in ("ao", "ao_grad", "ao_lapl", "dvol")
                if k in grid_theta]
    if ng <= chunk:
        tabs0 = {k: grid_theta[k] for k in tab_keys}
        if "ozk" in grid_theta:
            tabs0["ozk"] = grid_theta["ozk"]   # unchunked path only
        exc, V = _exc_vxc_tabs(xc, dm, tabs0, polarized, xcparams)
        return exc, 0.5 * (V + jnp.swapaxes(V, -1, -2))
    tabs_in = {}
    for k in tab_keys:
        v = grid_theta[k]
        if k == "ao_grad" and v.shape[0] == 3 and v.shape[1] == ng:
            v = jnp.moveaxis(v, 0, 1)
        tabs_in[k] = v

    def body_chunk(tabs):
        tabs = dict(tabs)
        if "ao_grad" in tabs:
            tabs["ao_grad"] = jnp.moveaxis(tabs["ao_grad"], 1, 0)
        return _exc_vxc_tabs(xc, dm, tabs, polarized, xcparams)

    from ..ops.chunks import map_reduce_blocks
    exc, V = map_reduce_blocks(jax.checkpoint(body_chunk), tabs_in, ng,
                               chunk)
    return exc, 0.5 * (V + jnp.swapaxes(V, -1, -2))


def vxc_matrix(xc, dm, grid_theta, polarized: bool, xcparams=None):
    """V_xc = d E_xc / d dm, symmetrized (E_xc(dm) as written only
    represents the density for symmetric dm — e.g. grad n = 2 sum_ij dm_ij
    grad(phi_i) phi_j — so the raw gradient carries a spurious
    antisymmetric part; the derivative along the symmetric subspace is the
    symmetrization). Generalizes reference base_xc.py:39-125 to every
    family. Computed by the closed-form assembly (exc_vxc); vxc_matrix_ad
    is the brute-force jax.grad oracle it is tested against."""
    return exc_vxc(xc, dm, grid_theta, polarized, xcparams)[1]


def vxc_matrix_ad(xc, dm, grid_theta, polarized: bool, xcparams=None):
    """Brute-force V_xc = jax.grad(exc_energy) — test oracle for exc_vxc
    and the path of last resort for exotic density dependencies."""
    g = jax.grad(
        lambda d: exc_energy(xc, d, grid_theta, polarized, xcparams))(dm)
    return 0.5 * (g + jnp.swapaxes(g, -1, -2))
