"""Integrity probes for the derived dense-ERI layouts (eri_k / eri_j).

The axon TPU demonstrably miscompiles one fused f64 op class (the
add+transpose symmetrization inside scf/jk.expand_k_tensor at >=~98 MB,
distilled in tools/expand_k_repro.py), so every derived dense layout is
guarded by runtime probes before the engine is allowed to contract
against it:

  expand_k (probe_expand_k):
    1. expand the exchange-layout tensor on device from the trusted
       quartet blocks;
    2. checksum K against the blocks path with a fixed symmetric probe
       density (two *device* paths agreeing does not prove either is
       right, so)
    3. when the nao^4 tensor is host-affordable AND (the paths disagree
       OR force_abs), a host-numpy oracle (expand_k_tensor_host)
       arbitrates: device tensor kept (verdict True), replaced by the
       host-expanded tensor, or dropped entirely (blocks path serves).
       J from the blocks is checked against the same oracle (warn-only:
       the bench/energy gate rejects the mode if J is bad).

  expand_j (maybe_expand_j):
    derive the Coulomb layout by a BARE transpose of a trusted eri_k
    (the miscompiling fused add+transpose class is not involved), probe
    it against the blocks J, and on success evict the quartet-block
    device buffers to host copies (HBM hygiene: eri_k + eri_j + blocks
    + f32 phase copies exceeded HBM on the first eri_j bench).

Factored out of scf/qccalc.py (VERDICT r3 item 10) so the
probe/arbitrate/evict state machine is directly unit-testable
(tests/test_integrity.py) — it was previously interleaved through the
1,600-line driver.
"""
from __future__ import annotations

import os
import time as _time
import warnings as _warnings
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.logger import log

# nao^4 f64 bytes above which the host-numpy oracle is unaffordable
HOST_ORACLE_BYTES = 4 * 1024 ** 3


def expand_k_into(theta, bmeta, jkm, fn_cache: dict):
    """Expand theta['eri_k'] on device from the quartet blocks (cached
    jitted expansion in fn_cache['expand_k'])."""
    from .jk import expand_k_tensor, theta_blocks
    fn = fn_cache.get("expand_k")
    if fn is None:
        fn = jax.jit(lambda bl: expand_k_tensor(bmeta, jkm, bl))
        fn_cache["expand_k"] = fn
    _t0 = _time.perf_counter()
    theta["eri_k"] = fn(theta_blocks(theta, jkm))
    log(f"theta[eri_k] expanded in {_time.perf_counter() - _t0:.1f}s")


def host_expand_k_into(theta, bmeta, jkm):
    """Host-numpy expansion (the arbitration oracle itself) — used when
    the device expansion is already known-bad for this calc."""
    from .jk import expand_k_tensor_host, theta_blocks
    _t0 = _time.perf_counter()
    theta["eri_k"] = jnp.asarray(expand_k_tensor_host(
        bmeta, jkm, [np.asarray(b) for b in theta_blocks(theta, jkm)]))
    log(f"theta[eri_k] host-expanded (device expansion known-bad) in "
        f"{_time.perf_counter() - _t0:.1f}s")


def probe_expand_k(theta, bmeta, jkm, nao: int, *,
                   force_abs: bool = False,
                   host_limit_bytes: int = HOST_ORACLE_BYTES
                   ) -> bool:
    """Checksum/arbitrate theta['eri_k'] in place.

    Returns the device-expansion verdict: True (trusted — the absolute
    oracle passed, or the relative blocks-path probe passed without the
    oracle being warranted: the known axon miscompile class fails it at
    rel ~0.5), or False (failed; theta now carries the host-expanded
    tensor or no eri_k at all). Mutates theta.
    """
    from .jk import expand_k_tensor_host, jk_from_blocks, theta_blocks
    rng = np.random.default_rng(0)
    probe_np = rng.standard_normal((nao, nao))
    probe_np = probe_np + probe_np.T
    probe = jnp.asarray(probe_np)
    k_dev = np.asarray(jnp.einsum("ijkl,kl->ij", theta["eri_k"], probe))
    j_blk, k_blk = jk_from_blocks(bmeta, jkm, theta_blocks(theta, jkm),
                                  probe, want_j=True, want_k=True)
    j_blk, k_blk = np.asarray(j_blk), np.asarray(k_blk)
    rel = (np.abs(k_dev - k_blk).max()
           / max(np.abs(k_blk).max(), 1e-300))
    # the absolute host oracle costs ~100 s/GB of first-touch page
    # faults on this class of VM (see bench.py's malloc tunables), so by
    # default it arbitrates only when the device paths disagree;
    # DQC_TPU_JK_ORACLE=1 (set by bench.py) forces it.
    if nao ** 4 * 8 > host_limit_bytes or not (rel > 1e-10 or force_abs):
        if rel > 1e-10:
            _warnings.warn(
                f"exchange-layout ERI expansion disagrees with the "
                f"blocks-path K (rel {rel:.2e}); falling back to the "
                f"blocks path")
            del theta["eri_k"]
            return False
        log(f"theta[eri_k] probe ok (paths rel {rel:.1e})")
        return True
    g_host = expand_k_tensor_host(
        bmeta, jkm, [np.asarray(b) for b in theta_blocks(theta, jkm)])
    k_ref = np.einsum("ijkl,kl->ij", g_host, probe_np)
    scale_k = max(np.abs(k_ref).max(), 1e-300)
    e_dev = np.abs(k_dev - k_ref).max() / scale_k
    e_blk = np.abs(k_blk - k_ref).max() / scale_k
    # exchange layout G_K[a,c,b,d] = (ab|cd): J_ij = G_K[i,k,j,l] D_kl
    j_ref = np.einsum("ikjl,kl->ij", g_host, probe_np)
    e_j = (np.abs(j_blk - j_ref).max()
           / max(np.abs(j_ref).max(), 1e-300))
    if e_j > 1e-10:
        _warnings.warn(
            f"blocked J contraction disagrees with the host oracle "
            f"(rel {e_j:.2e}) — Coulomb builds on this backend are "
            f"suspect")
    if e_dev <= 1e-10:
        log(f"theta[eri_k] probe ok (oracle rel {e_dev:.1e})")
        return True
    theta["eri_k"] = jnp.asarray(g_host)
    k3 = np.asarray(jnp.einsum("ijkl,kl->ij", theta["eri_k"], probe))
    e_hst = np.abs(k3 - k_ref).max() / scale_k
    _warnings.warn(
        f"device-expanded exchange ERI failed the host oracle "
        f"(dev {e_dev:.2e}, blocks {e_blk:.2e}, host-expanded "
        f"{e_hst:.2e}); "
        + ("using the host-expanded tensor" if e_hst <= 1e-10
           else "dropping eri_k"))
    if e_hst > 1e-10:
        del theta["eri_k"]
        if e_blk > 1e-10:
            _warnings.warn(
                "blocks-path K also disagrees with the host oracle — "
                "exchange on this backend is untrustworthy")
    return False


def maybe_expand_j(theta, bmeta, jkm, nao: int, *, bytes_limit: int,
                   fn_cache: dict) -> Tuple[dict, Optional[dict]]:
    """Derive the Coulomb-layout dense ERI from a trusted eri_k:
    G_J = eri_k.transpose(0,2,1,3), so J = einsum("ijkl,kl->ij") is a
    flat trailing-axis MXU matvec like K (the per-iteration blocks-J is
    a batched-tiny-einsum path, ~2-3x slower on the axon TPU). Bare
    transpose only — the fused add+transpose class that XLA:TPU
    miscompiles (scf/jk.expand_k_tensor) is not involved — plus a
    device-side probe against the blocks J as defense in depth.

    Returns (theta, jkb_host): jkb_host is the dict of evicted
    quartet-block host copies when both dense layouts are trusted
    (None if nothing was evicted).
    """
    if "eri_k" not in theta or "jkb0" not in theta:
        return theta, None
    if nao ** 4 * 8 > bytes_limit:
        return theta, None
    from .jk import jk_from_blocks, theta_blocks
    _t0 = _time.perf_counter()
    fn = fn_cache.get("expand_j")
    if fn is None:
        fn = jax.jit(lambda g: jnp.transpose(g, (0, 2, 1, 3)))
        fn_cache["expand_j"] = fn
    eri_j = fn(theta["eri_k"])
    rng = np.random.default_rng(1)
    probe_np = rng.standard_normal((nao, nao))
    probe = jnp.asarray(probe_np + probe_np.T)
    j_dev = np.asarray(jnp.einsum("ijkl,kl->ij", eri_j, probe))
    j_blk, _ = jk_from_blocks(bmeta, jkm, theta_blocks(theta, jkm),
                              probe, want_j=True, want_k=False)
    j_blk = np.asarray(j_blk)
    rel = (np.abs(j_dev - j_blk).max()
           / max(np.abs(j_blk).max(), 1e-300))
    if rel > 1e-10:
        _warnings.warn(
            f"Coulomb-layout ERI transpose disagrees with the blocks "
            f"J (rel {rel:.2e}); keeping the blocks path")
        return theta, None
    theta["eri_j"] = eri_j
    # HBM hygiene: with both dense layouts trusted, the quartet blocks
    # are only fallback/probe material — evict their device buffers (the
    # first eri_j bench OOM'd the TPU: eri_k + eri_j + blocks + the f32
    # phase copies exceeded HBM). Host copies go back to the caller for
    # probes and safe-mode retries; phase theta dicts must NOT carry
    # numpy leaves (jit would re-transfer per call), so the keys are
    # removed outright.
    jkb = {k: np.asarray(v) for k, v in theta.items()
           if k.startswith("jkb")}
    if jkb:
        theta = {k: v for k, v in theta.items()
                 if not k.startswith("jkb")}
    log(f"theta[eri_j] derived in {_time.perf_counter() - _t0:.1f}s "
        f"(probe rel {rel:.1e}; {len(jkb)} block tensors evicted "
        f"to host)")
    return theta, (jkb or None)


def maybe_build_ds(theta, nao: int, fn_cache: dict,
                   bytes_limit: Optional[int] = None) -> None:
    """Build + probe the double-single (hi/lo f32) planes of the
    exchange-layout ERI for the fused Pallas J+K kernel (pallas_jk) —
    the f64-phase hot-loop path (~20x the XLA emulated-f64 GEMVs on the
    axon v5e, tools/pallas_jk_lab.py).

    Probe discipline matches the other derived layouts: a brand-new
    Mosaic kernel on a backend that has already demonstrably
    miscompiled one fused-f64 op class (scf/jk.expand_k_tensor) runs a
    one-time arbitration against the trusted f64 einsum contraction of
    eri_j before the planes enter theta. Mutates theta in place."""
    from ..ops import pallas_jk
    if not pallas_jk.enabled() or "eri_k" not in theta \
            or "eri_dsh" in theta:
        return
    if bytes_limit is None:
        bytes_limit = int(os.environ.get(
            "DQC_TPU_PALLAS_JK_BYTES", 4 * 1024 ** 3))
    A, B, L = pallas_jk.plane_shapes(nao)
    if 2 * nao * A * B * L * 4 > bytes_limit:
        return
    _t0 = _time.perf_counter()
    fn = fn_cache.get("ds_planes")
    if fn is None:
        fn = jax.jit(pallas_jk.ds_planes)
        fn_cache["ds_planes"] = fn
    try:
        hi, lo = fn(theta["eri_k"])
        rng = np.random.default_rng(3)
        probe_np = rng.standard_normal((nao, nao))
        probe = jnp.asarray(probe_np + probe_np.T)
        jk_fn = fn_cache.get("ds_jk")
        if jk_fn is None:
            jk_fn = jax.jit(pallas_jk.ds_jk_kplanes)
            fn_cache["ds_jk"] = jk_fn
        j_ds, k_ds = jk_fn(hi, lo, probe)
        j_ref = jnp.einsum("ikjl,kl->ij", theta["eri_k"], probe)
        k_ref = jnp.einsum("ijkl,kl->ij", theta["eri_k"], probe)
        rel_j = float(jnp.abs(j_ds - j_ref).max()
                      / jnp.maximum(jnp.abs(j_ref).max(), 1e-300))
        rel_k = float(jnp.abs(k_ds - k_ref).max()
                      / jnp.maximum(jnp.abs(k_ref).max(), 1e-300))
    except Exception as ex:  # noqa: BLE001 — Mosaic/compile faults
        _warnings.warn(
            f"DS J/K plane build failed on this backend "
            f"({type(ex).__name__}: {str(ex)[:120]}); keeping the "
            f"einsum J/K path")
        return
    if max(rel_j, rel_k) > 1e-10:
        _warnings.warn(
            f"DS pallas J/K kernel disagrees with the f64 einsum "
            f"contraction (rel J {rel_j:.2e}, K {rel_k:.2e}); keeping "
            f"the einsum path")
        return
    theta["eri_dsh"] = hi
    theta["eri_dsl"] = lo
    log(f"theta[eri_ds*] planes built in "
        f"{_time.perf_counter() - _t0:.1f}s (probe rel J {rel_j:.1e} "
        f"K {rel_k:.1e})")


def maybe_build_dsg(theta, fn_cache: dict) -> None:
    """Build + probe the transposed double-single AO-table planes for
    the DS grid-XC Pallas kernels (ops/pallas_xc) — the f64-phase grid
    chain (density GEMMs + vxc assembly) at VPU double-single speed
    instead of XLA's emulated-f64 skinny GEMMs.

    Probe discipline matches the other derived layouts: both kernels
    are arbitrated on-device against the f64 einsum chain (density via
    xc.integrate.density_from_tables, assembly via _vxc_assemble) on a
    random symmetric dm / random pointwise potentials before the planes
    enter theta. Forward-only derived data: run()-materialized theta
    only (f32 copy drops it, adjoint pops it). Mutates theta."""
    from ..ops import pallas_xc
    grid = theta.get("grid")
    if not pallas_xc.enabled() or not isinstance(grid, dict) \
            or "ao" not in grid or "ao_grad" not in grid \
            or grid.get("family") != 2 or "dsg" in grid:
        return
    ng, nao = grid["ao"].shape
    if nao > 128:
        return
    from ..xc.integrate import XC_CHUNK_ELEMS
    if ng > max(65536, XC_CHUNK_ELEMS // max(nao, 1)):
        return
    ag = grid["ao_grad"]
    if not (ag.ndim == 3 and ag.shape[0] == 3):
        return
    _t0 = _time.perf_counter()
    try:
        fn = fn_cache.get("dsg_planes")
        if fn is None:
            fn = jax.jit(pallas_xc.grid_planes)
            fn_cache["dsg_planes"] = fn
        planes = fn(grid["ao"], ag)
        rng = np.random.default_rng(17)
        probe_np = rng.standard_normal((nao, nao))
        probe = jnp.asarray(probe_np + probe_np.T)
        dens_fn = fn_cache.get("dsg_dens")
        if dens_fn is None:
            dens_fn = jax.jit(
                lambda pl_, dm: pallas_xc.ds_dens_gga(pl_, dm, ng))
            fn_cache["dsg_dens"] = dens_fn
        rho, gdot = dens_fn(planes, probe)
        b = grid["ao"] @ probe
        rho_ref = jnp.einsum("gi,gi->g", b, grid["ao"])
        gb = jnp.einsum("dgi,ij->dgj", ag, probe)
        gd_ref = 2.0 * jnp.einsum("dgi,gi->dg", gb, grid["ao"])
        rel_r = float(jnp.abs(rho - rho_ref).max()
                      / jnp.maximum(jnp.abs(rho_ref).max(), 1e-300))
        rel_g = float(jnp.abs(gdot - gd_ref).max()
                      / jnp.maximum(jnp.abs(gd_ref).max(), 1e-300))
        vr = jnp.asarray(rng.standard_normal(ng))
        vg = jnp.asarray(rng.standard_normal((3, ng)))
        vxc_fn = fn_cache.get("dsg_vxc")
        if vxc_fn is None:
            def _vxc(pl_, vr_, vg_):
                wth, wtl = pallas_xc.build_wt(pl_, vr_, vg_, ng)
                return pallas_xc.ds_vxc_gga(pl_, wth, wtl, nao)
            vxc_fn = jax.jit(_vxc)
            fn_cache["dsg_vxc"] = vxc_fn
        v = vxc_fn(planes, vr, vg)
        from ..xc.integrate import _vxc_assemble
        v_ref = _vxc_assemble(
            {"rho": vr, "grad": vg},
            {"ao": grid["ao"], "ao_grad": ag})
        rel_v = float(jnp.abs(v - v_ref).max()
                      / jnp.maximum(jnp.abs(v_ref).max(), 1e-300))
    except Exception as ex:  # noqa: BLE001 — Mosaic/compile faults
        _warnings.warn(
            f"DS grid-XC plane build failed on this backend "
            f"({type(ex).__name__}: {str(ex)[:120]}); keeping the "
            f"einsum grid chain")
        return
    if max(rel_r, rel_g, rel_v) > 1e-10:
        _warnings.warn(
            f"DS grid-XC kernels disagree with the f64 einsum chain "
            f"(rel rho {rel_r:.2e}, grad {rel_g:.2e}, vxc {rel_v:.2e});"
            f" keeping the einsum grid chain")
        return
    theta["grid"] = dict(grid)
    theta["grid"]["dsg"] = planes
    log(f"theta[grid.dsg] planes built in "
        f"{_time.perf_counter() - _t0:.1f}s (probe rel rho {rel_r:.1e}"
        f" grad {rel_g:.1e} vxc {rel_v:.1e})")


def maybe_build_ozaki(theta, fn_cache: dict) -> None:
    """Cache bf16 Ozaki slices of the constant AO tables for the
    grid-density GEMMs (ops/ozaki.py) — ~2.5x the XLA emulated-f64
    (ng,nao)@(nao,nao) products on the axon v5e. Forward-only derived
    data: run()-materialized theta only (adjoint pops it). Probed
    against the f64 einsum before entering theta. Mutates theta."""
    from ..ops import ozaki
    grid = theta.get("grid")
    if not ozaki.enabled() or not isinstance(grid, dict) \
            or "ao" not in grid or "ozk" in grid:
        return
    ng, nao = grid["ao"].shape
    # must match xc/integrate's unchunked-path condition (the chunked
    # map cannot carry the slice pytree)
    from ..xc.integrate import XC_CHUNK_ELEMS
    if ng > max(65536, XC_CHUNK_ELEMS // max(nao, 1)):
        return
    w, S, U, _ = ozaki.params_for_k(nao)
    _t0 = _time.perf_counter()
    try:
        key = f"ozk_slices_{w}_{S}"
        fn = fn_cache.get(key)
        if fn is None:
            fn = jax.jit(lambda a: ozaki.row_slices(a, w, S))
            fn_cache[key] = fn
        ozk = {"ao": fn(grid["ao"])}
        ag = grid.get("ao_grad")
        if ag is not None and ag.ndim == 3 and ag.shape[0] == 3:
            for d in range(3):
                ozk[f"ag{d}"] = fn(ag[d])
        # probe: sliced matmul vs the f64 einsum on a random dm
        rng = np.random.default_rng(11)
        probe_np = rng.standard_normal((nao, nao))
        probe = jnp.asarray(probe_np + probe_np.T)
        dm_sl = ozaki.col_slices(probe, w, S)
        b = ozaki.matmul_sliced(ozk["ao"][0], ozk["ao"][1],
                                dm_sl[0], dm_sl[1], w, U)
        b_ref = grid["ao"] @ probe
        rel = float(jnp.abs(b - b_ref).max()
                    / jnp.maximum(jnp.abs(b_ref).max(), 1e-300))
    except Exception as ex:  # noqa: BLE001
        _warnings.warn(
            f"Ozaki slice build failed on this backend "
            f"({type(ex).__name__}: {str(ex)[:120]}); keeping the "
            f"einsum grid GEMMs")
        return
    if rel > 1e-10:
        _warnings.warn(
            f"Ozaki sliced GEMM disagrees with the f64 einsum "
            f"(rel {rel:.2e}); keeping the einsum grid GEMMs")
        return
    theta["grid"] = dict(grid)
    theta["grid"]["ozk"] = ozk
    log(f"theta[grid.ozk] slices built in "
        f"{_time.perf_counter() - _t0:.1f}s (probe rel {rel:.1e})")
