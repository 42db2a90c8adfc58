"""DS grid-XC Pallas kernels (ops/pallas_xc) — on-chip validation and
timing at production shape (ng~78k, nao=114: benzene B3LYP/def2-SVP).

Measures, against the XLA emulated-f64 einsum chain the production code
otherwise uses (xc/integrate.density_from_tables + _vxc_assemble):
  - ds_dens_gga:  rho + gdot (the 4 density GEMMs + dot products)
  - build_wt + ds_vxc_gga: the vxc assembly contractions

Timing through the axon tunnel: block_until_ready is a NO-OP — sync by
fetching one element (CLAUDE.md).

Usage: python tools/pallas_xc_lab.py [ng] [nao]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from dqc_tpu.ops import pallas_xc  # noqa: E402


def sync(x):
    return float(np.asarray(jnp.ravel(x)[:1])[0])


def main():
    ng = int(sys.argv[1]) if len(sys.argv) > 1 else 78336
    nao = int(sys.argv[2]) if len(sys.argv) > 2 else 114
    print(f"[xc_lab] ng={ng} nao={nao} backend={jax.default_backend()}",
          flush=True)
    rng = np.random.default_rng(0)
    ao = rng.standard_normal((ng, nao)) * np.exp(
        rng.uniform(-6, 2, (ng, nao)))
    ag = rng.standard_normal((3, ng, nao)) * np.exp(
        rng.uniform(-6, 2, (3, ng, nao)))
    dm = rng.standard_normal((nao, nao))
    dm = 0.5 * (dm + dm.T)
    vr = rng.standard_normal(ng)
    vg = rng.standard_normal((3, ng))

    ao_j = jnp.asarray(ao)
    ag_j = jnp.asarray(ag)
    dm_j = jnp.asarray(dm)
    vr_j = jnp.asarray(vr)
    vg_j = jnp.asarray(vg)

    t0 = time.time()
    planes = jax.jit(pallas_xc.grid_planes)(ao_j, ag_j)
    sync(planes["aoTh"])
    print(f"[xc_lab] planes built in {time.time()-t0:.1f}s", flush=True)

    # ---- density kernel -------------------------------------------
    dens_fn = jax.jit(lambda p, d: pallas_xc.ds_dens_gga(p, d, ng))
    t0 = time.time()
    rho, gdot = dens_fn(planes, dm_j)
    rho_np, gd_np = np.asarray(rho), np.asarray(gdot)
    print(f"[xc_lab] dens first call {time.time()-t0:.1f}s", flush=True)

    def dens_ref(aoj, agj, d):
        b = aoj @ d
        r = jnp.einsum("gi,gi->g", b, aoj)
        gb = jnp.einsum("dgi,ij->dgj", agj, d)
        gd = 2.0 * jnp.einsum("dgi,gi->dg", gb, aoj)
        return r, gd

    ref_fn = jax.jit(dens_ref)
    t0 = time.time()
    r_ref, g_ref = ref_fn(ao_j, ag_j, dm_j)
    r_ref_np, g_ref_np = np.asarray(r_ref), np.asarray(g_ref)
    print(f"[xc_lab] einsum dens first call {time.time()-t0:.1f}s",
          flush=True)
    er = np.abs(rho_np - r_ref_np).max() / np.abs(r_ref_np).max()
    eg = np.abs(gd_np - g_ref_np).max() / np.abs(g_ref_np).max()
    print(f"[xc_lab] dens rel err: rho {er:.2e} gdot {eg:.2e}",
          flush=True)

    for name, fn, args in (("ds_dens", dens_fn, (planes, dm_j)),
                           ("einsum_dens", ref_fn, (ao_j, ag_j, dm_j))):
        sync(fn(*args)[0])
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            out = fn(*args)
        sync(out[0])
        dt = (time.perf_counter() - t0) / reps
        print(f"[xc_lab] {name}: {dt*1e3:.2f} ms", flush=True)

    # ---- vxc assembly ---------------------------------------------
    def vxc_ds(p, vr_, vg_):
        wth, wtl = pallas_xc.build_wt(p, vr_, vg_, ng)
        return pallas_xc.ds_vxc_gga(p, wth, wtl, nao)

    vxc_fn = jax.jit(vxc_ds)
    t0 = time.time()
    v = vxc_fn(planes, vr_j, vg_j)
    v_np = np.asarray(v)
    print(f"[xc_lab] vxc first call {time.time()-t0:.1f}s", flush=True)

    def vxc_ref(aoj, agj, vr_, vg_):
        V = jnp.einsum("gi,g,gj->ij", aoj, vr_, aoj)
        V = V + 2.0 * jnp.einsum("dgi,dg,gj->ij", agj, vg_, aoj)
        return V

    vref_fn = jax.jit(vxc_ref)
    t0 = time.time()
    v_ref = np.asarray(vref_fn(ao_j, ag_j, vr_j, vg_j))
    print(f"[xc_lab] einsum vxc first call {time.time()-t0:.1f}s",
          flush=True)
    ev = np.abs(v_np - v_ref).max() / np.abs(v_ref).max()
    print(f"[xc_lab] vxc rel err: {ev:.2e}", flush=True)

    for name, fn, args in (
            ("ds_vxc", vxc_fn, (planes, vr_j, vg_j)),
            ("einsum_vxc", vref_fn, (ao_j, ag_j, vr_j, vg_j))):
        sync(fn(*args))
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            out = fn(*args)
        sync(out)
        dt = (time.perf_counter() - t0) / reps
        print(f"[xc_lab] {name}: {dt*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
