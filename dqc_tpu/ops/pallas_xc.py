"""Fused double-single (DS) grid-XC Pallas TPU kernels.

After the DS J/K kernel (ops/pallas_jk.py) the f64 SCF iteration at
nao=114 is grid-chain bound: the (ng,nao)@(nao,nao) density GEMMs
(~94 ms) and the (nao,ng)@(ng,nao) vxc assembly (~70 ms) run on XLA's
emulated-f64 path at 0.05-0.15 TF/s for these skinny shapes (CLAUDE.md
rate table).  The Ozaki-scheme MXU route (ops/ozaki.py) is 2.5x per
GEMM but its round()-sliced map carries a ~4e-9 staircase that floors
the DIIS trajectory, so it lost end-to-end.  These kernels use the same
double-single machinery the J/K kernel proved on this chip — smooth
hi/lo f32 splits, Dekker TwoProd, TwoSum compensated accumulation,
exact f64 epilogue — mapped onto the VPU:

  ds_dens_gga:  rho[g]    = sum_ij dm[ij] phi_i(g) phi_j(g)
                gdot[d,g] = 2 sum_ij dm[ij] dphi_d,i(g) phi_j(g)
  ds_vxc_gga:   V[i,j]    = sum_g WT[i,g] phi_j(g)
                (WT = vrho*phi_i + 2 sum_d vgrad_d * dphi_d,i,
                 built in f64 by build_wt)

Layout: the AO tables are stored TRANSPOSED — (nao_pad sublanes,
ngrid lanes) — so every per-basis-function access is a cheap sublane
slice; the per-row dm coefficient columns are materialized by an exact
masked-iota lane selection (one nonzero per row, so the plain lane sum
is rounding-free).  No lane extractions, no in-kernel transposes.

TPU hazards encoded (CLAUDE.md): index-map constants cast to int32
(x64 i64 legalization failure), in-bounds static index maps (OOB wedges
the worker), scratch sized for the 16 MB VMEM budget, output sublane
dims %8.

FORWARD-ONLY: no AD rules; the planes live only in run()-materialized
theta (integrity.maybe_build_dsg), are dropped from the f32 phase copy
(qccalc._theta32) and popped by the adjoint (scf/adjoint.py); traced
gradient programs rebuild theta without them and take the einsum path.

Reference parity: the contractions are the density/vxc grid matmuls of
dqc/hamilton/hcgto.py:371-495 (dm2densinfo / _get_vxc_from_potinfo);
the reference has no accelerated path for them.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

i32 = jnp.int32
f32 = jnp.float32
f64 = jnp.float64

GBLK = 512         # grid-axis tile (lanes) per kernel step
_SPLIT = 4097.0    # Dekker split constant for f32 (2^12 + 1)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def enabled() -> bool:
    """Whether the DS grid-XC path may be used on this backend."""
    if os.environ.get("DQC_TPU_PALLAS_XC", "1") == "0":
        return False
    return jax.default_backend() == "tpu"


def _interp(flag):
    """Resolve the per-call interpret flag. DQC_TPU_PALLAS_XC_INTERPRET=1
    forces interpreter mode everywhere — CPU-side integration tests
    exercise the full dsg path with it (interpret evaluates the f32
    chain with excess precision, so it validates plumbing, not the
    double-single arithmetic; see tests/test_pallas_jk.py)."""
    if flag is not None:
        return flag
    return os.environ.get("DQC_TPU_PALLAS_XC_INTERPRET") == "1"


def plane_shapes(ng: int, nao: int):
    """(P, Gpad) padded sublane/lane sizes for the transposed tables."""
    return _round_up(max(nao, 8), 8), _round_up(ng, GBLK)


def grid_planes(ao, ao_grad=None):
    """Transposed, padded hi/lo f32 planes of the AO tables.

    ao: (ng, nao) f64; ao_grad: (3, ng, nao) f64 or None.
    Zero padding everywhere (products with the dead rows/lanes vanish;
    the kernels are forward-only so the reverse-mode NaN rule does not
    apply). Jit-able."""
    ng, nao = ao.shape
    P, Gpad = plane_shapes(ng, nao)

    def pad_t(x):
        t = jnp.zeros((P, Gpad), f64).at[:nao, :ng].set(x.T)
        hi = t.astype(f32)
        lo = (t - hi.astype(f64)).astype(f32)
        return hi, lo

    out = {}
    out["aoTh"], out["aoTl"] = pad_t(ao)
    if ao_grad is not None:
        hs, ls = zip(*(pad_t(ao_grad[d]) for d in range(3)))
        out["agTh"] = jnp.stack(hs)
        out["agTl"] = jnp.stack(ls)
    return out


def _dm_splits(dm, P):
    """Zero-padded (P, 128) Dekker-split planes of dm (requires
    nao <= 128: the column-selection trick reads lane j for sublane j)."""
    nao = dm.shape[0]
    assert nao <= 128, nao
    d = jnp.zeros((P, 128), f64).at[:nao, :nao].set(dm)
    dh = d.astype(f32)
    c = dh * f32(_SPLIT)
    d1 = c - (c - dh)
    d2 = dh - d1
    dl = (d - dh.astype(f64)).astype(f32)
    return dh, d1, d2, dl


def ds_dens_reference(planes, dm, ng: int):
    """Pure-jnp f64 oracle for ds_dens_gga from the same planes."""
    aoT = planes["aoTh"].astype(f64) + planes["aoTl"].astype(f64)
    agT = planes["agTh"].astype(f64) + planes["agTl"].astype(f64)
    nao = dm.shape[0]
    dmp = jnp.zeros((aoT.shape[0],) * 2, f64).at[:nao, :nao].set(dm)
    bT = jnp.einsum("ij,ig->jg", dmp, aoT)
    rho = jnp.einsum("jg,jg->g", bT, aoT)
    gbT = jnp.einsum("ij,dig->djg", dmp, agT)
    gdot = 2.0 * jnp.einsum("djg,jg->dg", gbT, aoT)
    return rho[:ng], gdot[:, :ng]


def ds_vxc_reference(planes, wth, wtl):
    """Pure-jnp f64 oracle for ds_vxc_gga."""
    aoT = planes["aoTh"].astype(f64) + planes["aoTl"].astype(f64)
    wt = wth.astype(f64) + wtl.astype(f64)
    return jnp.einsum("ig,jg->ij", wt, aoT)


def build_wt(planes, vr, vg, ng: int):
    """f64 pointwise-potential row tables WT[i,g] = vr[g] phi_i(g)
    + 2 sum_d vg[d,g] dphi_d,i(g), split to hi/lo f32 planes.

    vr/vg are the pointwise adjoints with dvol folded in (the vbar of
    xc/integrate._vxc_assemble); they are zero-padded on the grid axis
    so the dead lanes contribute exactly zero to V."""
    P, Gpad = planes["aoTh"].shape
    vrp = jnp.zeros((Gpad,), f64).at[:ng].set(vr)
    ao = planes["aoTh"].astype(f64) + planes["aoTl"].astype(f64)
    wt = vrp[None, :] * ao
    if vg is not None:
        vgp = jnp.zeros((3, Gpad), f64).at[:, :ng].set(vg)
        ag = planes["agTh"].astype(f64) + planes["agTl"].astype(f64)
        wt = wt + 2.0 * jnp.einsum("dg,dig->ig", vgp, ag)
    hi = wt.astype(f32)
    lo = (wt - hi.astype(f64)).astype(f32)
    return hi, lo


def _dekker(x):
    c = x * f32(_SPLIT)
    x1 = c - (c - x)
    return x1, x - x1


def ds_dens_gga(planes, dm, ng: int, *, interpret=None):
    """(rho (ng,), gdot (3, ng)) in f64 from the transposed DS planes.

    One pass over the four AO tables per dm: the inner fori loop
    accumulates the four B^T = dm^T AO^T products (TwoProd + TwoSum),
    the finishing step forms the diagonal bilinear contractions with a
    compensated sublane tree; the (hi, lo) per-point pairs are folded in
    an exact f64 epilogue. Forward-only."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = _interp(interpret)
    P, Gpad = planes["aoTh"].shape
    NG = Gpad // GBLK
    nao = dm.shape[0]
    dh, d1, d2, dl = _dm_splits(dm, P)

    def kernel(aoh, aol, agh, agl, dmh, dm1, dm2, dml, out_ref, acc):
        acc[:] = jnp.zeros_like(acc)
        sub = jax.lax.broadcasted_iota(i32, (P, 128), 0)
        lane = jax.lax.broadcasted_iota(i32, (P, 128), 1)
        eye = sub == lane

        def colify(row):
            # (1,128) row -> (P,1) column: exact (one nonzero per row)
            bc = jnp.broadcast_to(row, (P, 128))
            return jnp.sum(jnp.where(eye, bc, f32(0.0)), axis=1,
                           keepdims=True)

        def body(i, carry):
            ch = colify(dmh[pl.ds(i, 1), :])
            c1 = colify(dm1[pl.ds(i, 1), :])
            c2 = colify(dm2[pl.ds(i, 1), :])
            cl = colify(dml[pl.ds(i, 1), :])

            def fma(slot, vh, vl):
                v1, v2 = _dekker(vh)
                p = ch * vh
                e = ((c1 * v1 - p) + c1 * v2 + c2 * v1) + c2 * v2
                e = e + (ch * vl + cl * vh + cl * vl)
                s = acc[2 * slot]
                z = s + p
                bp = z - s
                err = (s - (z - bp)) + (p - bp)
                acc[2 * slot] = z
                acc[2 * slot + 1] = acc[2 * slot + 1] + err + e

            fma(0, aoh[pl.ds(i, 1), :], aol[pl.ds(i, 1), :])
            for d in range(3):
                fma(1 + d, agh[d, pl.ds(i, 1), :],
                    agl[d, pl.ds(i, 1), :])
            return carry

        jax.lax.fori_loop(0, nao, body, 0)

        ah = aoh[:]
        al = aol[:]
        t1, t2 = _dekker(ah)
        for slot in range(4):
            bs = acc[2 * slot]
            be = acc[2 * slot + 1]
            b1, b2 = _dekker(bs)
            p = bs * ah
            e = ((b1 * t1 - p) + b1 * t2 + b2 * t1) + b2 * t2
            e = e + (bs * al + be * ah + be * al)
            s = p[0:8]
            c = e[0:8]
            for t in range(1, P // 8):
                tt = p[8 * t:8 * t + 8]
                z = s + tt
                bp = z - s
                err = (s - (z - bp)) + (tt - bp)
                s = z
                c = c + (err + e[8 * t:8 * t + 8])
            for half in (4, 2, 1):
                aa = s[:half]
                bb = s[half:2 * half]
                z = aa + bb
                bp = z - aa
                err = (aa - (z - bp)) + (bb - bp)
                s = z
                c = c[:half] + c[half:2 * half] + err
            # rows of the packed (8, GBLK) output block:
            # [rho_h, rho_l, g0h, g0l, g1h, g1l, g2h, g2l]
            out_ref[2 * slot:2 * slot + 1, :] = s
            out_ref[2 * slot + 1:2 * slot + 2, :] = c

    outs = pl.pallas_call(
        kernel,
        grid=(NG,),
        in_specs=[
            pl.BlockSpec((P, GBLK), lambda g: (i32(0), g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, GBLK), lambda g: (i32(0), g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, P, GBLK), lambda g: (i32(0), i32(0), g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, P, GBLK), lambda g: (i32(0), i32(0), g),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec((P, 128), lambda g: (i32(0), i32(0)),
                          memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec((8, GBLK), lambda g: (i32(0), g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, Gpad), f32),
        scratch_shapes=[pltpu.VMEM((8, P, GBLK), f32)],
        interpret=interpret,
    )(planes["aoTh"], planes["aoTl"], planes["agTh"], planes["agTl"],
      dh, d1, d2, dl)

    def fold(h, l):
        return (h.astype(f64) + l.astype(f64))[:ng]

    rho = fold(outs[0], outs[1])
    gdot = 2.0 * jnp.stack([fold(outs[2], outs[3]),
                            fold(outs[4], outs[5]),
                            fold(outs[6], outs[7])])
    return rho, gdot


def _pick_jb(P: int) -> int:
    """Largest divisor of P with the kernel-B VMEM residents
    (acc + output block, 4*jb*P*128 f32 bytes) under ~6 MB."""
    budget = 6 * 1024 * 1024
    best = 1
    for jb in range(1, P + 1):
        if P % jb == 0 and 4 * jb * P * 128 * 4 <= budget:
            best = jb
    return best


def ds_vxc_gga(planes, wth, wtl, nao: int, *, interpret=None):
    """Raw (unsymmetrized) V[i,j] = sum_g WT[i,g] phi_j(g) in f64.

    Grid: (P/jb row sweeps, NG grid blocks); each step broadcasts jb
    AO rows over the WT tile with TwoProd and accumulates the 128-lane
    groups with TwoSum into a VMEM accumulator; the lane fold is an
    exact f64 epilogue. Forward-only."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = _interp(interpret)
    P, Gpad = planes["aoTh"].shape
    NG = Gpad // GBLK
    jb = _pick_jb(P)
    JB = P // jb

    def kernel(wh_ref, wl_ref, aoh, aol, vh_ref, vl_ref, acc):
        g = pl.program_id(1)
        ng_ = pl.num_programs(1)

        @pl.when(g == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        wh = wh_ref[:]
        wl = wl_ref[:]
        w1, w2 = _dekker(wh)
        jbi = pl.program_id(0)
        for jj in range(jb):
            j = jbi * jb + jj
            r_h = aoh[pl.ds(j, 1), :]
            r_l = aol[pl.ds(j, 1), :]
            r1, r2 = _dekker(r_h)
            p = wh * r_h
            e = ((w1 * r1 - p) + w1 * r2 + w2 * r1) + w2 * r2
            e = e + (wh * r_l + wl * r_h + wl * r_l)
            for ci in range(GBLK // 128):
                s = acc[0, jj]
                tt = p[:, 128 * ci:128 * (ci + 1)]
                z = s + tt
                bp = z - s
                err = (s - (z - bp)) + (tt - bp)
                acc[0, jj] = z
                acc[1, jj] = acc[1, jj] \
                    + (err + e[:, 128 * ci:128 * (ci + 1)])

        @pl.when(g == ng_ - 1)
        def _():
            vh_ref[:] = acc[0]
            vl_ref[:] = acc[1]

    v3h, v3l = pl.pallas_call(
        kernel,
        grid=(JB, NG),
        in_specs=[pl.BlockSpec((P, GBLK), lambda jbi, g: (i32(0), g),
                               memory_space=pltpu.VMEM)] * 4,
        out_specs=[
            pl.BlockSpec((jb, P, 128), lambda jbi, g: (jbi, i32(0),
                                                       i32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((jb, P, 128), lambda jbi, g: (jbi, i32(0),
                                                       i32(0)),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((P, P, 128), f32)] * 2,
        scratch_shapes=[pltpu.VMEM((2, jb, P, 128), f32)],
        interpret=interpret,
    )(wth, wtl, planes["aoTh"], planes["aoTl"])

    vt = (v3h.astype(f64) + v3l.astype(f64)).sum(axis=-1)
    return vt.T[:nao, :nao]
