"""Direct-SCF J/K builds: stream Coulomb/exchange from Hermite factors
without materializing the nao^4 ERI tensor.

This is the TPU-native analog of integral-direct SCF (the reference can only
precompute the dense ERI or use DF, hcgto.py:127-135): per Fock build, the
canonical shell-pair quartet blocks are recomputed on the fly (Boys + MXU
contractions are cheap; HBM is the scarce resource) and contracted with the
density immediately. Peak memory is one class-quartet block (~MBs) instead
of nao^4 (~GBs).

Math: with G0 the canonical-unique quartet tensor (each (ab|cd) stored once
with diagonal weights as in ops.eri.eri_dense) and G = sum of its 8
permutation images,
    J = 2 (A + B) + transposes,   A = G0 contracted over its ket pair,
                                   B = G0 contracted over its bra pair
    K = sum over the 4 (bra-index x ket-index) pairings P_xy + P_xy^T
All contractions happen blockwise per (bra class-group, ket class-group).
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.eri import (HermiteFactor, TWO_PI_POW_2_5, _combine_index_sign,
                       hermite_factor_pair)
from ..ops.mcd import hermite_R_stacked
from ..ops.shellstruct import (BasisMeta, gather_pair_inputs, nsph,
                               tri_pair_classes)
from ..ops.chunks import map_blocks


def build_jk_meta(meta: BasisMeta, screened=None):
    """Host-side static structure for the streaming JK build."""
    if screened is not None:
        pcs = [pc for (pc, q) in screened]
    else:
        pcs = tri_pair_classes(meta)
    info = []
    for pc in pcs:
        A = meta.classes[pc.ca]
        B = meta.classes[pc.cb]
        rows = np.asarray(A.ao_starts)[pc.ia]
        cols = np.asarray(B.ao_starts)[pc.ib]
        diag = ((pc.ia == pc.ib) if pc.ca == pc.cb
                else np.zeros(pc.npair, dtype=bool))
        info.append({
            "pc": pc, "sa": nsph(A.l), "sb": nsph(B.l),
            "row0": rows, "col0": cols,
            "w": np.where(diag, 0.5, 1.0),
        })
    return info


def build_jk_factors(meta: BasisMeta, params, jk_meta):
    """Device-side Hermite factors (inside the theta build; reused across
    the SCF loop)."""
    facs = []
    for inf in jk_meta:
        inp = gather_pair_inputs(meta, params, inf["pc"])
        facs.append(hermite_factor_pair(inp))
    return facs


def _quartet_blocks(fac_p: HermiteFactor, fac_q: HermiteFactor,
                    sa: int, sb: int, sc: int, sd: int, block: int):
    """Yields the (np, sa, sb, nq, sc, sd) block for one class-group pair,
    chunked over the bra pair axis (materialized whole — sizes are MBs).

    The Hermite-index combination R_{H+G} is folded into the ket factor as
    a static 0/1 selection tensor contracted on the MXU:
        W[q,l,t,H,c] = sum_G [H+G==t] (-1)^|G| Hk[q,l,c,G]
        T1[b,k,q,H,c] = sum_{l,t} pref*R[b,k,q,l,t] W[q,l,t,H,c]
    Fancy-index gathers (R[..., IM]) run on the f64-emulated VPU gather path
    and materialize a (B,K1,Q,K2,nh1,nh2) intermediate in HBM — measured to
    dominate the J/K build; the matmul form does ~nht/nh2 more flops but
    entirely on the MXU."""
    IM, sign = _combine_index_sign(fac_p.L, fac_q.L)
    Ltot = fac_p.L + fac_q.L
    nh1, nh2 = IM.shape
    from ..ops.mcd import hermite_list
    nht = len(hermite_list(Ltot))
    SEL = np.zeros((nht, nh1, nh2))
    for H in range(nh1):
        for G in range(nh2):
            SEL[IM[H, G], H, G] = sign[G]
    # ket-side fold (tiny): (nq, l, t, H*c)
    W = jnp.einsum("tHG,qlcG->qltHc",
                   jnp.asarray(SEL, dtype=fac_q.H.dtype), fac_q.H)

    def body(args):
        Hb, pb, Pb = args["H"], args["p"], args["P"]
        p1 = pb[:, :, None, None]
        p2 = fac_q.p[None, None, :, :]
        theta = p1 * p2 / (p1 + p2)
        # per-component PQ (never materialize a (..., 3) array: minor-dim-3
        # layouts are pathological on TPU)
        PQ = tuple(Pb[:, :, None, None, d] - fac_q.P[None, None, :, :, d]
                   for d in range(3))
        pref = TWO_PI_POW_2_5 / (p1 * p2 * jnp.sqrt(p1 + p2))
        Rs = hermite_R_stacked(Ltot, theta, PQ, scale=pref)
        T1 = jnp.einsum("bkqlt,qltHc->bkqHc", Rs, W)
        return jnp.einsum("bkaH,bkqHc->baqc", Hb, T1)

    n = fac_p.H.shape[0]
    blk = map_blocks(body, {"H": fac_p.H, "p": fac_p.p, "P": fac_p.P},
                     n, block)
    nq = fac_q.H.shape[0]
    return blk.reshape(n, sa, sb, nq, sc, sd)


def _combo_block(ip, iq, same_group: bool, fac_p, fac_q, block: int):
    """Weighted canonical quartet block of one class-group combo:
    (np1, sa, sb, np2, sc, sd) with the diagonal/canonical weights folded
    in. Density-independent — this is the expensive part of a Fock build
    and the payload the blocked-JK mode caches in theta."""
    sa, sb = ip["sa"], ip["sb"]
    sc, sd = iq["sa"], iq["sb"]
    np1, np2 = len(ip["row0"]), len(iq["row0"])
    blk = _quartet_blocks(fac_p, fac_q, sa, sb, sc, sd, block)
    dt = blk.dtype
    w = (jnp.asarray(ip["w"], dtype=dt)[:, None]
         * jnp.asarray(iq["w"], dtype=dt)[None, :])
    if same_group:
        # in-graph masks (iota comparisons), not host constants
        w = (w * jnp.triu(jnp.ones((np1, np2), dtype=dt))
             * jnp.where(jnp.eye(np1, dtype=bool), 0.5, 1.0).astype(dt))
    return blk * w[:, None, None, :, None, None]


def _combo_contract(nao: int, ip, iq, blk, dmt, dmk,
                    want_j: bool, want_k: bool):
    """Density contractions of one combo's weighted quartet block.

    Returns (Jflat_add (nao*nao,) or None, K_add (ns,nao,nao) or None) —
    raw canonical-quartet contractions; the caller applies the
    2(A+A^T)/pairing-transpose symmetrizations after summing all combos.

    NOTE on indexing style: every gather/scatter uses only 1-D per-side
    index vectors (np*s elements). Quartet-sized index grids ((np*s)^2
    integers per class combo) embedded ~400 MB of constants into the XLA
    module and OOM-killed the remote TPU compiler."""
    ns = dmk.shape[0]
    dt = dmt.dtype   # dtype-polymorphic: f32 warm builds reuse this code
    blk = blk.astype(dt)
    sa, sb = ip["sa"], ip["sb"]
    sc, sd = iq["sa"], iq["sb"]
    np1, np2 = len(ip["row0"]), len(iq["row0"])

    # index grids (host, small: np*s each)
    ra = ip["row0"][:, None] + np.arange(sa)     # (np1, sa)
    rb = ip["col0"][:, None] + np.arange(sb)
    rc = iq["row0"][:, None] + np.arange(sc)
    rd = iq["col0"][:, None] + np.arange(sd)
    raf, rbf = jnp.asarray(ra.ravel()), jnp.asarray(rb.ravel())
    rcf, rdf = jnp.asarray(rc.ravel()), jnp.asarray(rd.ravel())

    Jadd = Kadd = None
    if want_j:
        Jadd = jnp.zeros((nao * nao,), dtype=dt)
        dq = dmt[jnp.asarray(rc)[:, :, None, None],
                 jnp.asarray(rd)[:, None, None, :]][:, :, 0, :]
        A = jnp.einsum("pabqcd,qcd->pab", blk, dq)
        dp = dmt[jnp.asarray(ra)[:, :, None, None],
                 jnp.asarray(rb)[:, None, None, :]][:, :, 0, :]
        B = jnp.einsum("pabqcd,pab->qcd", blk, dp)
        idx_ab = (ra[:, :, None] * nao + rb[:, None, :]).ravel()
        idx_cd = (rc[:, :, None] * nao + rd[:, None, :]).ravel()
        Jadd = Jadd.at[jnp.asarray(idx_ab)].add(A.ravel())
        Jadd = Jadd.at[jnp.asarray(idx_cd)].add(B.ravel())

    if want_k:
        Kadd = jnp.zeros((ns, nao, nao), dtype=dt)

        # gathered dm blocks for the 4 pairings, per spin; flat
        # row/col gathers keep index constants 1-D
        def dmg(r1f, s1, r2f, s2):
            return dmk[:, r1f, :][:, :, r2f].reshape(ns, np1, s1, np2, s2)
        P_ac = jnp.einsum("pabqcd,spbqd->spaqc", blk, dmg(rbf, sb, rdf, sd))
        P_ad = jnp.einsum("pabqcd,spbqc->spaqd", blk, dmg(rbf, sb, rcf, sc))
        P_bc = jnp.einsum("pabqcd,spaqd->spbqc", blk, dmg(raf, sa, rdf, sd))
        P_bd = jnp.einsum("pabqcd,spaqc->spbqd", blk, dmg(raf, sa, rcf, sc))
        for P, r1f, r2f in ((P_ac, raf, rcf), (P_ad, raf, rdf),
                            (P_bc, rbf, rcf), (P_bd, rbf, rdf)):
            n2s = P.shape[3] * P.shape[4]
            P2 = P.reshape(ns, -1, n2s)
            tmp = jnp.zeros((ns, nao, n2s), dtype=dt).at[:, r1f].add(P2)
            Kadd = Kadd.at[:, :, r2f].add(tmp)
    return Jadd, Kadd


def _combo_jk(nao: int, ip, iq, same_group: bool, fac_p, fac_q, dmt, dmk,
              want_j: bool, want_k: bool, block: int):
    """J/K contributions of one combo, streaming form: the quartet block
    is assembled on the fly and contracted immediately (never stored)."""
    blk = _combo_block(ip, iq, same_group, fac_p, fac_q, block)
    return _combo_contract(nao, ip, iq, blk, dmt, dmk, want_j, want_k)


def jk_combos(jk_meta):
    """Canonical (gi, gj) combo order shared by every blocked-JK consumer."""
    ng = len(jk_meta)
    return [(gi, gj) for gi in range(ng) for gj in range(gi, ng)]


def jk_blocks_nbytes(jk_meta) -> int:
    """f64 bytes of the full weighted canonical quartet-block set — the
    host-side sizing input for the blocked-JK mode decision."""
    tot = 0
    for (gi, gj) in jk_combos(jk_meta):
        ip, iq = jk_meta[gi], jk_meta[gj]
        tot += (len(ip["row0"]) * ip["sa"] * ip["sb"]
                * len(iq["row0"]) * iq["sa"] * iq["sb"] * 8)
    return tot


def build_jk_block(meta: BasisMeta, params, jk_meta, ci: int,
                   block: int = 16):
    """Quartet block of combo index `ci` (one theta part = one small XLA
    module: the fused all-combo assembly program chokes the remote TPU AOT
    compiler, same reason host_jk_builder splits per combo)."""
    (gi, gj) = jk_combos(jk_meta)[ci]
    inp_p = gather_pair_inputs(meta, params, jk_meta[gi]["pc"])
    inp_q = (inp_p if gj == gi
             else gather_pair_inputs(meta, params, jk_meta[gj]["pc"]))
    fac_p = hermite_factor_pair(inp_p)
    fac_q = fac_p if gj == gi else hermite_factor_pair(inp_q)
    return _combo_block(jk_meta[gi], jk_meta[gj], gi == gj, fac_p, fac_q,
                        block)


def expand_k_tensor(meta: BasisMeta, jk_meta, blocks):
    """Exchange-layout dense ERI G_K[a,c,b,d] = (ab|cd) assembled from the
    canonical quartet blocks, s8-symmetrized by transpose-adds.

    With this layout K_s = einsum("ijkl,skl->sij", G_K, dm_s) is a pure
    trailing-axis contraction (one MXU matvec over the flattened tensor, no
    per-iteration transpose) — the TPU-optimal exchange build for systems
    whose nao^4 tensor fits HBM. The scatter uses only pair-level index
    arrays broadcast at runtime (quartet-sized index *constants* OOM the
    remote TPU compiler, see _combo_contract)."""
    nao = meta.nao
    out = jnp.zeros((nao, nao, nao, nao), dtype=blocks[0].dtype)
    for ci, (gi, gj) in enumerate(jk_combos(jk_meta)):
        ip, iq = jk_meta[gi], jk_meta[gj]
        sa, sb = ip["sa"], ip["sb"]
        sc, sd = iq["sa"], iq["sb"]
        ra = jnp.asarray(ip["row0"][:, None] + np.arange(sa))
        rb = jnp.asarray(ip["col0"][:, None] + np.arange(sb))
        rc = jnp.asarray(iq["row0"][:, None] + np.arange(sc))
        rd = jnp.asarray(iq["col0"][:, None] + np.arange(sd))
        # blk (p,a,b,q,c,d) scattered to [a, c, b, d]
        out = out.at[ra[:, :, None, None, None, None],
                     rc[None, None, None, :, :, None],
                     rb[:, None, :, None, None, None],
                     rd[None, None, None, :, None, :]].add(blocks[ci])
    # s8 images in K layout (G-space generators mapped through [a,c,b,d]).
    # The optimization_barrier is load-bearing on TPU: XLA:TPU miscompiles
    # the FUSED f64 add+transpose(2,1,0,3) for tensors >= ~98 MB
    # (rel err 0.35-0.46; bare transpose and f32 are exact — distilled by
    # tools/expand_k_repro.py, round 3). Keeping the transpose as its own
    # (correct) kernel sidesteps it; the run()-time host oracle in
    # qccalc._materialize_theta still guards the result end-to-end.
    for perm in ((2, 1, 0, 3),   # a <-> b
                 (0, 3, 2, 1),   # c <-> d
                 (1, 0, 3, 2)):  # (ab) <-> (cd)
        out = out + jax.lax.optimization_barrier(out.transpose(*perm))
    return out


def expand_k_tensor_host(meta: BasisMeta, jk_meta, blocks):
    """Host-numpy twin of expand_k_tensor (trusted oracle / recovery path
    when the device expansion fails its integrity probe). The canonical
    quartet targets are disjoint across pairs and combos, so the scatter
    is a flat fancy *assignment* (np.add.at is ~30x slower here)."""
    nao = meta.nao
    out = np.zeros((nao, nao, nao, nao),
                   dtype=np.asarray(blocks[0]).dtype)
    flat = out.reshape(-1)
    for ci, (gi, gj) in enumerate(jk_combos(jk_meta)):
        ip, iq = jk_meta[gi], jk_meta[gj]
        sa, sb = ip["sa"], ip["sb"]
        sc, sd = iq["sa"], iq["sb"]
        ra = (np.asarray(ip["row0"])[:, None]
              + np.arange(sa)).astype(np.int64)
        rb = (np.asarray(ip["col0"])[:, None]
              + np.arange(sb)).astype(np.int64)
        rc = (np.asarray(iq["row0"])[:, None]
              + np.arange(sc)).astype(np.int64)
        rd = (np.asarray(iq["col0"])[:, None]
              + np.arange(sd)).astype(np.int64)
        A = ra[:, :, None, None, None, None]
        C = rc[None, None, None, :, :, None]
        B = rb[:, None, :, None, None, None]
        D = rd[None, None, None, :, None, :]
        idx = ((A * nao + C) * nao + B) * nao + D
        flat[idx.ravel()] += np.asarray(blocks[ci]).ravel()
    out = out + out.transpose(2, 1, 0, 3)
    out = out + out.transpose(0, 3, 2, 1)
    out = out + out.transpose(1, 0, 3, 2)
    return out


def theta_blocks(theta, jk_meta):
    """Ordered block list from the per-combo theta entries ("jkb{i}" —
    one theta part/disk-cache entry per combo, scf/qccalc._blocked_jk_parts)."""
    return [theta[f"jkb{i}"] for i in range(len(jk_combos(jk_meta)))]


def jk_from_blocks(meta: BasisMeta, jk_meta, blocks, dm,
                   want_j: bool = True, want_k: bool = True):
    """J and/or K from precomputed canonical quartet blocks (theta
    "jk_blocks"): pure density contractions — MXU/HBM-bandwidth bound,
    ~1000x cheaper than re-assembling the quartets per Fock build. Used
    when the canonical block set fits in HBM (scf/qccalc._jk_mode).

    Mesh-aware (SURVEY §2.10 "kernel parallel"): under an active mesh
    with a 'tp' axis, each combo's quartet block is sharded along its
    bra-pair axis (axis 0 — the largest, uniformly SPMD) and the outputs
    are constrained replicated, so GSPMD partitions every contraction
    across devices and inserts the psum over ICI. Validated
    sharded==unsharded on the virtual 8-device CPU mesh
    (tests/test_parallel.py) and exercised by dryrun phase 4."""
    from ..parallel.mesh import active_mesh, shard_axis, replicated
    nao = meta.nao
    pol = dm.ndim == 3
    dmt = dm.sum(axis=0) if pol else dm
    dmk = dm if pol else dm[None]
    ns = dmk.shape[0]
    mesh = active_mesh()
    if mesh is not None and "tp" in mesh.axis_names:
        blocks = [shard_axis(b, "tp", 0) for b in blocks]
        dmt, dmk = replicated(dmt), replicated(dmk)
    Jflat = jnp.zeros((nao * nao,), dtype=dmt.dtype)
    K = jnp.zeros((ns, nao, nao), dtype=dmt.dtype)
    for ci, (gi, gj) in enumerate(jk_combos(jk_meta)):
        Jadd, Kadd = _combo_contract(nao, jk_meta[gi], jk_meta[gj],
                                     blocks[ci], dmt, dmk, want_j, want_k)
        if Jadd is not None:
            Jflat = Jflat + Jadd
        if Kadd is not None:
            K = K + Kadd
    if mesh is not None and "tp" in mesh.axis_names:
        Jflat, K = replicated(Jflat), replicated(K)
    return _jk_symmetrize(Jflat, K, nao, pol, want_j, want_k)


def _jk_symmetrize(Jflat, K, nao, pol, want_j, want_k):
    # J: the 8 permutation images contribute 2(A + A^T + B + B^T)
    # (dm symmetric); K: the 4 pairings + transposes cover all 8 exactly.
    J = None
    if want_j:
        J = Jflat.reshape(nao, nao)
        J = 2.0 * (J + J.T)
    if want_k:
        K = K + jnp.swapaxes(K, -1, -2)
        if not pol:
            K = K[0]
    return J, (K if want_k else None)


def jk_matrices(meta: BasisMeta, jk_meta, facs: List[HermiteFactor], dm,
                want_j: bool = True, want_k: bool = True, block: int = 16):
    """Streaming J and/or K for (possibly spin-stacked) dm.

    dm: (nao, nao) or (2, nao, nao) symmetric. Returns (J, K) with J built
    from the spin-summed density when dm is stacked, K per spin channel."""
    nao = meta.nao
    pol = dm.ndim == 3
    dmt = dm.sum(axis=0) if pol else dm
    dmk = dm if pol else dm[None]
    ns = dmk.shape[0]

    Jflat = jnp.zeros((nao * nao,), dtype=dmt.dtype)
    K = jnp.zeros((ns, nao, nao), dtype=dmt.dtype)

    ng = len(jk_meta)
    for gi in range(ng):
        for gj in range(gi, ng):
            Jadd, Kadd = _combo_jk(nao, jk_meta[gi], jk_meta[gj], gi == gj,
                                   facs[gi], facs[gj], dmt, dmk,
                                   want_j, want_k, block)
            if Jadd is not None:
                Jflat = Jflat + Jadd
            if Kadd is not None:
                K = K + Kadd
    return _jk_symmetrize(Jflat, K, nao, pol, want_j, want_k)


def host_jk_builder(meta: BasisMeta, jk_meta, want_j: bool, want_k: bool,
                    block: int = 16):
    """(dm, theta) -> (J, K) for the host-driven DIIS: each class-group
    combo is its own jax.jit module. The combined quartet-stream program at
    def2-SVP scale took >1h on the remote TPU AOT compiler (compile cost is
    superlinear in module size); ~20 small modules compile in minutes
    total, cache individually, and add only ~ms of dispatch per iteration.
    Numerics are identical to jk_matrices up to f64 summation order."""
    nao = meta.nao
    ng = len(jk_meta)
    combos = [(gi, gj) for gi in range(ng) for gj in range(gi, ng)]

    jits = {}
    for (gi, gj) in combos:
        def mk(gi=gi, gj=gj):
            def f(fac_p, fac_q, dmt, dmk):
                return _combo_jk(nao, jk_meta[gi], jk_meta[gj], gi == gj,
                                 fac_p, fac_q, dmt, dmk,
                                 want_j, want_k, block)
            return jax.jit(f)
        jits[(gi, gj)] = mk()

    _sym = {pol: jax.jit(lambda Jf, K, pol=pol: _jk_symmetrize(
        Jf, K, nao, pol, want_j, want_k)) for pol in (False, True)}

    def run(dm, theta):
        facs = theta["jk_facs"]
        pol = dm.ndim == 3
        dmt = dm.sum(axis=0) if pol else dm
        dmk = dm if pol else dm[None]
        ns = dmk.shape[0]
        Jflat = jnp.zeros((nao * nao,), dtype=dmt.dtype)
        K = jnp.zeros((ns, nao, nao), dtype=dmt.dtype)
        for (gi, gj) in combos:
            Jadd, Kadd = jits[(gi, gj)](facs[gi], facs[gj], dmt, dmk)
            if Jadd is not None:
                Jflat = Jflat + Jadd
            if Kadd is not None:
                K = K + Kadd
        return _sym[pol](Jflat, K)

    return run
