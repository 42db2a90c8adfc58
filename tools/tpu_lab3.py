"""Isolate the slow parts of the f64 SCF step on the live chip.

Q1: is the eri_k matvec slow because of the 4-D einsum lowering?
    time: einsum('ijkl,kl->ij') vs pre-reshaped (n^2,n^2) f64 GEMV vs a
    manual double-f32 (hi/lo split) GEMV pair.
Q2: where do the 208 ms of exc+vxc go?
    time: density build | pointwise functional chain | V assembly.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)


def _force(out):
    """block_until_ready can be a no-op through the axon tunnel; fetching
    one element of every output buffer forces real completion."""
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(jax.device_get(jnp.ravel(leaf)[:1]))
    return out


def timeit(fn, *args, reps=5):
    out = _force(fn(*args))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = _force(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, out


def q1():
    n = 114
    rng = np.random.default_rng(0)
    # host-built to avoid device RNG; ~1.35 GB f64
    t4_np = rng.standard_normal((n, n, n, n)) * 1e-2
    dm_np = rng.standard_normal((n, n))
    t4 = jnp.asarray(t4_np)
    t2 = jnp.asarray(t4_np.reshape(n * n, n * n))
    dm = jnp.asarray(dm_np)
    dmv = jnp.asarray(dm_np.ravel())

    e4 = jax.jit(lambda a, d: jnp.einsum("ijkl,kl->ij", a, d))
    t, k4 = timeit(e4, t4, dm)
    print(f"[lab3] einsum ijkl,kl->ij        : {t*1e3:8.2f} ms")

    gemv = jax.jit(lambda a, d: (a @ d).reshape(n, n))
    t, k2 = timeit(gemv, t2, dmv)
    print(f"[lab3] pre-reshaped (n2,n2) gemv : {t*1e3:8.2f} ms  "
          f"maxdiff {float(jnp.max(jnp.abs(k2 - k4))):.2e}")

    # manual double-f32: a ~= hi + lo with hi = f32(a)
    hi_np = t4_np.reshape(n * n, n * n).astype(np.float32)
    lo_np = (t4_np.reshape(n * n, n * n) - hi_np).astype(np.float32)
    hi, lo = jnp.asarray(hi_np), jnp.asarray(lo_np)
    dhi_np = dm_np.ravel().astype(np.float32)
    dlo_np = (dm_np.ravel() - dhi_np).astype(np.float32)
    dhi, dlo = jnp.asarray(dhi_np), jnp.asarray(dlo_np)

    def pair(hi, lo, dhi, dlo):
        # (hi+lo)(dhi+dlo) ~ hi*dhi + hi*dlo + lo*dhi  (lo*dlo ~ 1e-16)
        a = jnp.dot(hi, dhi, preferred_element_type=jnp.float32)
        b = jnp.dot(hi, dlo, preferred_element_type=jnp.float32)
        c = jnp.dot(lo, dhi, preferred_element_type=jnp.float32)
        return (a.astype(jnp.float64) + b.astype(jnp.float64)
                + c.astype(jnp.float64)).reshape(n, n)

    jp = jax.jit(pair)
    t, kp = timeit(jp, hi, lo, dhi, dlo)
    rel = float(jnp.max(jnp.abs(kp - k4)) / jnp.max(jnp.abs(k4)))
    print(f"[lab3] double-f32 pair gemv      : {t*1e3:8.2f} ms  "
          f"rel {rel:.2e}")

    # f32 only (for scale)
    f1 = jax.jit(lambda a, d: jnp.dot(a, d, precision="highest"))
    t, _ = timeit(f1, hi, dhi)
    print(f"[lab3] single-f32 gemv           : {t*1e3:8.2f} ms")

    # GEMV -> GEMM with padded columns: TPU mat-vec runs ~25 GB/s (the
    # MXU wants a matrix rhs); stream the SAME matrix against N columns
    # (col 0 = dm, rest discarded) and take col 0.
    for ncol in (8, 128):
        dmat = jnp.zeros((n * n, ncol), jnp.float64).at[:, 0].set(dmv)
        gm = jax.jit(lambda a, d: (a @ d)[:, 0].reshape(n, n))
        t, kg = timeit(gm, t2, dmat)
        print(f"[lab3] f64 gemm N={ncol:<3d}           : {t*1e3:8.2f} ms  "
              f"maxdiff {float(jnp.max(jnp.abs(kg - k4))):.2e}")

    # n^5 reshape trick: (n^3, n) @ (n, n) GEMM + masked trace-reduce
    t3 = jnp.asarray(t4_np.reshape(n * n * n, n))
    eye = jnp.eye(n, dtype=jnp.float64)

    def resh(a3, d):
        A = (a3 @ d).reshape(n * n, n, n)
        return jnp.sum(A * eye[None], axis=(1, 2)).reshape(n, n)
    t, kr = timeit(jax.jit(resh), t3, dm)
    print(f"[lab3] f64 (n3,n)gemm+trace      : {t*1e3:8.2f} ms  "
          f"maxdiff {float(jnp.max(jnp.abs(kr - k4))):.2e}")

    # f32 gemm N=128 for the throughput ceiling
    dmat32 = jnp.zeros((n * n, 128), jnp.float32).at[:, 0].set(dhi)
    gm32 = jax.jit(lambda a, d: (a @ d)[:, 0])
    t, _ = timeit(gm32, hi, dmat32)
    print(f"[lab3] f32 gemm N=128            : {t*1e3:8.2f} ms")


def q2():
    import dqc_tpu
    from __graft_entry__ import _benzene_mol
    from dqc_tpu.xc.integrate import exc_vxc, _edens_at
    from dqc_tpu.xc import get_xc
    mol = _benzene_mol(basis="def2-svp")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    mol.set_cache(os.path.join(repo, ".bench_theta_def2-svp.npz"))
    qc = dqc_tpu.KS(mol, xc="b3lyp")
    params = qc._all_params(with_fields=False)
    theta = qc._materialize_theta(params, getattr(mol, "_cache_fname",
                                                  None))
    g = theta["grid"]
    print(f"[lab3] grid sizes: "
          f"{ {k: getattr(v, 'shape', None) for k, v in g.items()} }")
    n = mol.meta.nao
    s = np.asarray(theta["ovlp"], dtype=np.float64)
    dm = jnp.asarray(np.linalg.inv(s) * (42.0 / n))
    xc = qc.engine.xc

    # density build only
    def dens(d, ao, aog):
        rho = jnp.einsum("gi,ij,gj->g", ao, d, ao)
        grad = 2.0 * jnp.einsum("dgi,ij,gj->dg", aog, d, ao)
        return rho, grad
    t, (rho, grad) = timeit(jax.jit(dens), dm, g["ao"], g["ao_grad"])
    print(f"[lab3] density build             : {t*1e3:8.2f} ms")

    # pointwise chain only (value+grad wrt rho/sigma)
    def point(rho, grad):
        sig = jnp.sum(grad * grad, axis=0)
        def e_of(r, s_):
            d = {"rho": r, "grad": jnp.sqrt(jnp.maximum(s_, 1e-300))}
            return jnp.sum(_edens_at(xc, {"rho": r,
                                          "grad": jnp.stack([
                                              jnp.sqrt(jnp.maximum(s_, 0)),
                                              jnp.zeros_like(r),
                                              jnp.zeros_like(r)])},
                                     False, None))
        e, vjp = jax.vjp(e_of, rho, sig)
        vr, vs = vjp(jnp.ones((), e.dtype))
        return e, vr, vs
    try:
        t, _ = timeit(jax.jit(point), rho, grad)
        print(f"[lab3] pointwise chain + AD      : {t*1e3:8.2f} ms")
    except Exception as ex:
        print(f"[lab3] pointwise chain failed: {ex!r}")

    # V assembly only: einsum('g,gi,gj->ij') + grad terms
    def assemble(vr, vg, ao, aog):
        raw = jnp.einsum("g,gi,gj->ij", vr, ao, ao)
        raw = raw + 2.0 * jnp.einsum("dg,dgi,gj->ij", vg, aog, ao)
        return raw + raw.T
    vg_dummy = grad
    t, _ = timeit(jax.jit(assemble), rho, vg_dummy, g["ao"], g["ao_grad"])
    print(f"[lab3] V assembly                : {t*1e3:8.2f} ms")

    # full closed-form exc_vxc for reference
    t, _ = timeit(jax.jit(lambda d, gg: exc_vxc(xc, d, gg, False)), dm, g)
    print(f"[lab3] exc_vxc full              : {t*1e3:8.2f} ms")


def q3():
    """Blocks-path J/K vs the eri_k/eri_j trailing matvecs, on-chip."""
    import dqc_tpu
    from __graft_entry__ import _benzene_mol
    from dqc_tpu.scf.jk import jk_from_blocks, theta_blocks
    mol = _benzene_mol(basis="def2-svp")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    mol.set_cache(os.path.join(repo, ".bench_theta_def2-svp.npz"))
    qc = dqc_tpu.KS(mol, xc="b3lyp")
    params = qc._all_params(with_fields=False)
    theta = qc._materialize_theta(params, getattr(mol, "_cache_fname",
                                                  None))
    n = mol.meta.nao
    s = np.asarray(theta["ovlp"], dtype=np.float64)
    dm = jnp.asarray(np.linalg.inv(s) * (42.0 / n))
    bmeta, jkm = qc.engine.jk_info

    blocks = jax.jit(lambda d, th: jk_from_blocks(
        bmeta, jkm, theta_blocks(th, jkm), d, want_j=True, want_k=True))
    t, (jb, kb) = timeit(blocks, dm, theta, reps=5)
    print(f"[lab3] blocks J+K               : {t*1e3:8.2f} ms")

    ek = jax.jit(lambda d, th: (
        jnp.einsum("ijkl,kl->ij", th["eri_j"], d),
        jnp.einsum("ijkl,kl->ij", th["eri_k"], d)))
    if "eri_j" in theta and "eri_k" in theta:
        t, (je, ke) = timeit(ek, dm, theta, reps=5)
        dj = float(jnp.max(jnp.abs(je - jb)))
        dk = float(jnp.max(jnp.abs(ke - kb)))
        print(f"[lab3] eri_j+eri_k matvecs      : {t*1e3:8.2f} ms  "
              f"dJ {dj:.2e} dK {dk:.2e}")

    # chunked (n^3,n)@(n,n) GEMM + trace: MXU-shaped exchange matvec
    if "eri_k" in theta:
        eri_k = theta["eri_k"]
        eye = jnp.eye(n, dtype=jnp.float64)

        def kchunk(ei, d):
            nchunk = 6
            def one(ec):
                A = jnp.einsum("xkl,lm->xkm", ec.reshape(-1, n, n), d)
                return jnp.sum(A * eye[None], axis=(1, 2))
            return jax.lax.map(one, ei.reshape(nchunk, -1, n, n)
                               ).reshape(n, n)
        t, kc = timeit(jax.jit(kchunk), eri_k, dm, reps=5)
        dk = float(jnp.max(jnp.abs(kc - kb)))
        print(f"[lab3] eri_k chunked-gemm+trace : {t*1e3:8.2f} ms  "
              f"dK {dk:.2e}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "12"
    if "1" in which:
        q1()
    if "2" in which:
        q2()
    if "3" in which:
        q3()
