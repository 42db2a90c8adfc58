"""Isolate the def2-svp host-DIIS NaN on the current backend.

The round-2 bench warmup showed the def2-svp benzene host loop going
non-finite at it=0 in BOTH the f32 warm phase and the f64 phase on the
axon TPU (all exchange modes), while the same code converges on JAX-CPU.
This probe decomposes iteration 0 into its pieces and reports which one
is the first to go non-finite, in f32 and f64, so the failure can be
attributed (theta content vs SAD Fock vs J/K contraction vs vxc).

Usage (TPU):  python tools/tpu_nan_probe.py [basis]
       (CPU): env -u PYTHONPATH JAX_PLATFORMS=cpu python tools/tpu_nan_probe.py
"""
import os
import sys

if os.environ.get("MALLOC_MMAP_THRESHOLD_") is None:
    env = dict(os.environ, MALLOC_MMAP_THRESHOLD_="17179869184",
               MALLOC_TRIM_THRESHOLD_="-1", DQC_TPU_VERBOSE="1")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def finite(name, x):
    a = np.asarray(x)
    bad = (~np.isfinite(a)).sum()
    amax = float(np.abs(a[np.isfinite(a)]).max()) if np.isfinite(a).any() else float("nan")
    print(f"  {name:24s} shape={a.shape} nonfinite={bad} absmax={amax:.3e}")
    return bad == 0


def main():
    basis = sys.argv[1] if len(sys.argv) > 1 else "def2-svp"
    import dqc_tpu as dq
    from dqc_tpu.scf.qccalc import sad_dm0
    from __graft_entry__ import _benzene_mol

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    mol = _benzene_mol(basis=basis)
    cache_f = os.path.join(here, f".bench_theta_{basis}.npz")
    mol.set_cache(cache_f)
    qc = dq.KS(mol, xc="b3lyp")

    theta = qc._materialize_theta(qc._all_params(with_fields=False),
                                  cache_f if os.path.exists(cache_f) else None)
    print(f"backend={jax.default_backend()} nao={mol.meta.nao} "
          f"theta keys={sorted(theta.keys())}")

    print("[theta f64 content]")
    theta_ok = True
    for k, v in sorted(theta.items()):
        if hasattr(v, "shape"):
            theta_ok &= finite(f"theta[{k}]", v)
        elif isinstance(v, dict):
            for kk, vv in sorted(v.items()):
                if hasattr(vv, "shape"):
                    theta_ok &= finite(f"theta[{k}][{kk}]", vv)
    print(f"theta all-finite: {theta_ok}")

    d0 = sad_dm0(mol)
    finite("sad dm0", d0)

    eng = qc.engine
    jit_jk = qc._jk_call()

    @jax.jit
    def rest(dm, j, k, th):
        f = eng.fock_from_parts(dm, j, k, th)
        e = eng.diis_err(f, dm, th)
        return f, e

    for tag, cast in [("f64", lambda x: x), ("f32", None)]:
        print(f"[iteration-0 pieces, {tag}]")
        if cast is None:
            import jax.tree_util as jtu
            th = jax.jit(lambda t: jtu.tree_map(
                lambda x: x.astype(jnp.float32)
                if getattr(x, "dtype", None) == jnp.float64 else x, t))(theta)
            if "jk_facs" in th and "df" in th:
                th = {k: v for k, v in th.items() if k != "jk_facs"}
            dm = jnp.asarray(d0, dtype=jnp.float32)
        else:
            th = theta
            dm = jnp.asarray(d0, dtype=jnp.float64)
        thf_ok = True
        for k, v in sorted(th.items()):
            if hasattr(v, "shape"):
                a = np.asarray(v)
                n = (~np.isfinite(a)).sum()
                if n:
                    print(f"  cast theta[{k}] nonfinite={n}")
                    thf_ok = False
        print(f"  cast theta finite: {thf_ok}")
        try:
            j, k = jit_jk(dm, th)
            finite("J", j)
            finite("K", k) if k is not None else print("  K: None")
            f, e = rest(dm, j, k, th)
            finite("fock", f)
            finite("diis_err", e)
            # vxc in isolation (the KS-only piece of the Fock build)
            from dqc_tpu.xc.integrate import vxc_matrix
            vxc = jax.jit(lambda d, g: vxc_matrix(
                eng.xc, d, g, eng.polarized))(dm, th["grid"])
            finite("vxc", vxc)
        except Exception as ex:
            print(f"  EXC: {ex!r}")


if __name__ == "__main__":
    main()
