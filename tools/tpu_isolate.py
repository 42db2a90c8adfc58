"""Program-level TPU-vs-CPU isolation for the per-iteration SCF programs.

Usage (theta must already be cached by bench.py, so both platforms consume
byte-identical quartet blocks / grid tables):

    # 1. record the trusted CPU outputs
    env -u PYTHONPATH JAX_PLATFORMS=cpu python tools/tpu_isolate.py --save
    # 2. compare the TPU programs against them
    python tools/tpu_isolate.py --check

Motivation: the theta-time integrity probes (scf/qccalc._materialize_theta)
verify the eri_k expansion and blocks-J/K with a STANDALONE einsum module;
a scale-dependent miscompile of the actual per-iteration modules
(engine.jk_parts / fock_from_parts+diis_err / vxc assembly) would evade
them. This tool runs the exact callables the host-driven DIIS dispatches
(qccalc._jk_call / the jit_rest pair) plus each suspect program in
isolation, on whatever backend JAX selects, and round-trips the results
through an .npz so the platforms can be diffed program by program.
"""
import argparse
import os
import sys

if os.environ.get("MALLOC_MMAP_THRESHOLD_") is None:
    env = dict(os.environ,
               MALLOC_MMAP_THRESHOLD_="17179869184",
               MALLOC_TRIM_THRESHOLD_="-1")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

import numpy as np


def build(basis):
    import jax
    jax.config.update("jax_enable_x64", True)
    import dqc_tpu as dq
    from __graft_entry__ import _benzene_mol
    mol = _benzene_mol(basis=basis)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    mol.set_cache(os.path.join(here, f".bench_theta_{basis}.npz"))
    qc = dq.KS(mol, xc="b3lyp")
    theta = qc._materialize_theta(qc._all_params(with_fields=False),
                                  mol._cache_fname)
    return qc, theta


def run_programs(qc, theta):
    import jax
    import jax.numpy as jnp
    from dqc_tpu.xc.integrate import exc_energy, vxc_matrix

    eng = qc.engine
    nao = qc.mol.meta.nao
    rng = np.random.default_rng(0)
    dm_np = rng.standard_normal((nao, nao))
    dm_np = 0.05 * (dm_np + dm_np.T) + np.eye(nao)   # density-like scale
    dm = jnp.asarray(dm_np)

    out = {"dm": dm_np}
    # 1. the per-iteration J/K program exactly as the host loop runs it
    j, k = qc._jk_call()(dm, theta)
    out["j"] = np.asarray(j)
    out["k"] = np.asarray(k)

    # 2. eri_k checksum fibers (tensor itself is ~GBs; project instead)
    if "eri_k" in theta:
        p1 = rng.standard_normal((nao, nao))
        out["erik_proj1"] = np.asarray(jax.jit(
            lambda g, x: jnp.einsum("ijkl,kl->ij", g, x))(
                theta["eri_k"], jnp.asarray(p1)))
        out["erik_fiber"] = np.asarray(theta["eri_k"][3, 7])

    # 3. vxc / exc in isolation
    out["vxc"] = np.asarray(jax.jit(
        lambda d: vxc_matrix(eng.xc, d, theta["grid"], eng.polarized,
                             xcparams=theta.get("xc_params")))(dm))
    out["exc"] = np.asarray(jax.jit(
        lambda d: exc_energy(eng.xc, d, theta["grid"], eng.polarized,
                             xcparams=theta.get("xc_params")))(dm))

    # 4. the jit_rest program (fock_from_parts + diis_err) as dispatched
    @jax.jit
    def jit_rest(dm, j, k, th):
        f_new = eng.fock_from_parts(dm, j, k, th)
        err = eng.diis_err(f_new, dm, th)
        return f_new, err
    f_new, err = jit_rest(dm, j, k, theta)
    out["fock"] = np.asarray(f_new)
    out["err"] = np.asarray(err)

    # 5. energy_from_parts
    out["energy"] = np.asarray(jax.jit(eng.energy_from_parts)(
        dm, j, k, theta))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--basis", default=os.environ.get("BENCH_BASIS",
                                                      "def2-svp"))
    ap.add_argument("--ref", default="/tmp/isolate_ref.npz")
    ap.add_argument("--save", action="store_true")
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    qc, theta = build(args.basis)
    out = run_programs(qc, theta)

    if args.save:
        np.savez(args.ref, **out)
        print(f"saved {sorted(out)} -> {args.ref}")
        return
    assert args.check, "pass --save or --check"
    ref = np.load(args.ref)
    bad = 0
    for k in sorted(out):
        if k not in ref.files:
            print(f"{k:12s} MISSING in ref")
            continue
        a, b = out[k], ref[k]
        scale = max(np.abs(b).max(), 1e-300)
        rel = np.abs(a - b).max() / scale
        flag = "OK " if rel < 1e-10 else "BAD"
        if flag == "BAD":
            bad += 1
        print(f"{flag} {k:12s} rel={rel:.3e}  scale={scale:.3e}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
