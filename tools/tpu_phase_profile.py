"""Per-component timing of the steady-state SCF iteration on the current
backend (benzene/def2-SVP by default, cached theta required).

BENCH_r03 showed dev:f64 = 4.0 s for ~10 iterations (~0.4 s/it) at
nao=114 — ~100x the memory-bandwidth roofline of the eri_k/eri_j
matvecs. This tool times each piece of the iteration in isolation
(jitted, steady-state, best-of-N):

  jk      : J/K from the exchange/Coulomb-layout tensors (engine.jk_parts)
  vxc     : XC energy+potential assembly (the pointwise f64 chain is the
            suspected cost: emulated-f64 transcendentals)
  fock    : fock_from_parts + diis_err
  purify  : fock_to_dm_purify (72 fixed iterations)
  eigh    : device eigh path (safe_eigh via dm_from_fock) for comparison
  step    : one full fused iteration (dm -> fock -> err)

Usage: python tools/tpu_phase_profile.py [basis] [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

import dqc_tpu  # noqa: E402
from __graft_entry__ import _benzene_mol  # noqa: E402


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


def main():
    basis = sys.argv[1] if len(sys.argv) > 1 else "def2-svp"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    mol = _benzene_mol(basis=basis)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    mol.set_cache(os.path.join(repo, f".bench_theta_{basis}.npz"))
    qc = dqc_tpu.KS(mol, xc="b3lyp")
    params = qc._all_params(with_fields=False)
    theta = qc._materialize_theta(params, getattr(mol, "_cache_fname", None))
    eng = qc.engine
    nao = mol.meta.nao
    print(f"[profile] backend={jax.default_backend()} nao={nao} "
          f"theta keys={sorted(theta.keys())[:8]}...", flush=True)

    # host-exact X (same as _host_solve)
    s_h = np.asarray(theta["ovlp"], dtype=np.float64)
    w_s, v_s = np.linalg.eigh(0.5 * (s_h + s_h.T))
    keep_s = w_s > 1e-9 * w_s[-1]
    inv_sqrt = np.where(keep_s, 1.0 / np.sqrt(np.where(keep_s, w_s, 1.0)),
                        0.0)
    theta = dict(theta)
    theta["X"] = jnp.asarray(v_s * inv_sqrt[None, :])
    theta["keep"] = jnp.asarray(keep_s)

    # any well-scaled symmetric dm works for timing; Tr(D S) = nel-ish
    dm = jnp.asarray(np.linalg.inv(s_h) * (42.0 / nao), dtype=jnp.float64)

    jk = jax.jit(lambda d, th: eng.jk_parts(d, th))
    t, (j, k) = timeit(jk, dm, theta, reps=reps)
    print(f"[profile] jk_parts        : {t*1e3:8.2f} ms")

    from dqc_tpu.xc.integrate import exc_vxc
    vxc_fn = jax.jit(lambda d, th: exc_vxc(eng.xc, d, th["grid"],
                                           eng.polarized))
    t, _ = timeit(vxc_fn, dm, theta, reps=reps)
    print(f"[profile] exc+vxc         : {t*1e3:8.2f} ms")

    fock_fn = jax.jit(lambda d, jj, kk, th: eng.fock_from_parts(
        d, jj, kk, th))
    t, f = timeit(fock_fn, dm, j, k, theta, reps=reps)
    print(f"[profile] fock_from_parts : {t*1e3:8.2f} ms  "
          "(includes one vxc)")

    err_fn = jax.jit(lambda ff, d, th: eng.diis_err(ff, d, th))
    t, _ = timeit(err_fn, f, dm, theta, reps=reps)
    print(f"[profile] diis_err        : {t*1e3:8.2f} ms")

    from dqc_tpu.scf.purify import fock_to_dm_purify
    pur = jax.jit(lambda ff, th: fock_to_dm_purify(ff, th["X"], th["keep"],
                                                   th["occ"]))
    t, _ = timeit(pur, f, theta, reps=reps)
    print(f"[profile] purify(72)      : {t*1e3:8.2f} ms")

    dmf = jax.jit(lambda ff, th: eng.dm_from_fock(ff, th))
    t, _ = timeit(dmf, f, theta, reps=reps)
    print(f"[profile] eigh dm_from_fock: {t*1e3:7.2f} ms")

    step = jax.jit(lambda ff, th: (lambda d: (eng.fock(d, th),
                                              eng.diis_err(eng.fock(d, th),
                                                           d, th)))(
        fock_to_dm_purify(ff, th["X"], th["keep"], th["occ"])))
    t, _ = timeit(step, f, theta, reps=reps)
    print(f"[profile] full step (x2 fock): {t*1e3:5.2f} ms")


if __name__ == "__main__":
    main()
