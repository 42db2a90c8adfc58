"""Diagnose the device->host DIIS handoff gap (VERDICT r3 item 2).

The device f64 purify phase exits at err~5.7e-9 under its own fused
arithmetic, but the host's small-module metric reads ~2.7e-7 at the same
Fock, buying 5 x 0.8 s of LAPACK polish. This probe separates the two
candidate causes at the device phase's final Fock f*:

  (a) purify-dm vs eigh-dm:   dm_p = fock_to_dm_purify(f*), dm_e = LAPACK
      aufbau eigh dm. If |dm_p - dm_e| is large, purification converged to
      a different projector (frontier/degeneracy trouble).
  (b) fused-program vs small-module arithmetic: err(dm) recomputed with
      the SAME small modules the host loop uses (jit_step), at both dm_p
      and dm_e. If err(dm_p)[small] >> device's own err, the fused
      while_loop program's arithmetic (excess precision / fusion) is the
      culprit.

Run on the TPU: python tools/handoff_probe.py  (bench theta must be cached)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("MALLOC_MMAP_THRESHOLD_") is None:
    os.execve(sys.executable, [sys.executable] + sys.argv,
              dict(os.environ, MALLOC_MMAP_THRESHOLD_="17179869184",
                   MALLOC_TRIM_THRESHOLD_="-1", DQC_TPU_VERBOSE="1"))

import numpy as np
import jax
import jax.numpy as jnp

import dqc_tpu as dq
from __graft_entry__ import _benzene_mol

basis = os.environ.get("BENCH_BASIS", "def2-svp")
mol = _benzene_mol(basis=basis)
mol.set_cache(os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), f".bench_theta_{basis}.npz"))
qc = dq.KS(mol, xc="b3lyp")

t0 = time.time()
qc.run()   # drives the full ladder; leaves caches warm
print(f"[probe] first run done in {time.time()-t0:.1f}s", flush=True)

# Reproduce _host_solve's setup: host LAPACK X into theta
theta = dict(qc._theta)
eng = qc.engine
s_h = np.asarray(theta["ovlp"], dtype=np.float64)
w_s, v_s = np.linalg.eigh(0.5 * (s_h + s_h.T))
keep_s = w_s > 1e-9 * w_s[-1]
inv_sqrt = np.where(keep_s, 1.0 / np.sqrt(np.where(keep_s, w_s, 1.0)), 0.0)
theta["X"] = jnp.asarray(v_s * inv_sqrt[None, :])
theta["keep"] = jnp.asarray(keep_s)
X_h = np.asarray(theta["X"])
occ_h = np.asarray(theta["occ"], dtype=np.float64)
pin_h = np.where(np.asarray(theta["keep"]), 0.0, 1e7)


def host_dm(fock):
    f = np.asarray(fock, dtype=np.float64)
    fp = np.einsum("im,...ij,jn->...mn", X_h, f, X_h)
    fp = fp + np.diag(pin_h)
    _, u = np.linalg.eigh(fp)
    c = np.einsum("ij,...jk->...ik", X_h, u)
    return np.einsum("...ik,...k,...jk->...ij", c, occ_h, c)


# start near convergence: SAD Fock, then run the device f64 phase
from dqc_tpu.scf.qccalc import sad_dm0
d0 = qc.__dict__.get("_sad_dm0")
if d0 is None:
    d0 = sad_dm0(mol)
jit_step = qc._jit_step_fn if hasattr(qc, "_jit_step_fn") else None
if jit_step is None:
    @jax.jit
    def jit_step(dm, th):
        j, k = eng.jk_parts(dm, th)
        f_new = eng.fock_from_parts(dm, j, k, th)
        err = eng.diis_err(f_new, dm, th)
        return f_new, err

f0 = np.asarray(jit_step(jnp.asarray(d0, dtype=jnp.float64), theta)[0])

t0 = time.time()
# match the run's (tol, maxiter) so the cached while_loop module is reused
fstar = qc._device_phase(theta, f0, qc.opts.tol, qc.opts.maxiter, "probe64")
print(f"[probe] device phase: {time.time()-t0:.1f}s", flush=True)

from dqc_tpu.scf.purify import fock_to_dm_purify
dm_p_small = np.asarray(jax.jit(fock_to_dm_purify)(
    jnp.asarray(fstar), theta["X"], theta["keep"], theta["occ"]))
dm_e = host_dm(fstar)
print(f"[probe] |dm_purify(small) - dm_eigh| = "
      f"{np.abs(dm_p_small - dm_e).max():.3e}", flush=True)

for tag, dm in (("purify-small", dm_p_small), ("eigh", dm_e)):
    f_new, err = jit_step(jnp.asarray(dm), theta)
    err = np.abs(np.asarray(err)).max()
    print(f"[probe] small-module err at dm[{tag}] = {err:.3e}", flush=True)

# and one host iterate from there, to see the polish trajectory
f = fstar
for it in range(4):
    dm = host_dm(f)
    f_new, e_new = jit_step(jnp.asarray(dm), theta)
    f = np.asarray(f_new, dtype=np.float64)
    print(f"[probe] plain host iterate {it}: err="
          f"{np.abs(np.asarray(e_new)).max():.3e}", flush=True)
