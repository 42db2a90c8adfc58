"""TPU-side purification accuracy probe: dm_purify(iters) vs host LAPACK
aufbau projector at the SAD Fock (CPU same comparison: 2.4e-13; TPU
handoff probe saw 2.7e-7 — isolate iters-dependence + matmul noise)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if os.environ.get("MALLOC_MMAP_THRESHOLD_") is None:
    os.execve(sys.executable, [sys.executable] + sys.argv,
              dict(os.environ, MALLOC_MMAP_THRESHOLD_="17179869184",
                   MALLOC_TRIM_THRESHOLD_="-1", DQC_TPU_VERBOSE="1"))
import numpy as np, jax, jax.numpy as jnp
import dqc_tpu as dq
from __graft_entry__ import _benzene_mol
mol = _benzene_mol(basis="def2-svp")
mol.set_cache("/root/repo/.bench_theta_def2-svp.npz")
qc = dq.KS(mol, xc="b3lyp")
params = qc._all_params(with_fields=False)
theta = qc._materialize_theta(params)
eng = qc.engine
from dqc_tpu.scf.qccalc import sad_dm0
d0 = sad_dm0(mol)
@jax.jit
def jit_step(dm, th):
    j, k = eng.jk_parts(dm, th)
    return eng.fock_from_parts(dm, j, k, th)
F = np.asarray(jit_step(jnp.asarray(d0, dtype=jnp.float64), theta))
print("[p] F ready", flush=True)
s = np.asarray(theta["ovlp"], dtype=np.float64)
w, v = np.linalg.eigh(0.5*(s+s.T)); keep = w > 1e-9*w[-1]
X = v * np.where(keep, 1/np.sqrt(np.where(keep, w, 1)), 0.0)[None, :]
occ = np.asarray(theta["occ"], dtype=np.float64)
fp = X.T @ F @ X
u = np.linalg.eigh(fp)[1]
c = X @ u
dm_e = np.einsum("ik,k,jk->ij", c, occ, c)
from dqc_tpu.scf.purify import fock_to_dm_purify
Xj, kj, oj, Fj = map(jnp.asarray, (X, keep, occ, F))
for iters in (18, 40, 72, 144):
    t0 = time.time()
    dm_p = np.asarray(jax.jit(fock_to_dm_purify, static_argnums=4)(
        Fj, Xj, kj, oj, iters))
    print(f"[p] iters={iters:4d} |dm_p-dm_e|={np.abs(dm_p-dm_e).max():.3e}"
          f"  ({time.time()-t0:.1f}s)", flush=True)
# single-matmul TPU error calibration at this scale
A = jnp.asarray(dm_e)
prod_tpu = np.asarray(jax.jit(lambda a: a @ a)(A))
prod_cpu = dm_e @ dm_e
print(f"[p] single 114^2 matmul |tpu-cpu| = "
      f"{np.abs(prod_tpu-prod_cpu).max():.3e}", flush=True)
# orth-frame transform error
fp_tpu = np.asarray(jax.jit(lambda x, f: jnp.einsum('im,ij,jn->mn', x, f, x))(Xj, Fj))
print(f"[p] X^T F X |tpu-cpu| = {np.abs(fp_tpu - fp).max():.3e}", flush=True)
