"""One-process TPU lab: purification noise bisection + device-iteration
cost decomposition (single tunnel claim; the axon relay wedges ~20 min
when clients churn).

Phase A — noise bisection at the converged projector D*:
  A1 unrolled McWeeney x10 (jit, no fori_loop)
  A2 fori_loop McWeeney x10
  A3 fori_loop PM body (the real purify_orth) from D* (should stay put)
  drift |D - D*| reveals where the ~5e-7/iteration eigenvalue noise
  enters (standalone matmul is 3.6e-14-accurate).

Phase B — per-piece cost of the device f64 SCF iteration via 20x scan:
  jk (eri_k+eri_j einsums) | vxc | purify(72) | full step
"""
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
s = np.asarray(theta["ovlp"], dtype=np.float64)
w, v = np.linalg.eigh(0.5*(s+s.T)); keep = w > 1e-9*w[-1]
X = v * np.where(keep, 1/np.sqrt(np.where(keep, w, 1)), 0.0)[None, :]
occ = np.asarray(theta["occ"], dtype=np.float64)
fp = X.T @ F @ X
ev, u = np.linalg.eigh(fp)
nocc = int(round(occ.sum()/2))
Dstar = u[:, :nocc] @ u[:, :nocc].T      # orth-frame exact projector
print(f"[lab] setup done; nocc={nocc}", flush=True)

Dj = jnp.asarray(Dstar)

# --- A1: unrolled McWeeney ----------------------------------------
@jax.jit
def mcw_unroll(d):
    for _ in range(10):
        d2 = d @ d
        d = 3.0 * d2 - 2.0 * (d2 @ d)
    return d
d1 = np.asarray(mcw_unroll(Dj))
print(f"[lab] A1 unrolled mcweeney x10 drift = "
      f"{np.abs(d1-Dstar).max():.3e}", flush=True)

# --- A2: fori_loop McWeeney ---------------------------------------
@jax.jit
def mcw_fori(d):
    def body(_, dk):
        d2 = dk @ dk
        return 3.0 * d2 - 2.0 * (d2 @ dk)
    return jax.lax.fori_loop(0, 10, body, d)
d2_ = np.asarray(mcw_fori(Dj))
print(f"[lab] A2 fori mcweeney x10 drift = "
      f"{np.abs(d2_-Dstar).max():.3e}", flush=True)

# --- A3: the real purify from the orth Fock (floor reference) -----
from dqc_tpu.scf.purify import purify_orth
fp_j = jnp.asarray(fp)
d3 = np.asarray(jax.jit(lambda f: purify_orth(f, nocc, iters=72))(fp_j))
print(f"[lab] A3 purify_orth(fp,72) |D-D*| = "
      f"{np.abs(d3-Dstar).max():.3e}", flush=True)
# eigenvalue deviations of the purified D (which side of the gap?)
xev = np.sort(np.linalg.eigvalsh(d3))
print(f"[lab] A3 eig deviations: near0 {xev[-nocc-3:-nocc][::-1]} "
      f"near1 {1-xev[-3:]}", flush=True)

# single-matmul (same operand) reference
pm = np.asarray(jax.jit(lambda a: a @ a)(Dj))
print(f"[lab] single D*@D* err = {np.abs(pm - Dstar@Dstar).max():.3e}",
      flush=True)

# --- B: cost decomposition ----------------------------------------
def timeit(fn, *args, n=3):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else \
        fn(*args).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
        (r[0] if isinstance(r, tuple) else r).block_until_ready()
    return (time.perf_counter() - t0) / n

dmj = jnp.asarray(np.einsum("ik,k,jk->ij", X @ u, occ, X @ u))

SCAN_N = 20
def scanned(body):
    @jax.jit
    def run(x0):
        def f(c, _):
            return body(c), None
        out, _ = jax.lax.scan(f, x0, None, length=SCAN_N)
        return out
    return run

def _jk_body(d):
    j, k = eng.jk_parts(d, theta)
    return (j + k) * 1e-8 + d     # consume BOTH so neither einsum DCEs
jk_fn = scanned(_jk_body)
t_jk = timeit(jk_fn, dmj) / SCAN_N
print(f"[lab] B jk einsums       : {t_jk*1e3:8.2f} ms/it", flush=True)

from dqc_tpu.xc.integrate import vxc_matrix
vxc_fn = scanned(lambda d: vxc_matrix(eng.xc, d, theta["grid"],
                                      eng.polarized) * 1e-8 + d)
t_vxc = timeit(vxc_fn, dmj) / SCAN_N
print(f"[lab] B vxc grid pass    : {t_vxc*1e3:8.2f} ms/it", flush=True)

Xj, kj, oj = jnp.asarray(X), jnp.asarray(keep), jnp.asarray(occ)
from dqc_tpu.scf.purify import fock_to_dm_purify
pur_fn = scanned(lambda f: fock_to_dm_purify(f, Xj, kj, oj) * 1e-8 + f)
t_pur = timeit(pur_fn, jnp.asarray(F))
print(f"[lab] B purify(72)       : {t_pur/SCAN_N*1e3:8.2f} ms/it", flush=True)

def full_step(f):
    d = fock_to_dm_purify(f, Xj, kj, oj)
    j, k = eng.jk_parts(d, theta)
    fn = eng.fock_from_parts(d, j, k, theta)
    return fn
step_fn = scanned(full_step)
t_step = timeit(step_fn, jnp.asarray(F))
print(f"[lab] B full step        : {t_step/SCAN_N*1e3:8.2f} ms/it", flush=True)

# DIIS-solve while_loop per-iteration (the real device phase)
t0 = time.perf_counter()
out = qc._device_phase(dict(theta, X=Xj, keep=kj), F, 1e-8,
                       qc.opts.maxiter, "lab64")
print(f"[lab] B _device_phase total {time.perf_counter()-t0:.2f}s",
      flush=True)
print("[lab] done", flush=True)
