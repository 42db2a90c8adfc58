"""TPU lab phase C: per-iteration bisection of the purify_orth
subspace-rotation floor (1.5e-6 on TPU vs 2.4e-13 on CPU).

Runs the EXACT purify body as a scan emitting every iterate D_k and the
PM coefficient c_k; compares against a pure-numpy float64 replica.
Pinpoints the iteration (and op) where TPU diverges.
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

ITERS = 44

mol = _benzene_mol(basis="def2-svp")
mol.set_cache("/root/repo/.bench_theta_def2-svp.npz")
qc = dq.KS(mol, xc="b3lyp")
params = qc._all_params(with_fields=False)
theta = qc._materialize_theta(params, getattr(mol, "_cache_fname", None))
eng = qc.engine
from dqc_tpu.scf.qccalc import sad_dm0
d0m = sad_dm0(mol)
@jax.jit
def jit_step(dm, th):
    j, k = eng.jk_parts(dm, th)
    return eng.fock_from_parts(dm, j, k, th)
F = np.asarray(jit_step(jnp.asarray(d0m, dtype=jnp.float64), theta))
s = np.asarray(theta["ovlp"], dtype=np.float64)
w, v = np.linalg.eigh(0.5*(s+s.T)); keep = w > 1e-9*w[-1]
X = v * np.where(keep, 1/np.sqrt(np.where(keep, w, 1)), 0.0)[None, :]
fp = X.T @ F @ X
n = fp.shape[-1]
occ = np.asarray(theta["occ"], dtype=np.float64)
nocc = int(round(occ.sum() / 2))
print(f"[c] setup done n={n} nocc={nocc}", flush=True)


def init_d0(fp):
    diag = np.diag(fp)
    off = np.abs(fp).sum(-1) - np.abs(diag)
    fmin = (diag - off).min(); fmax = (diag + off).max()
    mu = np.trace(fp) / n
    lam = min(nocc / max(fmax - mu, 1e-300), (n - nocc) / max(mu - fmin, 1e-300))
    return (lam / n) * (mu * np.eye(n) - fp) + (nocc / n) * np.eye(n)


def body_np(dk):
    d2 = dk @ dk
    d3 = d2 @ dk
    tr_d2d3 = np.trace(d2 - d3)
    tr_dd2 = np.trace(dk - d2)
    c = tr_d2d3 / (tr_dd2 if abs(tr_dd2) > 1e-300 else 1.0)
    c = np.clip(c, 1e-6, 1 - 1e-6)
    c = c if tr_dd2 > 1e-8 else 0.5
    if c >= 0.5:
        dn = ((1.0 + c) * d2 - d3) / c
    else:
        dn = ((1.0 - 2.0 * c) * dk + (1.0 + c) * d2 - d3) / (1.0 - c)
    return dn, c, tr_dd2


# --- TPU trajectory (exact same body as purify_orth) ---------------
@jax.jit
def traj_tpu(fp_j):
    eye = jnp.eye(n, dtype=fp_j.dtype)
    diag = jnp.diagonal(fp_j)
    off = jnp.sum(jnp.abs(fp_j), axis=-1) - jnp.abs(diag)
    fmin = jnp.min(diag - off); fmax = jnp.max(diag + off)
    mu = jnp.trace(fp_j) / n
    noccj = jnp.asarray(float(nocc), fp_j.dtype)
    lam = jnp.minimum(noccj / jnp.maximum(fmax - mu, 1e-300),
                      (n - noccj) / jnp.maximum(mu - fmin, 1e-300))
    d0 = (lam / n) * (mu * eye - fp_j) + (noccj / n) * eye

    def step(dk, _):
        d2 = dk @ dk
        d3 = d2 @ dk
        tr_d2d3 = jnp.trace(d2 - d3)
        tr_dd2 = jnp.trace(dk - d2)
        c = tr_d2d3 / jnp.where(jnp.abs(tr_dd2) > 1e-300, tr_dd2, 1.0)
        c = jnp.clip(c, 1e-6, 1.0 - 1e-6)
        c = jnp.where(tr_dd2 > 1e-8, c, 0.5)
        hi = ((1.0 + c) * d2 - d3) / c
        lo = ((1.0 - 2.0 * c) * dk + (1.0 + c) * d2 - d3) / (1.0 - c)
        dn = jnp.where(c >= 0.5, hi, lo)
        return dn, (dn, c, tr_dd2)

    _, (ds, cs, trs) = jax.lax.scan(step, d0, None, length=ITERS)
    return d0, ds, cs, trs

t0 = time.time()
d0_t, ds_t, cs_t, trs_t = map(np.asarray, traj_tpu(jnp.asarray(fp)))
print(f"[c] tpu trajectory done in {time.time()-t0:.1f}s", flush=True)

# --- CPU replica ---------------------------------------------------
d = init_d0(fp)
print(f"[c] |d0_tpu - d0_cpu| = {np.abs(d0_t - d).max():.3e}", flush=True)
ev, u = np.linalg.eigh(fp)
Dstar = u[:, :nocc] @ u[:, :nocc].T
d_cpu = d.copy()
for k in range(ITERS):
    d_cpu, c_np, tr_np = body_np(d_cpu)
    dt = np.abs(ds_t[k] - d_cpu).max()
    derr_t = np.abs(ds_t[k] - Dstar).max()
    derr_c = np.abs(d_cpu - Dstar).max()
    print(f"[c] k={k:2d} c_tpu={cs_t[k]:+.6e} c_cpu={c_np:+.6e} "
          f"tr_tpu={trs_t[k]:+.3e} tr_cpu={tr_np:+.3e} "
          f"|tpu-cpu|={dt:.3e} |tpu-D*|={derr_t:.3e} |cpu-D*|={derr_c:.3e}",
          flush=True)
print("[c] done", flush=True)
