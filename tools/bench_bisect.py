"""Bisect the benzene-on-TPU worker crash: run SCF-loop pieces separately
against the cached theta."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import dqc_tpu as dq
from __graft_entry__ import _benzene_mol

t0 = time.time()
mol = _benzene_mol(basis="3-21g")
mol.set_cache("/root/repo/.bench_theta_3-21g.npz")
qc = dq.KS(mol, xc="b3lyp")
params = qc._all_params()

# load/build theta via the cached path
import jax.tree_util as jtu
from dqc_tpu.utils.cache import Cache

cache = Cache("/root/repo/.bench_theta_3-21g.npz",
              signature=mol.cache_signature)
shapes = jax.eval_shape(qc._build_theta, params)
leaves_shape, treedef = jtu.tree_flatten(shapes)


def compute_theta():
    th = jax.jit(qc._build_theta)(params)
    return jtu.tree_flatten(th)[0]


leaves = cache.cache_multi([f"theta/{i}" for i in range(len(leaves_shape))],
                           compute_theta)
theta = jtu.tree_unflatten(treedef, [jnp.asarray(l) for l in leaves])
print(f"[{time.time()-t0:.0f}s] theta ready; nao={mol.meta.nao}")

eng = qc.engine
nao = mol.meta.nao
dm0 = jnp.zeros((nao, nao))

# piece 1: one fock build (J/K + vxc)
f = jax.jit(lambda d, th: eng.fock(d, th))(dm0, theta)
print(f"[{time.time()-t0:.0f}s] fock: finite={bool(jnp.all(jnp.isfinite(f)))}")

# piece 2: dm from fock (orthogonalizer + eigh)
d1 = jax.jit(lambda ff, th: eng.dm_from_fock(ff, th))(f, theta)
print(f"[{time.time()-t0:.0f}s] eigh/dm: finite={bool(jnp.all(jnp.isfinite(d1)))}")

# piece 3: a python-loop SCF (no while_loop) for 25 iterations
step0 = jax.jit(lambda d, th: eng.step(d, th))
step = lambda d: step0(d, theta)
d = dm0
for i in range(25):
    d = step(d)
ene = jax.jit(lambda d, th: eng.energy(d, th))(d, theta)
print(f"[{time.time()-t0:.0f}s] 25 plain iters: E = {float(ene):.8f}")

# piece 4: the DIIS while_loop solver
dm_star = jax.jit(lambda th: qc._solver(th, dm0))(theta)
ene2 = jax.jit(lambda d, th: eng.energy(d, th))(dm_star, theta)
print(f"[{time.time()-t0:.0f}s] DIIS solve: E = {float(ene2):.8f}")
