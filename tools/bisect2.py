"""Debug: implicit-diff AD correctness on a synthetic fixed point + H2O."""
import numpy as np
import jax
import jax.numpy as jnp

import dqc_tpu  # noqa: F401  (x64)
from dqc_tpu.scf.fixed_point import implicit_fixed_point

rng = np.random.RandomState(0)
n = 20
W = jnp.asarray(rng.randn(n, n) * 0.2)


def step(x, th):
    return jnp.tanh(W @ x + th)


def solver(th, x0):
    return jax.lax.fori_loop(0, 200, lambda i, x: step(x, th), x0)


th0 = jnp.asarray(rng.randn(n) * 0.5)


def f(th):
    return jnp.sum(jnp.sin(implicit_fixed_point(step, solver, th,
                                                jnp.zeros(n))))


g = jax.grad(f)(th0)
h = 1e-6
fd0 = (f(th0.at[3].add(h)) - f(th0.at[3].add(-h))) / (2 * h)
print("synthetic: grad[3]=", float(g[3]), "fd=", float(fd0),
      "finite:", bool(jnp.all(jnp.isfinite(g))))
H = jax.hessian(f)(th0)
print("synthetic hessian finite:", bool(jnp.all(jnp.isfinite(H))),
      " sym err:", float(jnp.abs(H - H.T).max()))

mol = dqc_tpu.Mol("O 0.0 0.0 0.2156; H 0.0 1.4749 -0.8625; "
                  "H 0.0 -1.4749 -0.8625", basis="3-21G")
qc = dqc_tpu.HF(mol)
p0 = qc._all_params()


@jax.jit
def e_of_ef(ef):
    p = jax.tree_util.tree_map(lambda x: x, p0)
    p["efield"] = ef
    return qc.energy_fn(p)


ge = jax.jit(jax.grad(e_of_ef))(p0["efield"])
print("H2O defield grad:", np.asarray(ge), "finite:",
      bool(jnp.all(jnp.isfinite(ge))))
