"""Debug: H2O position-gradient NaN — theta path vs implicit path."""
import numpy as np
import jax
import jax.numpy as jnp

import dqc_tpu
import jax.tree_util as jtu

mol = dqc_tpu.Mol("O 0.0 0.0 0.2156; H 0.0 1.4749 -0.8625; "
                  "H 0.0 -1.4749 -0.8625", basis="3-21G")
qc = dqc_tpu.HF(mol)
p0 = qc._all_params()


def with_pos(pos):
    p = jtu.tree_map(lambda x: x, p0)
    p["basis"] = dict(p0["basis"])
    p["basis"]["atompos"] = pos
    return p


pos0 = p0["basis"]["atompos"]

# converged dm (constant)
dm, theta0 = jax.jit(qc.solve_dm)(p0)

# 1) enuc only
from dqc_tpu.scf.hamilton import nuclear_repulsion
g1 = jax.jit(jax.grad(lambda pos: nuclear_repulsion(p0["atomzs"], pos)))(pos0)
print("1) enuc grad finite:", bool(jnp.all(jnp.isfinite(g1))))

# 2) energy at fixed dm through theta rebuild
g2 = jax.jit(jax.grad(
    lambda pos: qc.engine.energy(dm, qc._build_theta(with_pos(pos)))))(pos0)
print("2) fixed-dm theta grad finite:", bool(jnp.all(jnp.isfinite(g2))),
      np.asarray(g2).round(5))

# 3) dm_from step map linearization: jvp of step at solution wrt dm
v = jnp.zeros_like(dm).at[0, 1].set(1.0).at[1, 0].set(1.0)
_, jv = jax.jvp(lambda x: qc.engine.step(x, theta0), (dm,), (v,))
print("3) step jvp finite:", bool(jnp.all(jnp.isfinite(jv))))

# 4) vjp of step wrt theta at solution
_, vjp_th = jax.vjp(lambda th: qc.engine.step(dm, th), theta0)
(tb,) = vjp_th(v)
bad = [jtu.keystr(pth) for pth, leaf in jtu.tree_flatten_with_path(tb)[0]
       if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating)
       and bool(jnp.any(jnp.isnan(leaf)))]
print("4) step vjp-theta NaNs:", bad if bad else "NONE")

# 5) full implicit grad
g5 = jax.jit(jax.grad(lambda pos: qc.energy_fn(with_pos(pos))))(pos0)
print("5) full grad finite:", bool(jnp.all(jnp.isfinite(g5))),
      np.asarray(g5).round(5))
