"""Debug: which integral's position-backward NaNs for H2O."""
import numpy as np
import jax
import jax.numpy as jnp

import dqc_tpu
from dqc_tpu.ops import integrals as I
from dqc_tpu.ops.eri import eri_dense

mol = dqc_tpu.Mol("O 0.0 0.0 0.2156; H 0.0 1.4749 -0.8625; "
                  "H 0.0 -1.4749 -0.8625", basis="3-21G")
meta = mol.meta
params = mol.params
pos0 = params["atompos"]
rng = np.random.RandomState(0)
w2 = jnp.asarray(rng.randn(meta.nao, meta.nao))
w4 = jnp.asarray(rng.randn(meta.nao, meta.nao, meta.nao, meta.nao))


def with_pos(pos):
    p = dict(params)
    p["atompos"] = pos
    return p


tests = {
    "overlap": lambda pos: jnp.sum(I.overlap(meta, with_pos(pos)) * w2),
    "kinetic": lambda pos: jnp.sum(I.kinetic(meta, with_pos(pos)) * w2),
    "nuclattr": lambda pos: jnp.sum(
        I.nuclattr(meta, with_pos(pos), mol.atomzs) * w2),
    "multipole_x": lambda pos: jnp.sum(
        I.multipole(meta, with_pos(pos), (1, 0, 0)) * w2),
    "eri": lambda pos: jnp.sum(eri_dense(meta, with_pos(pos)) * w4),
}
for name, f in tests.items():
    g = jax.jit(jax.grad(f))(pos0)
    ok = bool(jnp.all(jnp.isfinite(g)))
    print(f"{name}: grad finite={ok}")
    if not ok:
        # finite differences for comparison
        h = 1e-5
        fd = (f(pos0.at[0, 2].add(h)) - f(pos0.at[0, 2].add(-h))) / (2 * h)
        print("   fd[0,2]:", float(fd), " ad:", np.asarray(g)[0, 2])
