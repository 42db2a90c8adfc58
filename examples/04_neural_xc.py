"""Neural-XC (xcnn-style) training: learn an XC functional end-to-end
through the SCF fixed point, batched over molecules (BASELINE config 5).

The NN parameters enter theta; jax.grad flows through the implicit-diff
custom_vjp of the converged SCF, exactly as the reference does with
xitorch + CustomXC (reference dqc/xc/custom_xc.py), but batched with vmap
and data-parallel over a device mesh.
"""
import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
import optax

import dqc_tpu
from dqc_tpu.xc.custom import CustomXC


def nn_edens(p, d):
    """LDA-shaped functional with a learnable enhancement factor."""
    rho = d["rho"]
    x = rho ** (1.0 / 3.0)
    h = jnp.tanh(x[..., None] * p["w1"] + p["b1"])
    f = 1.0 + 0.2 * jnp.tanh(h @ p["w2"] + p["b2"])[..., 0]
    c = 0.75 * (3.0 / jnp.pi) ** (1.0 / 3.0)
    return -c * rho ** (4.0 / 3.0) * f


def main():
    key = jax.random.PRNGKey(0)
    nn0 = {"w1": jax.random.normal(key, (8,)) * 0.1, "b1": jnp.zeros(8),
           "w2": jax.random.normal(key, (8, 1)) * 0.1, "b2": jnp.zeros(1)}
    xc = CustomXC(nn_edens, nn0, family=1, key="nnxc")

    mol = dqc_tpu.Mol("H -0.5 0 0; H 0.5 0 0", basis="3-21G", grid=1)
    qc = dqc_tpu.KS(mol, xc=xc)
    p0 = qc._all_params()

    # training data: H2 dissociation-curve energies (synthetic targets here;
    # in practice CCSD(T) labels)
    dists = np.linspace(1.0, 2.2, 6)
    batch_pos = jnp.asarray([[[-d / 2, 0, 0], [d / 2, 0, 0]] for d in dists])
    targets = jnp.asarray([-1.10 - 0.02 * np.sin(d) for d in dists])

    def energy_one(pos, xcp):
        p = jax.tree_util.tree_map(lambda x: x, p0)
        p["basis"] = dict(p0["basis"])
        p["basis"]["atompos"] = pos
        p["xc_params"] = xcp
        return qc.energy_fn(p)

    @jax.jit
    def loss(xcp):
        es = jax.vmap(lambda pos: energy_one(pos, xcp))(batch_pos)
        return jnp.mean((es - targets) ** 2)

    xcp = {"nnxc": nn0}
    opt = optax.adam(3e-3)
    state = opt.init(xcp)
    vg = jax.jit(jax.value_and_grad(loss))
    for i in range(60):
        l, g = vg(xcp)
        up, state = opt.update(g, state)
        xcp = optax.apply_updates(xcp, up)
        if i % 10 == 0:
            print(f"iter {i}: loss = {float(l):.3e}")
    print(f"final loss = {float(loss(xcp)):.3e}")


if __name__ == "__main__":
    main()
