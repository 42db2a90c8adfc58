"""Equilibrium geometry via gradients through the converged SCF.

Parity with reference examples/01-equil-pos.py, but with JAX: the force is
an exact implicit-function gradient, and the optimizer is plain optax.
"""
import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import optax

import dqc_tpu


def main():
    mol0 = dqc_tpu.Mol("H 1 0 0; H -1 0 0", basis="3-21G")
    qc = dqc_tpu.HF(mol0)
    p0 = qc._all_params()

    @jax.jit
    def ene(pos):
        p = jax.tree_util.tree_map(lambda x: x, p0)
        p["basis"] = dict(p0["basis"])
        p["basis"]["atompos"] = pos
        return qc.energy_fn(p)

    pos = p0["basis"]["atompos"]
    opt = optax.adam(2e-2)
    state = opt.init(pos)
    vg = jax.jit(jax.value_and_grad(ene))
    for i in range(200):
        e, g = vg(pos)
        up, state = opt.update(g, state)
        pos = optax.apply_updates(pos, up)
        if i % 20 == 0:
            print(f"iter {i}: E = {float(e):.8f}  |g| = {float(jnp.abs(g).max()):.2e}")
    print("Equilibrium positions (Bohr):")
    print(pos)
    print("bond length:", float(jnp.linalg.norm(pos[0] - pos[1])),
          "(HF/3-21G H2 eq ~ 1.385 Bohr)")


if __name__ == "__main__":
    main()
