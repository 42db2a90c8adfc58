"""Alchemical gradients: dE/dZ at constant electron count.

Parity with reference examples/03-alchemy-gradient.py — fractional nuclear
charges are first-class differentiable inputs (the nuclear-attraction
integrals and E_nn take a traced Z vector).
"""
import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

import dqc_tpu


def main():
    mol = dqc_tpu.Mol("N -1.0 0 0; N 1.0 0 0", basis="3-21G")
    qc = dqc_tpu.HF(mol)
    p0 = qc._all_params()

    def ene(zs):
        p = jax.tree_util.tree_map(lambda x: x, p0)
        p["atomzs"] = zs
        return qc.energy_fn(p)

    z0 = p0["atomzs"]
    g = jax.grad(ene)(z0)
    h = jax.hessian(ene)(z0)
    print("E(N2):", float(ene(z0)))
    print("dE/dZ:", g)
    print("d2E/dZ2:", h)


if __name__ == "__main__":
    main()
