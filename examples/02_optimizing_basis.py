"""Basis-set optimization: gradients w.r.t. exponents & contractions.

Parity with reference examples/02-optimizing-basis.py. No Packer machinery
needed — the basis parameters are already a pytree.
"""
import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import optax

import dqc_tpu


def main():
    mol = dqc_tpu.Mol("H 1 0 0; H -1 0 0", basis="3-21G")
    qc = dqc_tpu.HF(mol)
    p0 = qc._all_params()

    def pack(x):
        p = jax.tree_util.tree_map(lambda v: v, p0)
        b = dict(p0["basis"])
        b["alphas"] = [jnp.exp(x["log_alphas"])]
        b["coeffs"] = [x["coeffs"]]
        p["basis"] = b
        return p

    x = {"log_alphas": jnp.log(p0["basis"]["alphas"][0]),
         "coeffs": p0["basis"]["coeffs"][0]}

    @jax.jit
    def ene(x):
        return qc.energy_fn(pack(x))

    print(f"start: E = {float(ene(x)):.8f}")
    opt = optax.adam(5e-2)
    state = opt.init(x)
    vg = jax.jit(jax.value_and_grad(ene))
    for i in range(300):
        e, g = vg(x)
        up, state = opt.update(g, state)
        x = optax.apply_updates(x, up)
        if i % 50 == 0:
            print(f"iter {i}: E = {float(e):.8f}")
    print(f"optimized: E = {float(ene(x)):.8f}")
    print("optimized exponents:", jnp.exp(x["log_alphas"]))


if __name__ == "__main__":
    main()
