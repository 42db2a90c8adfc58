"""Split-module adjoint (scf/adjoint.py) vs the monolithic implicit-diff
gradient (jax.grad through fixed_point.implicit_fixed_point).

The adjoint exists so benzene/def2-SVP-scale forces can run on the TPU,
where the monolithic traced program exceeds the remote AOT compiler's
budget (scf/qccalc.HOST_LOOP_NAO rationale); equality against jax.grad at
small scale is the correctness oracle (reference backward-stack parity:
dqc/qccalc/scf_qccalc.py:105-116)."""
import numpy as np
import jax
import pytest

import dqc_tpu
from dqc_tpu.scf import qccalc as qmod
from dqc_tpu.scf.fixed_point import SCFOptions

# gradient-equality oracles need BOTH fixed points well below the assert
# tolerances (the production tol default is 1e-8; two different solvers
# each within 1e-8 of the true fixed point differ by ~1e-8)
TIGHT = SCFOptions(tol=1e-12)

DESC = "O 0 0 0.2217; H 0 1.4309 -0.8867; H 0 -1.4309 -0.8867"


def _maxdiff(a, b):
    return np.abs(np.asarray(a) - np.asarray(b)).max()


def test_adjoint_matches_autodiff_ks_dense():
    """Dense-ERI hybrid KS: full params-tree gradient equality."""
    qc = dqc_tpu.KS(dqc_tpu.Mol(DESC, basis="sto-3g", grid=1), xc="b3lyp",
                    opts=TIGHT)
    qc.run()
    p = qc._all_params(with_fields=False)
    g_ref = jax.grad(qc.energy_fn)(p)
    g_adj = qc.energy_grad(p)
    assert _maxdiff(g_ref["basis"]["atompos"],
                    g_adj["basis"]["atompos"]) < 1e-10
    assert _maxdiff(g_ref["atomzs"], g_adj["atomzs"]) < 1e-10
    for ci in range(len(g_ref["basis"]["alphas"])):
        assert _maxdiff(g_ref["basis"]["alphas"][ci],
                        g_adj["basis"]["alphas"][ci]) < 1e-9
        assert _maxdiff(g_ref["basis"]["coeffs"][ci],
                        g_adj["basis"]["coeffs"][ci]) < 1e-9


def test_adjoint_matches_autodiff_hf_blocked():
    """Blocked (quartet-block theta + eri_k) HF path — the mode the
    def2-SVP benzene headline uses."""
    old = qmod.DENSE_ERI_BYTES_LIMIT
    qmod.DENSE_ERI_BYTES_LIMIT = 0
    try:
        qc = dqc_tpu.HF(dqc_tpu.Mol(DESC, basis="3-21g"), opts=TIGHT)
        qc.run()
        p = qc._all_params(with_fields=False)
        g_ref = jax.grad(qc.energy_fn)(p)
        g_adj = qc.energy_grad(p)
        assert _maxdiff(g_ref["basis"]["atompos"],
                        g_adj["basis"]["atompos"]) < 1e-9
    finally:
        qmod.DENSE_ERI_BYTES_LIMIT = old


def test_adjoint_polarized_df():
    """Unrestricted + density-fitted path (spin-stacked dm, df theta).
    Closed-shell H2O driven through the polarized engine: an open-shell
    species with a partially filled DEGENERATE level (e.g. the OH
    radical's pi pair) has a gauge-ambiguous density matrix whose
    gradient legitimately differs between solvers at ~1e-5 — not a valid
    equality oracle."""
    mol = dqc_tpu.Mol(DESC, basis="sto-3g", grid=1).densityfit()
    qc = dqc_tpu.KS(mol, xc="gga_x_pbe + gga_c_pbe", restricted=False,
                    opts=TIGHT)
    qc.run()
    p = qc._all_params(with_fields=False)
    g_ref = jax.grad(qc.energy_fn)(p)
    g_adj = qc.energy_grad(p)
    assert _maxdiff(g_ref["basis"]["atompos"],
                    g_adj["basis"]["atompos"]) < 1e-9


def test_hvp_matches_autodiff_ks_dense():
    """Split-module Hessian-vector product (energy_hvp, forward-over-
    reverse through the implicit fixed point) == jvp-of-grad of the
    monolithic energy_fn, for a position direction and a field direction
    (the two directions properties at scale need: vibrations and
    polarizability/IR)."""
    from dqc_tpu.scf.adjoint import energy_hvp, _zeros_tangent
    qc = dqc_tpu.KS(dqc_tpu.Mol(DESC, basis="sto-3g", grid=1), xc="pbe",
                    opts=TIGHT)
    qc.run()
    p = qc._all_params()          # with fields: efield tangents flow
    qc.energy_grad(p)             # primes the adjoint state at p

    def hvp_ref(v):
        return jax.jvp(jax.grad(qc.energy_fn), (p,), (v,))[1]

    # position direction
    v = _zeros_tangent(p)
    vpos = np.zeros(np.asarray(p["basis"]["atompos"]).shape)
    vpos[0, 2] = 1.0
    v["basis"]["atompos"] = jax.numpy.asarray(vpos)
    hv_ref = hvp_ref(v)
    hv_adj = energy_hvp(qc, v, p)
    assert _maxdiff(hv_ref["basis"]["atompos"],
                    hv_adj["basis"]["atompos"]) < 1e-8
    assert _maxdiff(hv_ref["efield"], hv_adj["efield"]) < 1e-8

    # field direction: gives a polarizability column + dmu/dpos row
    v2 = _zeros_tangent(p)
    v2["efield"] = jax.numpy.asarray(np.array([0.0, 0.0, 1.0]))
    hv2_ref = hvp_ref(v2)
    hv2_adj = energy_hvp(qc, v2, p)
    assert _maxdiff(hv2_ref["efield"], hv2_adj["efield"]) < 1e-8
    assert _maxdiff(hv2_ref["basis"]["atompos"],
                    hv2_adj["basis"]["atompos"]) < 1e-8
