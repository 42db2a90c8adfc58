"""diis_solve semantics (scf/fixed_point.py).

The handoff contract matters for performance: the device-batched SCF
phases (qccalc._device_phase) exit and hand their state onward.
diis_solve's step_and_err measures the residual of the PAIR
(step(ff), state-derived-from-ff), so it returns BOTH ends of the best
pair: the input f_in (pair-consistent — re-measuring from it reproduces
the reported best_err; use for final answers) and the raw map output
f_raw = step(f_in) (one extra map application contracts handoff noise;
use for phase chaining). Returning only the output amplified the
verifier's reading by the map Jacobian (measured ~47x, BENCH_r03);
returning only the input doubled the next phase's iteration count
(f32 noise handed through, bench r4b).
"""
import numpy as np
import jax.numpy as jnp

from dqc_tpu.scf.fixed_point import SCFOptions, diis_solve


def _linear_map(n, rho, seed=0):
    """x -> A x + b with spectral radius rho (non-contractive if rho>1,
    like the plain SCF map — the reason DIIS exists)."""
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    w = np.linspace(0.1, rho, n)
    A = (q * w) @ q.T
    b = rng.standard_normal(n)
    x_star = np.linalg.solve(np.eye(n) - A, b)
    return jnp.asarray(A), jnp.asarray(b), x_star


def test_returned_state_is_pair_consistent():
    """err reported == err a caller re-measures from the returned input,
    and the returned raw output is exactly step(input)."""
    n = 8
    A, b, x_star = _linear_map(n, rho=2.0)

    def step_and_err(x):
        x_new = A @ x + b
        return x_new, x_new - x

    opts = SCFOptions(tol=1e-10, maxiter=200, mixed=False,
                      diis_size=10, diis_patience=0)
    x0 = jnp.zeros(n)
    x_in, x_raw, it, best_err, _ = diis_solve(step_and_err, x0, opts)
    # caller-side re-measurement: exactly what qccalc's host verifier does
    step_out, e = step_and_err(x_in)
    remeasured = float(np.abs(np.asarray(e)).max())
    assert np.isfinite(remeasured)
    assert remeasured <= float(best_err) * (1 + 1e-9), (
        f"handoff amplification: reported {float(best_err):.3e}, "
        f"re-measured {remeasured:.3e}")
    # raw output is the map applied to the input (chaining contract)
    assert np.abs(np.asarray(step_out) - np.asarray(x_raw)).max() < 1e-14
    # and it actually solved the system
    assert np.abs(np.asarray(x_in) - x_star).max() < 1e-8


def test_patience_bail_returns_best_input():
    """With an error floor (noisy map), the stall exit must hand back a
    state whose re-measured residual is the reported best, not an
    amplified one."""
    n = 10
    A, b, x_star = _linear_map(n, rho=2.0, seed=3)
    noise = jnp.asarray(np.random.default_rng(7).standard_normal(n))

    def step_and_err(x):
        x_new = A @ x + b + 1e-7 * noise * jnp.sign(jnp.sum(x) + 0.1)
        return x_new, x_new - x

    opts = SCFOptions(tol=1e-14, maxiter=300, mixed=False,
                      diis_size=8, diis_patience=6)
    x_in, x_raw, it, best_err, _ = diis_solve(step_and_err, jnp.zeros(n),
                                           opts)
    assert int(it) < 300, "patience exit did not trigger"
    _, e = step_and_err(x_in)
    remeasured = float(np.abs(np.asarray(e)).max())
    # the floor is ~1e-7 * |noise| * amplification; the contract is only
    # that re-measurement reproduces the report (no extra map application)
    assert remeasured <= float(best_err) * (1 + 1e-9)
