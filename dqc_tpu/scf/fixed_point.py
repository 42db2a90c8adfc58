"""SCF fixed-point solver with implicit-function differentiation.

TPU-native replacement for xitorch.optimize.equilibrium + its custom backward
as used by the reference (/root/reference/dqc/qccalc/scf_qccalc.py:105-116):

  forward:  DIIS-accelerated self-consistency loop as a lax.while_loop
            (compiles to one XLA program; no data-dependent Python control)
  backward: implicit function theorem at the converged point —
            solve (I - d step/d x)^T lam = xbar with GMRES on the VJP
            operator, then pull lam back onto theta. Gradients are exact
            independent of the forward iteration path, to all orders.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class SCFOptions(NamedTuple):
    maxiter: int = 80
    tol: float = 1e-10          # max |F D S - S D F| convergence criterion
    diis_size: int = 10
    diis_start: int = 1
    damping: float = 0.0        # simple mixing fraction of old Fock


def _flat(x):
    leaves = jax.tree_util.tree_leaves(x)
    return jnp.concatenate([l.ravel() for l in leaves])


def diis_solve(step_and_err: Callable, f0, opts: SCFOptions):
    """Generic CDIIS loop on a flattened state vector.

    step_and_err(f) -> (next Fock from the plain SC map, DIIS error vector,
    typically X^T [F,D,S] X). f0: initial state (any pytree).
    Returns (f_star, n_iter, final_err_norm).
    """
    import jax.flatten_util
    f0_flat, unravel = jax.flatten_util.ravel_pytree(f0)
    n = f0_flat.shape[0]
    H = opts.diis_size

    def step_flat(ff):
        f_new, e_new = step_and_err(unravel(ff))
        return (jax.flatten_util.ravel_pytree(f_new)[0],
                jax.flatten_util.ravel_pytree(e_new)[0])

    ne = step_flat(f0_flat)[1].shape[0]

    def body(state):
        it, ff, fhist, ehist, nfill, _ = state
        f_new, e_new = step_flat(ff)
        if opts.damping > 0.0:
            f_new = (1.0 - opts.damping) * f_new + opts.damping * ff
        errnorm = jnp.max(jnp.abs(e_new))
        # push into ring buffers
        slot = it % H
        fhist = fhist.at[slot].set(f_new)
        ehist = ehist.at[slot].set(e_new)
        nfill = jnp.minimum(nfill + 1, H)
        # DIIS extrapolation over filled slots (uniform scaling keeps the
        # constrained least-squares solution exact)
        filled = (jnp.arange(H) < nfill)
        B = ehist @ ehist.T
        scale = jnp.maximum(jnp.max(jnp.abs(B) * filled[:, None]
                                    * filled[None, :]), 1e-300)
        Bn = B / scale
        mask2 = filled[:, None] & filled[None, :]
        Bn = jnp.where(mask2, Bn, jnp.where(
            jnp.eye(H, dtype=bool), 1.0, 0.0))
        ones = jnp.where(filled, 1.0, 0.0)
        A = jnp.zeros((H + 1, H + 1), dtype=ff.dtype)
        A = A.at[:H, :H].set(Bn)
        A = A.at[:H, H].set(ones)
        A = A.at[H, :H].set(ones)
        rhs = jnp.zeros((H + 1,), dtype=ff.dtype).at[H].set(1.0)
        # symmetric-eigh solve: TPU implements f64 eigh but not f64 LU
        ew, ev = jnp.linalg.eigh(A)
        cutoff = 1e-14 * jnp.max(jnp.abs(ew))
        inv_w = jnp.where(jnp.abs(ew) > cutoff, 1.0 / ew, 0.0)
        c = (ev @ (inv_w * (ev.T @ rhs)))[:H] * filled
        f_diis = c @ fhist
        use_diis = (it + 1 >= opts.diis_start)
        ff_next = jnp.where(use_diis, f_diis, f_new)
        return (it + 1, ff_next, fhist, ehist, nfill, errnorm)

    def cond(state):
        it, _, _, _, _, errnorm = state
        return (it < opts.maxiter) & (errnorm > opts.tol)

    fhist0 = jnp.zeros((H, n), dtype=f0_flat.dtype)
    ehist0 = jnp.zeros((H, ne), dtype=f0_flat.dtype)
    state0 = (0, f0_flat, fhist0, ehist0, 0, jnp.asarray(1e9, f0_flat.dtype))
    it, ff, _, _, _, errnorm = jax.lax.while_loop(cond, body, state0)
    return unravel(ff), it, errnorm


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def implicit_fixed_point(step, solver, theta, x0):
    """x* with x* = step(x*, theta). Forward via `solver(theta, x0)`;
    gradients via the implicit function theorem (exact at convergence).

    step: (x, theta) -> x, pure. solver: (theta, x0) -> x*, any algorithm
    whose output satisfies the fixed point (it is not differentiated).
    """
    return solver(theta, x0)


def _ifp_fwd(step, solver, theta, x0):
    x_star = solver(theta, x0)
    return x_star, (theta, x_star)


def _ifp_bwd(step, solver, res, xbar):
    theta, x_star = res
    _, vjp_x = jax.vjp(lambda x: step(x, theta), x_star)
    _, vjp_theta = jax.vjp(lambda th: step(x_star, th), theta)

    def A(lam):
        # (I - (d step/dx)^T) lam
        (jlam,) = vjp_x(lam)
        return jax.tree_util.tree_map(lambda a, b: a - b, lam, jlam)

    lam, _ = jax.scipy.sparse.linalg.gmres(
        A, xbar, x0=xbar, tol=1e-12, atol=0.0, maxiter=100,
        solve_method="batched")
    (theta_bar,) = vjp_theta(lam)
    x0_bar = jax.tree_util.tree_map(jnp.zeros_like, x_star)
    return theta_bar, x0_bar


implicit_fixed_point.defvjp(_ifp_fwd, _ifp_bwd)
