"""Host-orchestrated split-module adjoint: exact SCF gradients at scales
where the monolithic traced program cannot compile.

`energy_fn` traces theta build + DIIS while_loop + implicit JVP into ONE
XLA program; at def2-SVP benzene scale that monolith is exactly what blew
past the remote TPU AOT compiler's budget (the reason
SCF_QCCalc.HOST_LOOP_NAO exists). This module computes the SAME
implicit-function-theorem gradient as `fixed_point.implicit_fixed_point`
(reference backward-stack parity: dqc/qccalc/scf_qccalc.py:105-116,
xitorch equilibrium custom backward), but as a sequence of small jitted
modules mirroring `_materialize_theta`'s part split:

  1. dm*, theta from the host-driven run() (theta parts disk-cacheable)
  2. dE/ddm and dE/dtheta at (dm*, theta)            [one jitted module]
  3. lambda solve (I - dstep/ddm)^T lam = dE/ddm      [host GMRES over a
     jitted step-transpose matvec; one device dispatch per Krylov vector]
  4. bar_theta = dE/dtheta + (dstep/dtheta)^T lam     [one jitted module]
  5. dE/dparams = sum_parts VJP_part(params, bar_theta | part outputs)
     [one jitted module per theta part — the same granularity that makes
     the forward build compile on the remote TPU AOT compiler]

Orthogonalizer subtlety: the host-driven solve replaces theta["X"] with a
host-LAPACK X (scf/qccalc._host_solve), so theta's X tensor is NOT the
traced function of ovlp the forward parts built. The adjoint therefore
recomputes X/keep in-graph from theta["ovlp"] (scf/orth.orthogonalizer,
polished safe_eigh) inside its step/energy closures: bar flows into
bar_ovlp consistently, and the stored X tensor's provenance is irrelevant.
dm* is frame-invariant, so the fixed-point residual of the in-graph step
at dm* is at the SCF tolerance, which bounds the gradient error.
"""
from __future__ import annotations

import os
from typing import Callable, Dict

import numpy as np
import jax
import jax.numpy as jnp

from .orth import orthogonalizer


def _with_ingraph_orth(theta):
    th = dict(theta)
    X, keep = orthogonalizer(th["ovlp"])
    th["X"], th["keep"] = X, keep
    return th


def _is_float0(x):
    return getattr(x, "dtype", None) == jax.dtypes.float0


def _add_bars(a, b):
    """Combine two cotangents (nested pytrees), None/float0 = zero."""
    if a is None or _is_float0(a):
        return b
    if b is None or _is_float0(b):
        return a
    if isinstance(a, dict):
        return {k: _add_bars(a.get(k), (b or {}).get(k))
                for k in set(a) | set(b)}
    if isinstance(a, (list, tuple)):
        return type(a)(_add_bars(x, y) for x, y in zip(a, b))
    return a + b


def _zeros_cotangent(sd, bar):
    """Cotangent pytree matching a part's output eval_shape: take entries
    from `bar` where present, zeros elsewhere, float0 for non-inexact
    outputs (bool masks etc.). Recurses into nested containers (the grid
    part's tables are a dict of arrays)."""
    if sd is None:
        return None
    if isinstance(sd, dict):
        bar = bar if isinstance(bar, dict) else {}
        return {k: _zeros_cotangent(v, bar.get(k)) for k, v in sd.items()}
    if isinstance(sd, (list, tuple)):
        if not isinstance(bar, (list, tuple)) or len(bar) != len(sd):
            bar = [None] * len(sd)
        return type(sd)(_zeros_cotangent(v, b) for v, b in zip(sd, bar))
    if jnp.issubdtype(sd.dtype, jnp.inexact):
        if bar is None or _is_float0(bar):
            return jnp.zeros(sd.shape, sd.dtype)
        return jnp.asarray(bar, sd.dtype)
    return np.zeros(sd.shape, dtype=jax.dtypes.float0)


def _gmres(matvec: Callable[[np.ndarray], np.ndarray], b: np.ndarray,
           tol: float = 1e-12, maxiter: int = 200, restart: int = 60):
    """Host restarted GMRES on a flattened real system. One device
    dispatch per Krylov vector; the system (I - dstep/ddm)^T is well
    conditioned near an SCF fixed point (contraction mapping)."""
    n = b.shape[0]
    bn = float(np.linalg.norm(b))
    if bn == 0.0:
        return np.zeros(n), 0.0
    x = b.copy()   # warm start at b (J ~ small near convergence)
    total_it = 0
    while total_it < maxiter:
        r = b - matvec(x)
        beta = float(np.linalg.norm(r))
        if beta / bn < tol:
            return x, beta / bn
        m = min(restart, maxiter - total_it)
        Q = np.zeros((m + 1, n))
        H = np.zeros((m + 1, m))
        Q[0] = r / beta
        k_done = m
        for k in range(m):
            w = matvec(Q[k])
            for i in range(k + 1):
                H[i, k] = float(w @ Q[i])
                w = w - H[i, k] * Q[i]
            H[k + 1, k] = float(np.linalg.norm(w))
            total_it += 1
            if H[k + 1, k] < 1e-300:
                k_done = k + 1
                break
            Q[k + 1] = w / H[k + 1, k]
            # cheap residual estimate via the least-squares problem
            e1 = np.zeros(k + 2)
            e1[0] = beta
            y, res, _, _ = np.linalg.lstsq(H[:k + 2, :k + 1], e1,
                                           rcond=None)
            resid = float(np.linalg.norm(H[:k + 2, :k + 1] @ y - e1))
            if resid / bn < tol:
                k_done = k + 1
                break
        e1 = np.zeros(k_done + 1)
        e1[0] = beta
        y, _, _, _ = np.linalg.lstsq(H[:k_done + 1, :k_done], e1,
                                     rcond=None)
        x = x + y @ Q[:k_done]
    r = b - matvec(x)
    return x, float(np.linalg.norm(r)) / bn


def energy_grad(qc, params=None):
    """dE/dparams by the split-module adjoint. Requires (or triggers) a
    converged run(); returns a pytree matching `params`
    (default qc._all_params(with_fields=False))."""
    from ..utils.logger import log
    import time as _time
    eng = qc.engine
    if params is None:
        params = qc._all_params(with_fields=False)
    if not getattr(qc, "_has_run", False):
        qc.run()
    theta = dict(qc._theta)
    # mirror solve_dm's expansion-trust logic: traced modules must not
    # contain the device eri_k contraction if the expansion is untrusted
    # AND must not pull gradients back through the expansion program —
    # the blocks path serves both (provably correct on the axon TPU)
    if "eri_k" in theta:
        theta.pop("eri_k")
    theta.pop("eri_j", None)   # derived from eri_k; same reasoning
    theta.pop("eri_dsh", None)  # forward-only pallas planes (no AD rules)
    theta.pop("eri_dsl", None)
    if isinstance(theta.get("grid"), dict) \
            and ("ozk" in theta["grid"] or "dsg" in theta["grid"]):
        # forward-only derived grid data (Ozaki round() has zero
        # derivative; the DS pallas planes have no AD rules)
        theta["grid"] = {k: v for k, v in theta["grid"].items()
                         if k not in ("ozk", "dsg")}
    if "jkb0" not in theta:
        # _maybe_expand_j evicts the quartet blocks to host once both
        # dense layouts are trusted (HBM hygiene); with eri_k/eri_j
        # popped the engine would have NO exchange path (df_k KeyError,
        # ADVICE r3). Re-insert the saved host copies.
        jkb_host = getattr(qc, "_jkb_host", None)
        if jkb_host:
            theta.update({k: jnp.asarray(v) for k, v in jkb_host.items()})
    dm = jnp.asarray(qc._dm)
    cache = qc.__dict__.setdefault("_adjoint_cache", {})

    def step_fn(d, th):
        return eng.step(d, _with_ingraph_orth(th))

    def energy_fn(d, th):
        return eng.energy(d, _with_ingraph_orth(th))

    # DQC_TPU_ADJOINT_CPU_PULLBACK=1: run every COTANGENT-producing
    # module (energy partials, bar_theta, per-part pullbacks) on the
    # in-process CPU backend, keeping only the forward solve and the
    # GMRES step-transpose matvecs on the device. Isolation knob for
    # backend miscompiles of the big fused f64 VJP programs (the axon
    # TPU demonstrably miscompiles one fused f64 op class already,
    # scf/jk.expand_k_tensor).
    # DEFAULT ON for non-CPU backends (measured on the axon TPU, benzene
    # def2-SVP B3LYP: device cotangent modules give |dF| 1.4e-2 vs the
    # CPU oracle — the fused-f64 miscompile class — while CPU pullbacks
    # at the same forward state give ~1e-10-level parity; the emulated
    # pow range also overflows the second-order chains outright unless
    # the density screen is raised, DQC_TPU_DENS_SCREEN_TPU). Set =0 to
    # force device pullbacks on a backend you trust.
    cpu_pull = os.environ.get(
        "DQC_TPU_ADJOINT_CPU_PULLBACK",
        "0" if jax.default_backend() == "cpu" else "1") == "1"
    import contextlib

    def pull_ctx():
        if cpu_pull and jax.default_backend() != "cpu":
            return jax.default_device(jax.devices("cpu")[0])
        return contextlib.nullcontext()

    # --- module 2: energy partials ------------------------------------
    if "e_partials" not in cache:
        @jax.jit
        def e_partials(d, th):
            e, vjp = jax.vjp(energy_fn, d, th)
            bar_d, bar_th = vjp(jnp.ones((), e.dtype))
            return e, bar_d, bar_th
        cache["e_partials"] = e_partials
    t0 = _time.perf_counter()
    with pull_ctx():
        _, bar_dm_e, bar_theta_e = cache["e_partials"](
            *(jax.device_put((dm, theta), jax.devices("cpu")[0])
              if cpu_pull else (dm, theta)))
    log(f"adjoint: energy partials in {_time.perf_counter()-t0:.2f}s"
        f"{' [cpu]' if cpu_pull else ''}")
    if not np.all(np.isfinite(np.asarray(bar_dm_e))):
        raise RuntimeError(
            "adjoint: energy-partials VJP returned non-finite bar_dm "
            "on this backend — isolate with tools/tpu_force_demo")

    # --- module 3: lambda solve ---------------------------------------
    if "step_T_mv" not in cache:
        @jax.jit
        def step_T_mv(d, th, v):
            _, vjp = jax.vjp(lambda dd: step_fn(dd, th), d)
            return vjp(v)[0]
        cache["step_T_mv"] = step_T_mv
    shape = bar_dm_e.shape

    def matvec(vflat):
        # the step-transpose is a second-order program too: run it with
        # the cotangent modules' backend policy (see cpu_pull above)
        with pull_ctx():
            if cpu_pull:
                cpu = jax.devices("cpu")[0]
                args = jax.device_put(
                    (dm, theta, jnp.asarray(vflat.reshape(shape))), cpu)
            else:
                args = (dm, theta, jnp.asarray(vflat.reshape(shape)))
            jv = np.asarray(cache["step_T_mv"](*args),
                            dtype=np.float64).ravel()
        if not np.all(np.isfinite(jv)):
            raise RuntimeError(
                "adjoint: step-transpose matvec returned non-finite "
                "values on this backend (eigh-VJP / functional-derivative "
                "chain suspect) — isolate with tools/tpu_force_demo")
        return vflat - jv

    t0 = _time.perf_counter()
    b = np.asarray(bar_dm_e, dtype=np.float64).ravel()
    lam_flat, rel = _gmres(matvec, b, tol=1e-12)
    log(f"adjoint: lambda GMRES rel={rel:.2e} "
        f"in {_time.perf_counter()-t0:.2f}s")
    if rel > 1e-8:
        # the plain SC map's spectral radius commonly exceeds 1 (that is
        # why DIIS exists), so (I - dstep/ddm)^T can be ill-conditioned
        # for small-gap systems; a silently unconverged lambda would
        # masquerade as a valid gradient (ADVICE r3)
        import warnings
        warnings.warn(
            f"adjoint: lambda GMRES did not converge (rel={rel:.2e} > "
            "1e-8); the returned gradient error is of the same order. "
            "Small-gap system? Raise maxiter/restart in scf/adjoint._gmres "
            "or use the monolithic energy_grad path.",
            RuntimeWarning, stacklevel=2)
    lam = jnp.asarray(lam_flat.reshape(shape))

    # --- module 4: bar_theta ------------------------------------------
    if "step_theta_vjp" not in cache:
        @jax.jit
        def step_theta_vjp(d, th, v):
            _, vjp = jax.vjp(lambda t: step_fn(d, t), th)
            return vjp(v)[0]
        cache["step_theta_vjp"] = step_theta_vjp
    t0 = _time.perf_counter()
    with pull_ctx():
        bar_theta_s = cache["step_theta_vjp"](
            *(jax.device_put((dm, theta, lam), jax.devices("cpu")[0])
              if cpu_pull else (dm, theta, lam)))
    bar_theta = {k: _add_bars(bar_theta_e.get(k), bar_theta_s.get(k))
                 for k in theta}
    bar_theta = {k: v for k, v in bar_theta.items()
                 if v is not None and not _is_float0(v)}
    log(f"adjoint: bar_theta in {_time.perf_counter()-t0:.2f}s")

    # --- module 5: per-part parameter pullbacks -----------------------
    parts: Dict[str, Callable] = getattr(qc, "_theta_parts", None) or \
        {"all": qc._build_theta}
    grad = jax.tree_util.tree_map(jnp.zeros_like, params)
    for name, fn in parts.items():
        key = f"part_vjp/{name}"
        if key not in cache:
            def part_vjp(p, bar, fn=fn):
                _, vjp = jax.vjp(fn, p)
                return vjp(bar)[0]
            cache[key] = jax.jit(part_vjp)
        shapes = jax.eval_shape(fn, params)
        bar_part = _zeros_cotangent(shapes, bar_theta)
        t0 = _time.perf_counter()
        if cpu_pull:
            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                g = cache[key](*jax.device_put((params, bar_part), cpu))
            grad = jax.tree_util.tree_map(_add_bars, grad, g)
            log(f"adjoint: part[{name}] pullback in "
                f"{_time.perf_counter()-t0:.2f}s [cpu]")
            continue
        try:
            g = cache[key](params, bar_part)
            jax.block_until_ready(jax.tree_util.tree_leaves(g)[0])
            tag = ""
        except jax.errors.JaxRuntimeError as ex:
            # some integral-build VJP programs exceed the chip's HBM
            # under f64 emulation (each big f64 intermediate splits into
            # f32 pairs; measured: a benzene def2-SVP quartet-block part
            # VJP wants 17.3 G of 15.75 G). The split-module design makes
            # the per-part pullback backend-agnostic: rerun just this
            # part on the in-process CPU backend (LAPACK f64 — bitwise
            # the same math that defines the CPU force oracle).
            log(f"adjoint: part[{name}] device pullback failed "
                f"({type(ex).__name__}); recomputing on the CPU backend")
            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                pc = jax.device_put(params, cpu)
                bc = jax.device_put(bar_part, cpu)
                g = jax.jit(lambda p, b, fn=fn:
                            jax.vjp(fn, p)[1](b)[0])(pc, bc)
            tag = " [cpu]"
        grad = jax.tree_util.tree_map(_add_bars, grad, g)
        log(f"adjoint: part[{name}] pullback in "
            f"{_time.perf_counter()-t0:.2f}s{tag}")
    # second-derivative machinery (energy_hvp) reuses the converged primal
    # adjoint state: lambda and the per-part cotangents
    qc._adjoint_state = {"params": params, "theta": theta, "dm": dm,
                         "lam": lam, "bar_theta": bar_theta,
                         "cpu_pull": cpu_pull}
    return grad


def _zeros_tangent(tree):
    """Tangent pytree of zeros matching `tree` (float0 for non-inexact)."""
    def z(x):
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.inexact):
            return jnp.zeros(jnp.shape(x), jnp.asarray(x).dtype)
        return np.zeros(jnp.shape(x), dtype=jax.dtypes.float0)
    return jax.tree_util.tree_map(z, tree)


def energy_hvp(qc, v, params=None):
    """Hessian-vector product (d^2 E/dparams^2) . v by forward-over-reverse
    differentiation of the split-module adjoint — exact second derivatives
    through the SCF fixed point at scales where jax.hessian of the
    monolithic energy_fn cannot compile on the remote TPU AOT compiler
    (VERDICT r3 item 5; reference analog: torch autograd.functional over
    properties.py:343-436, monolithic only).

    v: tangent pytree matching `params` (zeros except the probed
    direction; non-inexact leaves may be float0 or zeros — they are
    coerced). Returns dgrad = d/d(eps) grad(params + eps v) at eps=0.

    Derivation (all at the converged (dm*, theta, lambda)):
      dtheta   = (dtheta/dp) v                     [jvp of each part]
      ddm      : (I - J) ddm = (dstep/dtheta) dtheta, J = dstep/ddm
      dbar_dm  , dbar_th_e = jvp of the energy-partials module
      dlambda  : (I - J^T) dlambda = dbar_dm + d(J^T lambda)
      dbar_th  = dbar_th_e + jvp of the step-theta VJP module
      dgrad    = sum_parts jvp of the part-pullback modules
    Every stage is its own jitted module (the same granularity that lets
    the forward build + gradient compile remotely)."""
    from ..utils.logger import log
    import time as _time
    eng = qc.engine
    st = getattr(qc, "_adjoint_state", None)
    if st is None or (params is not None
                      and st.get("params") is not params):
        energy_grad(qc, params)
        st = qc._adjoint_state
    params = st["params"]
    theta, dm, lam = st["theta"], st["dm"], st["lam"]
    cpu_pull = st["cpu_pull"]
    cache = qc.__dict__.setdefault("_adjoint_cache", {})

    # coerce v into a well-typed tangent for `params`
    vz = _zeros_tangent(params)

    def merge(z, t):
        if t is None or _is_float0(z) or _is_float0(t):
            return z
        return jnp.asarray(t, z.dtype)
    v = jax.tree_util.tree_map(merge, vz, v)

    def step_fn(d, th):
        return eng.step(d, _with_ingraph_orth(th))

    def energy_fn(d, th):
        return eng.energy(d, _with_ingraph_orth(th))

    import contextlib

    def pull_ctx():
        if cpu_pull and jax.default_backend() != "cpu":
            return jax.default_device(jax.devices("cpu")[0])
        return contextlib.nullcontext()

    def dev_put(x):
        return jax.device_put(x, jax.devices("cpu")[0]) if cpu_pull else x

    theta_z = _zeros_tangent(theta)
    dm_z = jnp.zeros_like(dm)

    # --- stage 1: theta tangents (per-part jvp modules) -----------------
    parts = getattr(qc, "_theta_parts", None) or {"all": qc._build_theta}
    dtheta = {}
    t0 = _time.perf_counter()
    for name, fn in parts.items():
        key = f"part_jvp/{name}"
        if key not in cache:
            cache[key] = jax.jit(
                lambda p, t, fn=fn: jax.jvp(fn, (p,), (t,)))
        with pull_ctx():
            th_p, dth_p = cache[key](*dev_put((params, v)))
        dtheta.update(dth_p)
    # entries of theta not produced by the part fns (e.g. jkb blocks
    # reinserted from the host copies) get zero tangents; entries the
    # parts produce but theta dropped (eri_k/eri_j) are discarded
    dtheta = {k: dtheta.get(k, theta_z[k]) for k in theta}
    log(f"adjoint-hvp: theta tangents in {_time.perf_counter()-t0:.2f}s")

    # --- stage 2: ddm solve (I - J) ddm = dstep_theta . dtheta ----------
    if "step_jvp" not in cache:
        @jax.jit
        def step_jvp(d, th, dd, dth):
            return jax.jvp(step_fn, (d, th), (dd, dth))[1]
        cache["step_jvp"] = step_jvp
    shape = dm.shape

    def fwd_matvec(uflat):
        with pull_ctx():
            jv = np.asarray(cache["step_jvp"](
                *dev_put((dm, theta, jnp.asarray(uflat.reshape(shape)),
                          theta_z))), dtype=np.float64).ravel()
        if not np.all(np.isfinite(jv)):
            raise RuntimeError("adjoint-hvp: step jvp non-finite")
        return uflat - jv

    t0 = _time.perf_counter()
    with pull_ctx():
        rhs_ddm = np.asarray(cache["step_jvp"](
            *dev_put((dm, theta, dm_z, dtheta))), dtype=np.float64).ravel()
    ddm_flat, rel1 = _gmres(fwd_matvec, rhs_ddm, tol=1e-12)
    log(f"adjoint-hvp: ddm GMRES rel={rel1:.2e} "
        f"in {_time.perf_counter()-t0:.2f}s")
    ddm = jnp.asarray(ddm_flat.reshape(shape))

    # --- stage 3: tangents of the energy partials -----------------------
    if "e_partials_jvp" not in cache:
        @jax.jit
        def e_partials_jvp(d, th, dd, dth):
            def ep(d_, th_):
                e, vjp = jax.vjp(energy_fn, d_, th_)
                bar_d, bar_th = vjp(jnp.ones((), e.dtype))
                return bar_d, bar_th
            return jax.jvp(ep, (d, th), (dd, dth))[1]
        cache["e_partials_jvp"] = e_partials_jvp
    t0 = _time.perf_counter()
    with pull_ctx():
        dbar_dm_e, dbar_theta_e = cache["e_partials_jvp"](
            *dev_put((dm, theta, ddm, dtheta)))
    log(f"adjoint-hvp: energy-partials jvp in "
        f"{_time.perf_counter()-t0:.2f}s")

    # --- stage 4: dlambda solve ----------------------------------------
    if "step_T_mv_jvp" not in cache:
        @jax.jit
        def step_T_mv_jvp(d, th, lam_, dd, dth):
            def mv(d_, th_):
                _, vjp = jax.vjp(lambda dd_: step_fn(dd_, th_), d_)
                return vjp(lam_)[0]
            return jax.jvp(mv, (d, th), (dd, dth))[1]
        cache["step_T_mv_jvp"] = step_T_mv_jvp
    if "step_T_mv" not in cache:
        @jax.jit
        def step_T_mv(d, th, v_):
            _, vjp = jax.vjp(lambda dd: step_fn(dd, th), d)
            return vjp(v_)[0]
        cache["step_T_mv"] = step_T_mv

    def t_matvec(uflat):
        with pull_ctx():
            jv = np.asarray(cache["step_T_mv"](
                *dev_put((dm, theta, jnp.asarray(uflat.reshape(shape))))),
                dtype=np.float64).ravel()
        return uflat - jv

    t0 = _time.perf_counter()
    with pull_ctx():
        d_JTlam = np.asarray(cache["step_T_mv_jvp"](
            *dev_put((dm, theta, lam, ddm, dtheta))),
            dtype=np.float64).ravel()
    rhs_dlam = np.asarray(dbar_dm_e, dtype=np.float64).ravel() + d_JTlam
    dlam_flat, rel2 = _gmres(t_matvec, rhs_dlam, tol=1e-12)
    log(f"adjoint-hvp: dlambda GMRES rel={rel2:.2e} "
        f"in {_time.perf_counter()-t0:.2f}s")
    if max(rel1, rel2) > 1e-8:
        import warnings
        warnings.warn(
            f"adjoint-hvp: tangent linear solves did not converge "
            f"(rel={max(rel1, rel2):.2e}); the HVP error is of the same "
            "order.", RuntimeWarning, stacklevel=2)
    dlam = jnp.asarray(dlam_flat.reshape(shape))

    # --- stage 5: dbar_theta -------------------------------------------
    if "step_theta_vjp_jvp" not in cache:
        @jax.jit
        def step_theta_vjp_jvp(d, th, lam_, dd, dth, dlam_):
            def sv(d_, th_, l_):
                _, vjp = jax.vjp(lambda t: step_fn(d_, t), th_)
                return vjp(l_)[0]
            return jax.jvp(sv, (d, th, lam_), (dd, dth, dlam_))[1]
        cache["step_theta_vjp_jvp"] = step_theta_vjp_jvp
    t0 = _time.perf_counter()
    with pull_ctx():
        dbar_theta_s = cache["step_theta_vjp_jvp"](
            *dev_put((dm, theta, lam, ddm, dtheta, dlam)))
    dbar_theta = {k: _add_bars(dbar_theta_e.get(k), dbar_theta_s.get(k))
                  for k in theta}
    dbar_theta = {k: vv for k, vv in dbar_theta.items()
                  if vv is not None and not _is_float0(vv)}
    log(f"adjoint-hvp: dbar_theta in {_time.perf_counter()-t0:.2f}s")

    # --- stage 6: per-part pullback tangents ---------------------------
    bar_theta = st["bar_theta"]
    dgrad = jax.tree_util.tree_map(jnp.zeros_like, params)
    for name, fn in parts.items():
        key = f"part_vjp_jvp/{name}"
        if key not in cache:
            @jax.jit
            def part_vjp_jvp(p, bar, vp, dbar, fn=fn):
                def pv(p_, b_):
                    _, vjp = jax.vjp(fn, p_)
                    return vjp(b_)[0]
                return jax.jvp(pv, (p, bar), (vp, dbar))[1]
            cache[key] = part_vjp_jvp
        shapes = jax.eval_shape(fn, params)
        bar_part = _zeros_cotangent(shapes, bar_theta)
        dbar_part = _zeros_cotangent(shapes, dbar_theta)
        t0 = _time.perf_counter()
        with pull_ctx():
            g = cache[key](*dev_put((params, bar_part, v, dbar_part)))
        dgrad = jax.tree_util.tree_map(_add_bars, dgrad, g)
        log(f"adjoint-hvp: part[{name}] jvp-pullback in "
            f"{_time.perf_counter()-t0:.2f}s")
    return dgrad
