"""Eigh-free density matrix construction: canonical purification.

TPU rationale: XLA's f64 eigensolver on TPU is emulated and costs
~200-400 ms at nao~114 — it dominates the per-iteration time of the
device-batched SCF phases (measured 0.39 s/iter, scf/qccalc._device_phase)
while the J/K contraction costs ~1 ms. Canonical purification
(Palser, Manolopoulos PRB 58, 12704 (1998)) builds the zero-temperature
density matrix from the orthogonalized Fock with ~30-50 MXU matmuls of
size nao^2 — sub-ms on the MXU even in emulated f64 — and needs no
eigendecomposition, no chemical-potential search, and no data-dependent
control flow beyond a fixed-length fori_loop (XLA-friendly).

Valid for integer aufbau occupations (idempotent D with fixed trace);
fractional-occupation systems keep the safe_eigh path
(scf/qccalc._device_phase gates on the occupation pattern). Orbital
energies are not produced — the host LAPACK polish / final eigh supplies
them where needed.

Reference counterpart: none — dqc diagonalizes with xitorch lsymeig
(hamilton/orbconverter + qccalc); this is a TPU-first redesign of the
inner loop.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def purify_orth(fp, nocc, iters: int = 72):
    """Density matrix (orthogonal frame, trace = nocc, spectrum {0,1})
    from the symmetric orthogonal-frame Fock `fp` (..., n, n).

    nocc: number of occupied orbitals (may be a traced scalar/batch).
    Grand-canonical initialization via Gershgorin spectral bounds, then
    the trace-conserving PM update
        c  = tr(D^2 - D^3) / tr(D - D^2)
        D <- ((1+c) D^2 - D^3) / c                    if c >= 1/2
        D <- ((1-2c) D + (1+c) D^2 - D^3) / (1-c)     otherwise
    iterated a fixed `iters` times. The count matters more than it
    looks: D = p(F) commutes with F EXACTLY for any polynomial p, so the
    SCF commutator metric is blind to an unconverged purification — the
    solver happily converges F = F(p_k(F)) to 1e-11 in its own metric
    while the fixed point sits at the purification's subspace error from
    the true one (measured on benzene def2-SVP, gap/width ~0.016:
    iters=40 -> 2.7e-7 true residual seen by the host LAPACK polish).
    The linear (gap-limited) phase sets the cost: 72 iterations push the
    frontier-orbital error below 1e-10 there, at ~0.055 ms per 114^2
    f64 MXU matmul — noise next to one J/K build."""
    n = fp.shape[-1]
    eye = jnp.eye(n, dtype=fp.dtype)
    diag = jnp.diagonal(fp, axis1=-2, axis2=-1)
    off = jnp.sum(jnp.abs(fp), axis=-1) - jnp.abs(diag)
    fmin = jnp.min(diag - off, axis=-1)
    fmax = jnp.max(diag + off, axis=-1)
    mu = jnp.trace(fp, axis1=-2, axis2=-1) / n
    nocc = jnp.asarray(nocc, fp.dtype)
    lam = jnp.minimum(nocc / jnp.maximum(fmax - mu, 1e-300),
                      (n - nocc) / jnp.maximum(mu - fmin, 1e-300))
    d0 = ((lam / n)[..., None, None] * (mu[..., None, None] * eye - fp)
          + (nocc / n)[..., None, None] * eye)

    def body(_, dk):
        d2 = dk @ dk
        d3 = d2 @ dk
        tr_d2d3 = jnp.trace(d2 - d3, axis1=-2, axis2=-1)
        tr_dd2 = jnp.trace(dk - d2, axis1=-2, axis2=-1)
        c = tr_d2d3 / jnp.where(jnp.abs(tr_dd2) > 1e-300, tr_dd2, 1.0)
        c = jnp.clip(c, 1e-6, 1.0 - 1e-6)
        # McWeeney endgame: near idempotency both traces are rounding
        # noise and their RATIO c is garbage — the PM update then divides
        # a ~1e-14 correction by c~1e-6 and kicks the density by ~1e-8
        # (an earlier freeze guard capped the kick but FROZE the frontier
        # occupations at x ~ sqrt(10 eps n) ~ 5e-7 — measured as a
        # deterministic 2.7e-7 handoff error to the host LAPACK polish,
        # invariant under iters 40->72). c=1/2 turns PM into McWeeney
        # 3D^2-2D^3: idempotent D is a STABLE fixed point (no noise
        # pumping), x contracts quadratically to machine precision, and
        # the trace drift is O(sum x_i^2) ~ 1e-16.
        c = jnp.where(tr_dd2 > 1e-8, c, 0.5)
        cb = c[..., None, None]
        hi = ((1.0 + cb) * d2 - d3) / cb
        lo = ((1.0 - 2.0 * cb) * dk + (1.0 + cb) * d2 - d3) / (1.0 - cb)
        return jnp.where(cb >= 0.5, hi, lo)

    return jax.lax.fori_loop(0, iters, body, d0)


def fock_to_dm_purify(fock, X, keep, occ, iters: int = None):
    """AO-basis density matrix from the AO Fock via canonical purification
    — drop-in for the eigh route in engine.orthogonal_fock_to_dm for
    integer aufbau occupations.

    occ entries must be {0, f} with a single f > 0 (f = 2 restricted,
    1 polarized); callers verify this pattern host-side. Masked (dropped)
    orthogonalizer columns are pinned ADAPTIVELY just above the true
    spectrum (not at orth.LARGE=1e7: purification converges at a rate set
    by the gap RELATIVE to the spectral width, so a 1e7 pin would squash
    the relative gap to ~1e-8 and stall the iteration; a pin at ~1.5x the
    Gershgorin width keeps them unoccupied at full speed)."""
    if iters is None:
        # 72 gave a measured 9.6e-11 device-DIIS floor on benzene/def2-SVP
        # but the in-graph DIIS crawled below ~1e-8 (9 extra iterations
        # for a factor 2, bench r4c); with the DS J/K kernel alone, 96
        # stalled the DIIS below 1e-7 and 160 cured it (r5 session 1).
        # With the FULL DS hot loop (pallas J/K + pallas grid-XC,
        # ops/pallas_xc) the balance flipped back: measured head-to-head
        # on the live v5e (bench r5 session 2), 160 inflates the f32
        # phase (21 its -> 4.3e-5) and breaks the handoff (device exit
        # 5.3e-9, host verifier 3.3e-8 -> 3 polish iterations), while 96
        # gives f32 15 its -> 2.7e-5, f64 19 its -> 7.7e-9, host verify
        # PASS at it=0: steady 2.33 s vs 3.81 s.
        import os
        iters = int(os.environ.get("DQC_TPU_PURIFY_ITERS", "96"))
    fp = jnp.einsum("im,...ij,jn->...mn", X, fock, X)
    diag0 = jnp.diagonal(fp, axis1=-2, axis2=-1)
    off0 = jnp.sum(jnp.abs(fp), axis=-1) - jnp.abs(diag0)
    gmin = jnp.min(diag0 - off0, axis=-1)
    gmax = jnp.max(diag0 + off0, axis=-1)
    pin_val = gmax + 0.5 * (gmax - gmin) + 1.0
    pinm = jnp.where(keep, 0.0, 1.0)
    eye = jnp.eye(fp.shape[-1], dtype=fp.dtype)
    fp = fp + pin_val[..., None, None] * (pinm * eye)
    f_max = jnp.max(occ, axis=-1)                      # per spin batch
    nocc = jnp.sum(occ, axis=-1) / jnp.maximum(f_max, 1e-300)
    d_orth = purify_orth(fp, nocc, iters)
    return (f_max[..., None, None]
            * jnp.einsum("im,...mn,jn->...ij", X, d_orth, X))
