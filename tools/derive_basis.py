"""Derive / validate Gaussian basis digits by atomic-energy minimization.

Zero-egress substitute for BSE downloads (reference dqc downloads any
basis at runtime, api/loadbasis.py:104-129; this build must vendor).
Three modes, all CPU f64, all exercising basis-parameter gradients
through the SCF implicit fixed point (the same machinery BASELINE.json
config 4 demonstrates):

  reference Z          atomic UHF in a large even-tempered primitive set
                       (s24/p16, ~<1 mHa from the numerical-HF limit) —
                       the in-house basis-set-incompleteness anchor.
  validate SET Z ...   E_atom(SET) - E_atom(reference) window + the
                       shell-scale stationarity scan of
                       tools/validate_basis.py.
  derive Z [--out]     variationally optimize a def2-SVP-STRUCTURED set
                       (same shell pattern; exponents + contraction
                       coefficients free) from even-tempered seeds and
                       print a basis/sets DATA entry. Used to vendor
                       Na-Ar where published digits are not recallable
                       offline: the result is a *re-derived* SVP-grade
                       set, documented as such in sets/def2svp.py.

Usage: env -u PYTHONPATH JAX_PLATFORMS=cpu python tools/derive_basis.py \
           derive 14 --steps 1200
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

from dqc_tpu.utils.datastruct import CGTOBasis

# ground-state 2S values, Z=1..18
SPIN = {1: 1, 2: 0, 3: 1, 4: 0, 5: 1, 6: 2, 7: 3, 8: 2, 9: 1, 10: 0,
        11: 1, 12: 0, 13: 1, 14: 2, 15: 3, 16: 2, 17: 1, 18: 0}

# def2-SVP shell structure for the second row (Weigend & Ahlrichs PCCP 7,
# 3297 (2005), Table 1 granularity): [4s] = core(6) + 2s(3) + 2 free,
# [2p/3p] = 2p(5) + free(s), polarization d. Seed spans below are only
# starting points for the optimizer.
STRUCT = {
    11: dict(s=[6, 3, 1, 1], p=[5, 1], d=[1]),
    12: dict(s=[6, 3, 1, 1], p=[5, 1], d=[1]),
    13: dict(s=[6, 3, 1, 1], p=[5, 1, 1], d=[1]),
    14: dict(s=[6, 3, 1, 1], p=[5, 1, 1], d=[1]),
    15: dict(s=[6, 3, 1, 1], p=[5, 1, 1], d=[1]),
    16: dict(s=[6, 3, 1, 1], p=[5, 1, 1], d=[1]),
    17: dict(s=[6, 3, 1, 1], p=[5, 1, 1], d=[1]),
    18: dict(s=[6, 3, 1, 1], p=[5, 1, 1], d=[1]),
}
D_SEED = {11: 0.13, 12: 0.19, 13: 0.30, 14: 0.35, 15: 0.45, 16: 0.55,
          17: 0.65, 18: 0.70}


def atom_energy(z, shells, spin=None):
    import dqc_tpu
    mol = dqc_tpu.Mol(([z], [[0.0, 0.0, 0.0]]), basis=[shells],
                      spin=SPIN[z] if spin is None else spin, grid=1)
    qc = dqc_tpu.HF(mol)
    return float(jax.jit(qc.energy_fn)(qc._all_params()))


def reference_energy(z):
    """Large even-tempered primitive UHF anchor (uncontracted s24/p16)."""
    smax = 5e4 * (z / 8.0) ** 2
    s = smax * (1.0 / 2.3) ** np.arange(24)
    pmax = 3e3 * (z / 8.0) ** 2
    p = pmax * (1.0 / 2.4) ** np.arange(16)
    shells = ([CGTOBasis(0, np.array([a]), np.array([1.0])) for a in s]
              + [CGTOBasis(1, np.array([a]), np.array([1.0])) for a in p])
    return atom_energy(z, shells)


def _seed_shells(z):
    """Even-tempered seeds for the def2-SVP structure of element z."""
    st = STRUCT[z]
    # exponent spans from the validated 3-21G vendored set, extended at
    # the steep end (3-21G underspans the 1s cusp — its ~300-600 mHa
    # atomic error is mostly that)
    from dqc_tpu.basis.loader import loadbasis
    b321 = loadbasis(f"{z}:3-21g", normalize=False)
    smax321 = max(float(np.max(sh.alphas)) for sh in b321 if sh.angmom == 0)
    smin321 = min(float(np.min(sh.alphas)) for sh in b321 if sh.angmom == 0)
    pmax321 = max(float(np.max(sh.alphas)) for sh in b321 if sh.angmom == 1)
    pmin321 = min(float(np.min(sh.alphas)) for sh in b321 if sh.angmom == 1)

    shells = []
    ns = st["s"]
    # one geometric ladder across all s primitives, steep end extended
    ntot = sum(ns)
    hi, lo = smax321 * 12.0, smin321 * 0.55
    ladder = np.exp(np.linspace(np.log(hi), np.log(lo), ntot))
    pos = 0
    for k in ns:
        al = ladder[pos:pos + k]
        pos += k
        co = np.ones(k) if k == 1 else _core_profile(k)
        shells.append(CGTOBasis(0, al.copy(), co))
    np_ = st["p"]
    ntot = sum(np_)
    hi, lo = pmax321 * 6.0, pmin321 * 0.55
    ladder = np.exp(np.linspace(np.log(hi), np.log(lo), ntot))
    pos = 0
    for k in np_:
        al = ladder[pos:pos + k]
        pos += k
        co = np.ones(k) if k == 1 else _core_profile(k)
        shells.append(CGTOBasis(1, al.copy(), co))
    for _ in st["d"]:
        shells.append(CGTOBasis(2, np.array([D_SEED[z]]), np.array([1.0])))
    return shells


def _core_profile(k):
    """Seed contraction profile: bell-shaped, matching the near-universal
    look of published core contractions (cf. the C/N/O def2-SVP rows)."""
    x = np.linspace(-1.2, 1.0, k)
    return np.exp(-1.2 * x ** 2) * (0.08 + 0.92 * (x + 1.3) / 2.3)


def derive(z, steps=1200, seed_shells=None, spin=None):
    import optax
    import dqc_tpu

    shells = seed_shells or _seed_shells(z)
    mol = dqc_tpu.Mol(([z], [[0.0, 0.0, 0.0]]), basis=[shells],
                      spin=SPIN[z] if spin is None else spin, grid=1)
    qc = dqc_tpu.HF(mol)
    p0 = qc._all_params()
    b0 = p0["basis"]
    masks = [np.asarray(m) for m in b0["mask"]]

    def set_basis(p, x):
        b = dict(b0)
        b["alphas"] = [jnp.where(m > 0, jnp.exp(la), a0)
                       for (la, m, a0) in zip(x["log_al"], b0["mask"],
                                              b0["alphas"])]
        b["coeffs"] = [jnp.where(m > 0, c, c0)
                       for (c, m, c0) in zip(x["co"], b0["mask"],
                                             b0["coeffs"])]
        q = dict(p)
        q["basis"] = b
        return q

    x0 = {"log_al": [jnp.log(jnp.where(np.asarray(a) > 0, a, 1.0))
                     for a in b0["alphas"]],
          "co": [jnp.asarray(c) for c in b0["coeffs"]]}

    @jax.jit
    def loss(x):
        return qc.energy_fn(set_basis(p0, x))

    e0 = float(loss(x0))
    print(f"Z={z} seed UHF: {e0:.8f}")
    x, best = x0, (e0, x0)
    lr = 3e-3
    for stage in range(5):
        opt = optax.chain(optax.clip_by_global_norm(0.1), optax.adam(lr))
        state = opt.init(x)
        vg = jax.jit(jax.value_and_grad(loss))
        bad = 0
        for i in range(steps):
            e, g = vg(x)
            ev = float(e)
            if not np.isfinite(ev):
                bad += 1
                x = best[1]
                state = opt.init(x)
                if bad > 25:
                    break
                continue
            if ev < best[0]:
                best = (ev, x)
            up, state = opt.update(g, state)
            x = optax.apply_updates(x, up)
        print(f"  stage {stage} (lr {lr:.1e}): best {best[0]:.8f}")
        lr *= 0.35
        x = best[1]
    x = best[1]

    # unpack into DATA-entry shells: match each template shell to its
    # packed (class, row) slot by its seed exponents (the geometric-ladder
    # seeds are all distinct), then read the optimized values from there
    out = []
    for sh in shells:
        found = None
        for ci, (al, m) in enumerate(zip(b0["alphas"], masks)):
            a = np.asarray(al)
            for r in range(a.shape[0]):
                valid = a[r][m[r] > 0]
                if (len(valid) == len(sh.alphas)
                        and np.allclose(np.sort(valid),
                                        np.sort(np.asarray(sh.alphas)))):
                    found = (ci, r)
                    break
            if found:
                break
        if found is None:
            raise RuntimeError("could not match shell to packed class")
        ci, r = found
        npm = len(sh.alphas)
        al_opt = np.exp(np.asarray(x["log_al"][ci][r]))[:npm]
        co_opt = np.asarray(x["co"][ci][r])[:npm]
        order = np.argsort(-al_opt)
        out.append((sh.angmom, al_opt[order], co_opt[order]))
    print(f"Z={z} derived UHF: {best[0]:.8f}")
    _print_entry(z, out)
    return best[0], out


def _print_entry(z, out):
    print(f"    {z}: [", end="")
    lines = []
    for (l, al, co) in out:
        als = ", ".join(f"{a:.8g}" for a in al)
        cos = ", ".join(f"{c:.8g}" for c in co)
        lines.append(f"({l}, [{als}],\n         [{cos}])")
    print((",\n        ".join(lines)) + "],")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["reference", "validate", "derive",
                                     "derive-fwd"])
    ap.add_argument("args", nargs="*")
    ap.add_argument("--steps", type=int, default=1200)
    ns = ap.parse_args()
    if ns.mode == "reference":
        for z in map(int, ns.args):
            print(f"Z={z} even-tempered UHF anchor: "
                  f"{reference_energy(z):.8f}")
    elif ns.mode == "validate":
        basis = ns.args[0]
        from dqc_tpu.basis.loader import loadbasis
        for z in map(int, ns.args[1:]):
            e_ref = reference_energy(z)
            e_b = atom_energy(z, loadbasis(f"{z}:{basis}", normalize=False))
            print(f"Z={z:2d} {basis}: E={e_b:.6f}  ref={e_ref:.6f}  "
                  f"incompleteness={1e3*(e_b-e_ref):.2f} mHa")
    elif ns.mode == "derive-fwd":
        for z in map(int, ns.args):
            derive_fwd(z)
    else:
        for z in map(int, ns.args):
            derive(z, steps=ns.steps)




# ---------------------------------------------------------------------------
# Forward-only second-row derivation (the AD route above compiles the
# gradient of the whole-atom SCF program — ~10 min per element on this
# 1-core host; the forward program alone compiles ~5x faster and a few
# scalar knobs suffice when seeding from the VALIDATED vendored 3-21G
# digits): seed = 3-21G shells + one tight core s + one tight p + d
# polarization, then coordinate-descent golden-section on (a) the tight-s
# exponent, (b) the tight-p exponent, (c) the d exponent, (d) per-l
# uniform exponent scales. Result: an SVP-grade set (NOT the published
# def2-SVP digits — provenance documented in sets/def2svp.py).
# ---------------------------------------------------------------------------

def _aug321_shells(z, decontract_s=True):
    from dqc_tpu.basis.loader import loadbasis
    b = loadbasis(f"{z}:3-21g", normalize=False)
    smax = max(float(np.max(sh.alphas)) for sh in b if sh.angmom == 0)
    pmax = max(float(np.max(sh.alphas)) for sh in b if sh.angmom == 1)
    shells = []
    for sh in b:
        if decontract_s and sh.angmom == 0 and len(sh.alphas) > 1:
            # decontract: the 3-21G segmented-core COEFFICIENTS are the
            # dominant residual (knob scans on the contracted seed stall
            # ~0.5 Ha above the HF limit for Na-Ar); freeing the
            # primitives recovers it without gradient-based refitting
            for a in np.asarray(sh.alphas, float):
                shells.append(CGTOBasis(0, np.array([a]), np.array([1.0])))
        else:
            shells.append(CGTOBasis(sh.angmom,
                                    np.asarray(sh.alphas, float).copy(),
                                    np.asarray(sh.coeffs, float).copy()))
    # the 3-21G core underspans the 1s cusp by ~2 decades for the second
    # row (Si atom: 1.1 Ha of its atomic error); two tight s rungs plus a
    # tight p recover most of it
    shells.append(CGTOBasis(0, np.array([smax * 6.0]), np.array([1.0])))
    shells.append(CGTOBasis(0, np.array([smax * 40.0]), np.array([1.0])))
    shells.append(CGTOBasis(1, np.array([pmax * 5.0]), np.array([1.0])))
    shells.append(CGTOBasis(2, np.array([D_SEED[z]]), np.array([1.0])))
    return shells


def derive_fwd(z, spin=None, iters=2):
    """Forward-only coordinate descent; returns (energy, shells)."""
    import dqc_tpu
    shells = _aug321_shells(z)
    mol = dqc_tpu.Mol(([z], [[0.0, 0.0, 0.0]]), basis=[shells],
                      spin=SPIN[z] if spin is None else spin, grid=1)
    qc = dqc_tpu.HF(mol)
    p0 = qc._all_params()
    b0 = p0["basis"]
    masks = [np.asarray(m) for m in b0["mask"]]
    efn = jax.jit(qc.energy_fn)

    # locate each shell's (class, row) slot by seed exponents
    slots = []
    for sh in shells:
        found = None
        for ci, (al, m) in enumerate(zip(b0["alphas"], masks)):
            a = np.asarray(al)
            for r in range(a.shape[0]):
                valid = a[r][m[r] > 0]
                if (len(valid) == len(sh.alphas)
                        and np.allclose(np.sort(valid),
                                        np.sort(np.asarray(sh.alphas)))):
                    found = (ci, r)
                    break
            if found:
                break
        assert found is not None
        slots.append(found)

    state = {"alphas": [np.asarray(a, float).copy() for a in b0["alphas"]]}

    def energy():
        b = dict(b0)
        b["alphas"] = [jnp.asarray(a) for a in state["alphas"]]
        p = dict(p0)
        p["basis"] = b
        e = float(efn(p))
        return e if np.isfinite(e) else 1e9

    def scan_knob(apply, grid):
        """apply(t) mutates state from a saved base; returns best t."""
        base = [a.copy() for a in state["alphas"]]
        best = (energy(), 0.0)
        for t in grid:
            state["alphas"] = [a.copy() for a in base]
            apply(t)
            e = energy()
            if e < best[0]:
                best = (e, t)
        state["alphas"] = [a.copy() for a in base]
        apply(best[1])
        return best

    e0 = energy()
    print(f"Z={z} aug-3-21G seed UHF: {e0:.6f}", flush=True)
    # knobs: last four shells are [tight-s1, tight-s2, tight-p, d]
    for it in range(iters):
        for (which, name) in ((-4, "tight-s1"), (-3, "tight-s2"),
                              (-2, "tight-p"), (-1, "d")):
            ci, r = slots[which]

            def apply(t, ci=ci, r=r):
                state["alphas"][ci][r] *= np.exp(t)
            e, t = scan_knob(apply, np.linspace(-1.6, 1.6, 11))
            print(f"  {name}: scale e^{t:+.2f} -> {e:.6f}", flush=True)
        for l in (0, 1):
            rows = [slots[i] for i, sh in enumerate(shells)
                    if sh.angmom == l and i < len(shells) - 4]

            def apply(t, rows=rows):
                for (ci, r) in rows:
                    state["alphas"][ci][r] *= np.exp(t)
            e, t = scan_knob(apply, np.linspace(-0.12, 0.12, 7))
            print(f"  l={l} uniform: e^{t:+.3f} -> {e:.6f}", flush=True)
    e1 = energy()
    out = []
    for i, sh in enumerate(shells):
        ci, r = slots[i]
        npm = len(sh.alphas)
        al = state["alphas"][ci][r][:npm]
        order = np.argsort(-al)
        out.append((sh.angmom, al[order],
                    np.asarray(sh.coeffs, float)[order]))
    print(f"Z={z} derived UHF: {e1:.6f} (gain {1e3*(e0-e1):.1f} mHa)")
    _print_entry(z, out)
    return e1, out


if __name__ == "__main__":
    main()
