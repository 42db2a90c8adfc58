"""Periodic solids: gamma-point and k-point Kohn-Sham DFT.

The PBC analog of the molecular examples; the reference's PBC surface is
Sol + densityfit("gdf") + KS (dqc/test/test_ks.py:555-570). Here the
G-space (AFT) Coulomb replaces GDF and, unlike the reference, the PBC
total energy is differentiable w.r.t. atom positions.

Run: JAX_PLATFORMS=cpu python examples/05_pbc_solid.py  (~2 min)
"""
import numpy as np
import jax

import dqc_tpu

# --- gamma point: H simple cubic, unrestricted LDA ----------------------
a = 3.0  # Bohr
sol = dqc_tpu.Sol("H 0 0 0", np.eye(3) * a, basis="3-21G", spin=1,
                  grid="sg2")
qc = dqc_tpu.KS(sol, xc="lda_x").run()
print("H sc LDA energy per cell:", float(qc.energy()))

# forces through the periodic SCF (reference PBC integrals are not
# differentiable; here they are)
p0 = qc._all_params()


def energy_of_pos(pos):
    p = dict(p0)
    p["basis"] = dict(p0["basis"])
    p["basis"]["atompos"] = pos
    return qc.energy_fn(p)


force = -jax.grad(energy_of_pos)(p0["basis"]["atompos"])
print("force on atom (symmetry -> ~0):", np.asarray(force))

# --- k-point sampling: He chain, 2-point mesh ---------------------------
kpts = np.array([[0.0, 0.0, 0.0], [np.pi / a, 0.0, 0.0]])
sol_k = dqc_tpu.Sol("He 0 0 0", np.eye(3) * a, basis="sto-3g",
                    grid="sg2", kpts=kpts)
qc_k = dqc_tpu.KS(sol_k, xc="gga_x_pbe").run()
print("He sc PBE, 2 k-points:", float(qc_k.energy()))

# --- periodic hybrids / HF at k-points + band structure -----------------
# Both beyond the reference, whose PBC exact exchange is NotImplemented
# (hcgto_pbc.py:183-185) and which has no band API.
qc_hf = dqc_tpu.HF(sol_k).run()
print("He sc HF, 2 k-points:", float(qc_hf.energy()))

# band structure along Gamma-X from the converged PBE Hamiltonian
# (for hybrids/HF, off-mesh band exchange carries the usual finite-mesh
# 1/q^2 sampling error — use a denser SCF mesh for smooth hybrid bands)
kline = np.stack([np.linspace(0, np.pi / a, 5),
                  np.zeros(5), np.zeros(5)], axis=1)
bands = dqc_tpu.band_energies(qc_k, kline)   # (5, nao) eigenvalues (Ha)
print("lowest band along Gamma-X:", np.asarray(bands)[:, 0])
