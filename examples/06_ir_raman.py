"""Vibrational analysis from one converged SCF: harmonic frequencies,
IR intensities, Raman activities, dipole and quadrupole — all exact
derivatives through the SCF fixed point (no finite differences).

The whole pipeline is jax.jacfwd/jax.hessian compositions over the pure
energy function; the positional Hessian is computed once and shared by
vibration/ir/raman (parity: reference api/properties.py memoization).
"""
import jax

jax.config.update("jax_enable_x64", True)

import numpy as np

import dqc_tpu
from dqc_tpu.api.properties import (edipole, equadrupole, ir_spectrum,
                                    raman_spectrum)


def main():
    # CCCBDB H2O geometry (bohr)
    mol = dqc_tpu.Mol(
        "O 0.0 0.0 0.2156; H 0.0 1.4749 -0.8625; H 0.0 -1.4749 -0.8625",
        basis="3-21G")
    qc = dqc_tpu.HF(mol).run()
    print(f"E(HF/3-21G) = {float(qc.energy()):.8f} Ha")

    mu = np.asarray(edipole(qc, unit="debye"))
    print(f"dipole [D]       = {np.round(mu, 4)}  (CCCBDB: [0, 0, -2.388])")
    quad = np.asarray(equadrupole(qc, unit="debye*angst"))
    print(f"quadrupole [D*A] = {np.round(np.diag(quad), 3)}  "
          f"(CCCBDB: [-6.838, -3.972, -5.882])")

    freqs, ir_ints = ir_spectrum(qc, ints_unit="km/mol")
    _, raman = raman_spectrum(qc, ints_unit="angst^4/amu")
    print("\n  mode   freq [cm^-1]   IR [km/mol]   Raman [A^4/amu]")
    for i in range(3):
        print(f"  {i + 1:4d}   {float(freqs[i]):12.1f} "
              f"{float(ir_ints[i]):13.3f} {float(raman[i]):17.2f}")
    print("\nCCCBDB HF/3-21G: 3944/3811/1800 cm^-1, "
          "IR 9.12/0.05/79.9 km/mol, Raman 44.1/95.7/11.5 A^4/amu")


if __name__ == "__main__":
    main()
