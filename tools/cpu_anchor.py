"""Same-code JAX-CPU steady-SCF anchor for bench.py.

Measures the steady-state (theta built, caches warm) benzene B3LYP SCF
time with THIS code on the JAX CPU backend — a grounded apples-to-apples
denominator for the bench's speedup claims next to the invented 120 s
DQC-CPU constant (VERDICT r2 weak #10). Prints one JSON line:
{"basis", "steady_seconds", "energy_ha"}.

Usage: env -u PYTHONPATH JAX_PLATFORMS=cpu python tools/cpu_anchor.py [basis]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

import dqc_tpu as dq  # noqa: E402
from __graft_entry__ import _benzene_mol  # noqa: E402


def main():
    basis = sys.argv[1] if len(sys.argv) > 1 else "def2-svp"
    mol = _benzene_mol(basis=basis)
    qc = dq.KS(mol, xc="b3lyp")
    qc.run()                      # theta build + compiles + first solve
    t0 = time.time()
    qc.run()                      # steady: theta reused (fingerprint memo)
    dt = time.time() - t0
    print(json.dumps({"basis": basis, "steady_seconds": round(dt, 3),
                      "energy_ha": float(qc.energy())}), flush=True)


if __name__ == "__main__":
    main()
