"""Recompute bench.py EXPECTED CPU-f64 reference energies (run on JAX-CPU).

Usage: env -u PYTHONPATH JAX_PLATFORMS=cpu python tools/cpu_reference.py
Prints one line per basis: EXPECTED[<basis>] = <energy>. Run whenever the
quadrature grid or geometry constants change (bench.py's correctness gate
compares the TPU energy against these at 1e-4)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_enable_x64", True)

import dqc_tpu as dq
from __graft_entry__ import _benzene_mol

for basis in (sys.argv[1:] or ["3-21g", "def2-svp"]):
    t0 = time.time()
    mol = _benzene_mol(basis=basis)
    qc = dq.KS(mol, xc="b3lyp")
    qc.run()
    e = float(qc.energy())
    print(f'EXPECTED["{basis}"] = {e!r}   # {time.time()-t0:.1f}s',
          flush=True)
