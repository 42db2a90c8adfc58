"""Populate the bench theta disk cache on the CPU backend.

The remote TPU AOT compiler pays 40-100 s per jkb quartet-block module and
~15 min for the core part on a cold cache (STATUS.md round-1 session 3) —
the round-1 bench timed out inside exactly that tail. Theta is pure data
(integrals + grid tables): built with LAPACK-backed CPU f64 it is
numerically identical (it *defines* the bench's EXPECTED reference values),
so bench.py runs this script in a subprocess on a cold cache and the TPU
process then serves every part from the .npz, compiling only the small
per-iteration modules.

Usage:  env -u PYTHONPATH JAX_PLATFORMS=cpu \
            python tools/build_theta_cache.py [basis] [cache_path]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

import dqc_tpu as dq  # noqa: E402
from __graft_entry__ import _benzene_mol  # noqa: E402


def main():
    basis = sys.argv[1] if len(sys.argv) > 1 else "def2-svp"
    cache_path = (sys.argv[2] if len(sys.argv) > 2 else
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))),
                      f".bench_theta_{basis}.npz"))
    if jax.default_backend() != "cpu":
        raise SystemExit("run with JAX_PLATFORMS=cpu (and PYTHONPATH "
                         "scrubbed of the axon plugin)")
    mol = _benzene_mol(basis=basis)
    if os.environ.get("BENCH_DF"):
        mol = mol.densityfit()
    mol.set_cache(cache_path)
    qc = dq.KS(mol, xc="b3lyp")
    params = qc._all_params(with_fields=False)
    qc._materialize_theta(params, cache_path, parts_only=True)
    print(f"theta cache written: {cache_path}")


if __name__ == "__main__":
    main()
