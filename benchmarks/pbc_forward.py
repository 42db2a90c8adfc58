"""PBC KS forward wall-clock harness (k-point SCF timing).

The reference ships a PySCF-side solid harness
(benchmark-pyscf/solid_energy.py:25-42, KUKS H lattice) but no DQC PBC
timing at all — its PBC path requires GDF and cannot run hybrids. This
harness times the rebuilt k-point engine end-to-end, split build /
first-call (compile) / steady-state like time_forward.py.

Usage:
    python benchmarks/pbc_forward.py [--soldesc "H 0 0 0"] [--a 3.0]
        [--basis 3-21g] [--xc lda_x] [--nk 2] [--spin 1] [--grid sg2]
"""
import argparse
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--soldesc", default="H 0 0 0")
    parser.add_argument("--a", type=float, default=3.0,
                        help="cubic cell edge (Bohr)")
    parser.add_argument("--basis", default="3-21g")
    parser.add_argument("--xc", default="lda_x")
    parser.add_argument("--nk", type=int, default=2,
                        help="1D k-mesh size along x (1 = gamma engine)")
    parser.add_argument("--spin", type=int, default=None)
    parser.add_argument("--grid", default="sg2",
                        type=lambda s: int(s) if s.lstrip("-").isdigit()
                        else s)
    args = parser.parse_args()

    import dqc_tpu
    from dqc_tpu.system.sol import Sol

    kpts = None
    if args.nk > 1:
        kxs = 2.0 * np.pi / (args.nk * args.a) * np.arange(args.nk)
        kpts = np.stack([kxs, np.zeros(args.nk), np.zeros(args.nk)], -1)

    t0 = time.time()
    sol = Sol(args.soldesc, np.eye(3) * args.a, basis=args.basis,
              spin=args.spin, grid=args.grid, kpts=kpts)
    qc = dqc_tpu.KS(sol, xc=args.xc)
    t_build = time.time() - t0

    t0 = time.time()
    qc.run()
    ene = float(qc.energy())
    t_first = time.time() - t0

    t0 = time.time()
    qc.run()
    float(qc.energy())
    t_steady = time.time() - t0

    nk = 1 if kpts is None else args.nk
    print(f"energy: {ene:.10f} Ha  (nao={sol.meta.nao}, nk={nk})")
    print(f"build (host): {t_build:.3f}s  first run (compile+solve): "
          f"{t_first:.3f}s  steady-state solve: {t_steady:.3f}s")


if __name__ == "__main__":
    main()
