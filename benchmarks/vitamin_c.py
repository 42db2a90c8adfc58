"""Vitamin-C (L-ascorbic acid, 20 atoms) KS/DF wall-clock harness —
parity with the reference's dqc/test/benchmark.py:1-46 (cc-pVDZ,
lda_x+lda_c_pw, density fitting; the reference prints one undivided
elapsed time; we split build / first-call / steady-state).

This is the reference's largest shipped benchmark workload (nao=200
cc-pVDZ); BASELINE.md cites it as the practical CPU wall-clock anchor
(O(100 s) on CPU for the reference).

Usage: python benchmarks/vitamin_c.py [--no-densityfit] [--xc ...]
"""
import argparse
import time

# geometry (Bohr) as shipped in the reference harness workload:
# L-ascorbic acid, 20 atoms
VITAMIN_C = """O 0.1761 -2.0912 1.2179;
O -2.5390 0.1686 -2.6197;
O 1.5859 4.5166 0.5374;
O -7.3565 -0.3855 -0.6285;
O 5.7108 1.0762 -1.1444;
O 3.7634 -4.0742 -0.2600;
C -0.6419 0.4947 1.4840;
C -3.0347 0.8664 -0.0624;
C 1.5518 1.9398 0.5456;
C -5.1899 -0.7714 0.9190;
C 3.4161 0.4295 -0.1982;
C 2.5579 -2.1696 0.2094;
H -0.9740 0.8710 3.4930;
H -3.6211 2.8520 -0.0816;
H -4.7222 -2.7845 0.8222;
H -5.6716 -0.2763 2.8684;
H -2.0785 -1.6104 -2.6430;
H 0.0074 5.0941 1.2812;
H -8.6971 -1.4445 0.0486;
H 6.6186 -0.4860 -1.4846"""


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--basis", default="cc-pvdz")
    parser.add_argument("--xc", default="lda_x+lda_c_pw")
    parser.add_argument("--grid", default=2,
                        type=lambda s: int(s) if s.lstrip("-").isdigit() else s)
    parser.add_argument("--no-densityfit", action="store_true")
    args = parser.parse_args()

    import dqc_tpu

    t0 = time.time()
    mol = dqc_tpu.Mol(VITAMIN_C, basis=args.basis, grid=args.grid)
    if not args.no_densityfit:
        mol = mol.densityfit()
    qc = dqc_tpu.KS(mol, xc=args.xc)
    t_build = time.time() - t0

    t0 = time.time()
    qc.run()
    ene = float(qc.energy())
    t_first = time.time() - t0

    t0 = time.time()
    qc.run()
    float(qc.energy())
    t_steady = time.time() - t0

    print(f"energy: {ene:.10f} Ha  (nao={mol.meta.nao})")
    print(f"build (host): {t_build:.3f}s  first run (compile+solve): "
          f"{t_first:.3f}s  steady-state solve: {t_steady:.3f}s")


if __name__ == "__main__":
    main()
