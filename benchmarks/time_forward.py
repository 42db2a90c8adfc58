"""KS forward wall-clock harness (parity with the reference's
dqc/benchmarks/time_forward.py:1-32, which times a CO lda_x sg3 forward
and optionally wraps it in a statement profiler).

TPU-idiomatic differences from the reference harness:
  - times are split into build (host: basis/grid packing), compile
    (first jitted call; XLA trace+compile, cached persistently) and
    steady-state (what production reruns pay) — on an accelerator the
    undifferentiated "elapsed" of the reference conflates all three;
  - --profile records a jax.profiler trace (XLA ops, not Python lines)
    to --profile-dir, replacing the reference's pprofile statement
    profiler.

Usage:
    python benchmarks/time_forward.py [--basis 6-311++G**] [--xc lda_x]
        [--grid sg3] [--moldesc "O 0 0 -2; C 0 0 2"] [--profile]
"""
import argparse
import time


def run_ks_forward(moldesc, basis="6-311++G**", xc="lda_x", grid="sg3",
                   densityfit=False):
    import dqc_tpu

    t0 = time.time()
    mol = dqc_tpu.Mol(moldesc, basis=basis, grid=grid)
    if densityfit:
        mol = mol.densityfit()
    qc = dqc_tpu.KS(mol, xc=xc)
    t_build = time.time() - t0

    t0 = time.time()
    qc.run()
    ene = float(qc.energy())
    t_first = time.time() - t0

    # steady-state: rerun the converged-SCF solve with a warm XLA cache.
    # Caveat: run() still rebuilds its jit wrappers (jaxpr retrace) and, on
    # the host-loop/expand_k-probe paths, re-materializes theta — this is
    # "warm production rerun" time, not pure compiled-solve time (bench.py
    # measures the latter).
    t0 = time.time()
    qc.run()
    float(qc.energy())
    t_steady = time.time() - t0
    return ene, t_build, t_first, t_steady


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--moldesc", default="O 0 0 -2; C 0 0 2")
    parser.add_argument("--basis", default="6-311++G**")
    parser.add_argument("--xc", default="lda_x")
    parser.add_argument("--grid", default="sg3",
                        type=lambda s: int(s) if s.lstrip("-").isdigit() else s)
    parser.add_argument("--densityfit", action="store_true")
    parser.add_argument("--profile", action="store_true")
    parser.add_argument("--profile-dir", default="/tmp/dqc_tpu_trace")
    args = parser.parse_args()

    if args.profile:
        import jax
        jax.profiler.start_trace(args.profile_dir)

    ene, t_build, t_first, t_steady = run_ks_forward(
        args.moldesc, args.basis, args.xc, args.grid, args.densityfit)

    if args.profile:
        import jax
        jax.profiler.stop_trace()
        print(f"trace written to {args.profile_dir}")

    print(f"energy: {ene:.10f} Ha")
    print(f"build (host): {t_build:.3f}s  first run (compile+solve): "
          f"{t_first:.3f}s  steady-state solve: {t_steady:.3f}s")


if __name__ == "__main__":
    main()
