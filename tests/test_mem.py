"""Leak guards — the JAX analog of the reference memory-leak suite.

The reference counts live ``torch.Tensor`` objects via ``gc.get_objects()``
before/after a full KS run (reference test/utils.py:24-95, test_a_mem.py:12-16)
to guard the engine/calc split.  The JAX analogs (SURVEY.md §4 transferable
strategy item 4) are:

  1. live *device buffer* count must return to baseline after the calc object
     dies (``jax.live_arrays``) — guards against module-level caches pinning
     whole theta tensors;
  2. an identical second calculation must not trigger recompilation — the jit
     caches are keyed on static metadata, and accidentally hashing a traced
     array or a fresh lambda into the key would silently multiply compile
     times (the dominant cost on TPU).
"""
import gc

import jax

import dqc_tpu


def _run_once():
    mol = dqc_tpu.Mol("H -0.5 0 0; H 0.5 0 0", basis="3-21G", grid=2)
    qc = dqc_tpu.KS(mol, xc="lda_x").run()
    return float(qc.energy())


def test_no_device_array_leak():
    """Device buffers allocated during a KS run are released when the calc
    object goes out of scope (up to a small constant of cached scalars)."""
    _run_once()  # warm compile caches + any one-time module constants
    gc.collect()
    n0 = len(jax.live_arrays())
    for _ in range(3):
        _run_once()
    gc.collect()
    n1 = len(jax.live_arrays())
    # three further runs must not accumulate per-run buffers; allow a small
    # constant slack for lazily-initialized module-level tables
    assert n1 - n0 <= 16, (n0, n1)


def test_no_recompile_on_rerun(monkeypatch):
    """Re-running the SAME calc object (the reference supports repeated
    ``run()``, base_qccalc.py:28-34) and re-querying properties must hit the
    per-calc jit caches: zero new backend compiles.  Guards against a fresh
    lambda/closure sneaking into a hot path and silently multiplying compile
    time (the dominant cost on TPU)."""
    mol = dqc_tpu.Mol("H -0.5 0 0; H 0.5 0 0", basis="3-21G", grid=2)
    qc = dqc_tpu.KS(mol, xc="lda_x").run()
    float(qc.energy())  # warm every jit cache this test will touch

    compiles = []
    from jax._src import compiler

    orig = compiler.backend_compile_and_load

    def counting(*args, **kw):
        compiles.append(1)
        return orig(*args, **kw)

    monkeypatch.setattr(compiler, "backend_compile_and_load", counting)
    qc.run()
    float(qc.energy())
    assert not compiles, f"{len(compiles)} unexpected XLA compiles on rerun"
