"""Progress logging gated by config.VERBOSE (parity: reference
dqc/utils/misc.py logger) plus a jax.profiler trace helper (the TPU-native
answer to the reference's pprofile harness, SURVEY §5.1)."""
from __future__ import annotations

import contextlib
import sys
import time

from .config import config


def log(*args, level: int = 1):
    if config.VERBOSE >= level:
        print("[dqc-tpu]", *args, file=sys.stderr, flush=True)


@contextlib.contextmanager
def timed(label: str, level: int = 1):
    t0 = time.time()
    yield
    log(f"{label}: {time.time() - t0:.3f}s", level=level)


@contextlib.contextmanager
def profile_trace(logdir: str):
    """Capture an XLA/TPU profiler trace viewable in TensorBoard/xprof."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
