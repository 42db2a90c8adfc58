"""Global configuration knobs.

Parity with the reference's config singleton (/root/reference/dqc/utils/
config.py: THRESHOLD_MEMORY, CHUNK_MEMORY, VERBOSE) adapted to the TPU
runtime: chunk sizes are element counts (static shapes), plus knobs for
screening and compilation caching.
"""
from __future__ import annotations

from dataclasses import dataclass


@dataclass
class _Config:
    # grid chunk for AO-table evaluation (elements of the point axis)
    AO_EVAL_CHUNK: int = 16384
    # pair-block chunk in the Coulomb contraction
    ERI_BLOCK: int = 16
    # memory threshold (bytes) above which DF el_mat is not precomputed
    THRESHOLD_MEMORY: int = 10 * 1024 ** 3
    # Schwarz screening threshold for ERI quartets
    SCREEN_THRESHOLD: float = 1e-13
    # verbosity: 0 silent, 1 progress lines, 2 debug
    VERBOSE: int = 0    # overridden by env DQC_TPU_VERBOSE at import


config = _Config()

import os as _os
config.VERBOSE = int(_os.environ.get("DQC_TPU_VERBOSE", config.VERBOSE))
