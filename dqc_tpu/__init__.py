"""dqc-tpu: TPU-native differentiable quantum chemistry.

A ground-up JAX/XLA rebuild of the capabilities of diffqc/dqc (reference:
/root/reference): Hartree-Fock and Kohn-Sham DFT with energies differentiable
to arbitrary order w.r.t. atom positions, basis exponents/coefficients,
external electric fields, fractional nuclear charges, and (neural-network) XC
parameters.

Everything is float64; importing this package enables JAX x64 mode.
"""
from __future__ import annotations

import os as _os

import jax as _jax

_jax.config.update("jax_enable_x64", True)
# True-f32 matmuls on TPU: the MXU's default f32 path is a SINGLE bf16
# pass (~8 mantissa bits). Measured consequence (round 3): each
# differently-fused f32 J/K program is its own self-consistently
# bf16-perturbed SCF map, so the f32 warm phase converges (its own
# residual 8e-5) to a state the host map scores at err ~1.1 — the warm
# start was worthless and the host f32 loop redid the work. "highest"
# (multi-pass) restores true f32 products; the f32 phases are
# MXU-cheap, so the 3-6x matmul-pass cost is noise next to the f64
# phases. CPU/f64-emulated paths are unaffected.
_jax.config.update("jax_default_matmul_precision", "highest")
# persistent XLA compilation cache (compiles dominate on small hosts; the
# cache also covers the TPU backend). Override dir via DQC_TPU_XLA_CACHE.
_cache_dir = _os.environ.get(
    "DQC_TPU_XLA_CACHE",
    _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
                  ".xla_cache"))
if _cache_dir:
    # per-platform subdir: AOT artifacts are machine-specific
    _plat = _os.environ.get("JAX_PLATFORMS", "default").split(",")[0]
    _cache_dir = f"{_cache_dir}_{_plat}"
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from .api.parser import parse_moldesc            # noqa: E402,F401
from .basis import loadbasis                     # noqa: E402,F401
from .utils.datastruct import (                  # noqa: E402,F401
    SpinParam, ValGrad, CGTOBasis, AtomCGTOBasis)
from .system.mol import Mol                      # noqa: E402,F401


_LAZY = ("HF", "KS", "SCF_QCCalc", "Sol", "get_xc", "get_libxc",
         "hessian_pos", "vibration", "ir_spectrum", "raman_spectrum",
         "edipole", "equadrupole", "eoctupole", "polarizability",
         "optimal_geometry",
         "is_orb_min", "lowest_eival_orb_hessian", "band_energies")


def __dir__():
    return sorted(list(globals().keys()) + list(_LAZY))


def __getattr__(name):
    # heavier entry points loaded lazily to keep import fast
    if name in ("HF", "KS", "SCF_QCCalc"):
        from .scf import qccalc
        return getattr(qccalc, name)
    if name == "Sol":
        from .system.sol import Sol
        return Sol
    if name in ("get_xc", "get_libxc"):
        from .xc import getxc
        return getattr(getxc, name)
    if name in ("hessian_pos", "vibration", "ir_spectrum", "raman_spectrum",
                "edipole", "equadrupole", "eoctupole", "polarizability",
                "optimal_geometry", "is_orb_min",
                "lowest_eival_orb_hessian"):
        from .api import properties
        return getattr(properties, name)
    if name == "band_energies":
        from .scf.kpbc import band_energies
        return band_energies
    raise AttributeError(f"module 'dqc_tpu' has no attribute {name!r}")


from ._version import __version__  # noqa: F401  (stamped in _version.py)
