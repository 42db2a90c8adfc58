"""Test configuration: CPU backend with 8 virtual devices, float64.

Mirrors the reference's test strategy (SURVEY.md §4) but with JAX idioms:
multi-chip sharding is validated on a virtual CPU mesh.

Environment gotcha (recorded in .claude/skills/verify/SKILL.md): the host
injects an `axon` TPU-tunnel jax plugin via PYTHONPATH=/root/.axon_site;
it hijacks platform selection, ignores virtual-device settings, and hangs
at interpreter exit. Tests scrub it before importing jax.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
os.environ["PYTHONPATH"] = ":".join(
    p for p in os.environ.get("PYTHONPATH", "").split(":")
    if ".axon_site" not in p)
sys.modules.pop("jax_plugins", None)

import jax  # noqa: E402

jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
# persistent compilation cache: XLA compiles dominate runtime on small hosts
jax.config.update("jax_compilation_cache_dir", "/tmp/dqc_tpu_xla_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
