"""Test configuration: CPU backend with 8 virtual devices, float64.

Mirrors the reference's test strategy (SURVEY.md §4) but with JAX idioms:
multi-chip sharding is validated on a virtual CPU mesh.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
# persistent compilation cache: XLA compiles dominate runtime on small hosts
jax.config.update("jax_compilation_cache_dir", "/tmp/dqc_tpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
