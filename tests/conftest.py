"""Test configuration: run everything on an 8-virtual-device CPU backend.

Multi-chip sharding code is exercised on a simulated mesh via
``--xla_force_host_platform_device_count=8`` (the driver separately dry-runs
the real multi-chip path through ``__graft_entry__.dryrun_multichip``).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
# persistent compile cache: repeated test runs skip recompilation
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
