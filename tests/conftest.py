"""Test configuration: run everything on an 8-virtual-device CPU backend.

Multi-chip sharding code is exercised on a simulated mesh via
``--xla_force_host_platform_device_count=8`` (the driver separately dry-runs
the real multi-chip path through ``__graft_entry__.dryrun_multichip``).
"""
import os

# FORCE cpu: the environment exports JAX_PLATFORMS=axon (the tunneled TPU);
# tests must run on the 8-device virtual CPU mesh regardless.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# jaxtyping's pytest plugin imports jax BEFORE this conftest, so the env
# vars above may be too late — set the config explicitly too (backends are
# not initialized yet at conftest time).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

jax.config.update("jax_enable_x64", False)
# persistent compile cache: repeated test runs skip recompilation
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
