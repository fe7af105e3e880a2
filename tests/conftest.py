"""Test harness: run JAX on a virtual 8-device CPU mesh (the standard way to
test TPU sharding without hardware — SURVEY.md §4).

NOTE: the environment exports JAX_PLATFORMS=axon (remote TPU tunnel) and the
axon plugin shadows the env var, so we must force the platform through
jax.config BEFORE any backend initializes.
"""

import os
import pathlib
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
# Parity tests compare against float64 oracles; keep matmuls in true f32.
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache to speed up repeated test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
