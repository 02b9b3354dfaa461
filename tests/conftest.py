"""Test harness: force JAX onto a virtual 8-device CPU platform.

This is the TPU-native analogue of a fake backend (SURVEY.md §4): sharding /
pjit tests exercise real collectives on 8 virtual CPU devices without needing
a TPU pod. Must run before the first ``import jax`` anywhere in the test
session, hence module-level env mutation in conftest.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# The suite is compile-bound (hundreds of tiny-model jits on one CPU core);
# backend optimization level 0 compiles ~3x faster with identical op
# semantics. Measured: fast profile 24:16 -> see CLAUDE.md conventions.
if "xla_backend_optimization_level" not in flags:
    flags = (flags + " --xla_backend_optimization_level=0").strip()
os.environ["XLA_FLAGS"] = flags

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon sitecustomize pins jax_platforms at import time; override post-import.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent XLA binary cache: the second `pytest tests/` run on a host skips
# most compiles (measured 2.6x on a U-Net init). Cold-run cost is unchanged.
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
