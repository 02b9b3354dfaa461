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
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon sitecustomize pins jax_platforms at import time; override post-import.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
