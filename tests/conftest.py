"""Test config: force a virtual 8-device CPU platform before JAX initializes.

This is the JAX-native way to exercise multi-chip sharding logic without TPU
hardware (SURVEY.md §4): all mesh/pjit tests see 8 CPU devices.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# The CPU backend lowers f32 matmuls to a fast low-precision path by default;
# tests check numerics, so force full precision.
jax.config.update("jax_default_matmul_precision", "highest")
