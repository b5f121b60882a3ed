"""Test config: force a virtual 8-device CPU platform before JAX initializes.

This is the JAX-native way to exercise multi-chip sharding logic without TPU
hardware (SURVEY.md §4): all mesh/pjit tests see 8 CPU devices.

NOTE: this environment's sitecustomize registers the `axon` TPU backend and
force-sets `jax_platforms=axon,cpu` via jax.config — env vars alone do NOT
route to CPU; the config must be updated after importing jax and before any
backend initialization.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# The CPU backend lowers f32 matmuls to a fast low-precision path by default
# on some targets (and the TPU tunnel uses bf16 passes); tests check
# numerics, so force full precision.
jax.config.update("jax_default_matmul_precision", "highest")

# This box has a single CPU core; XLA compiles dominate test time.  The
# persistent compilation cache makes re-runs fast.
from gesturediffusion_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
