"""Persistent XLA compilation cache setup.

First compiles of the scan-heavy samplers are expensive (20-40s on TPU,
worse on the 1-core CPU test platform); the on-disk cache makes every
subsequent process start warm.  Call once before building any jitted fn
(all CLIs and the test conftest do).
"""

from __future__ import annotations

import os

import jax

_DEFAULT_DIR = os.path.expanduser("~/.cache/gesturediffusion_tpu/xla")


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    cache_dir = cache_dir or os.environ.get(
        "GDT_COMPILATION_CACHE", _DEFAULT_DIR
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
