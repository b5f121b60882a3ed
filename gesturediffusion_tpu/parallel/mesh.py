"""Mesh construction and sharding rules.

The reference's distributed layer is a neutered MPI/NCCL shim
(reference: utils/dist_util.py:18-51, diffusion/resample.py:83-99).  The
TPU-native replacement is GSPMD over a `jax.sharding.Mesh`:

  * axis "data"  — batch parallelism over ICI (replaces DDP); gradients
    all-reduce automatically because params are replicated.
  * axis "model" — reserved for tensor parallelism of the denoiser's
    Dense/attention weights (latent dims here are small, so dp is the
    production layout; the axis exists so larger configs shard cleanly).

Collectives (psum for gradient reduction, all_gather for the loss-aware
sampler's global view) are inserted by XLA from sharding annotations — no
hand-written communication.
"""

from __future__ import annotations

import warnings
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: Optional[int] = None,
    model: int = 1,
) -> Mesh:
    """Build a (data, model) mesh; defaults to all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"{data}x{model} mesh != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def make_data_mesh_for_batch(batch_size: int, model: int = 1) -> Mesh:
    """All-devices (data, model) mesh, clamped so the batch divides the
    data axis.

    A smoke run (batch 4) on an 8-device host must not crash on the
    batch-axis sharding; use the largest divisor of the batch that fits
    the available data-parallel width and leave the rest of the devices
    idle, loudly (a `warnings.warn`, so it reaches logs and test
    assertions — not just stdout).

    Multi-process runs never clamp: a subset mesh can exclude every
    device some process owns, and `shard_batch`/`make_global_batch` on a
    mesh with no addressable local devices deadlocks in collectives.
    There the batch must divide the slice's data width — raise early and
    clearly instead."""
    devices = jax.devices()
    n = len(devices)
    assert n % model == 0, f"model axis {model} does not divide {n} devices"
    width = n // model
    if batch_size % width == 0:
        return make_mesh(devices, data=width, model=model)
    if jax.process_count() > 1:
        raise ValueError(
            f"batch_size {batch_size} is not divisible by the slice's "
            f"data-parallel width {width} ({n} devices / model axis "
            f"{model}).  Multi-process meshes cannot shrink to a device "
            f"subset (a process left without devices deadlocks in "
            f"collectives) — pick a batch divisible by {width}."
        )
    # largest divisor of the batch that fits the width (beats
    # gcd(batch, width): batch 12 on 8 devices -> dp 6, not 4)
    dp = max(d for d in range(1, width + 1) if batch_size % d == 0)
    warnings.warn(
        f"batch_size {batch_size} is not divisible by the available "
        f"data-parallel width {width} ({n} devices / model axis "
        f"{model}) — using a {dp}x{model} mesh ({n - dp * model} "
        f"devices idle). Pick a batch divisible by {width} to use the "
        f"whole slice.",
        stacklevel=2,
    )
    return make_mesh(devices[: dp * model], data=dp, model=model)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def axis1_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 1 over 'data' — the chunk-cond layout [C, B, ...]
    (sampling's per-chunk scan inputs carry the batch second)."""
    return NamedSharding(mesh, P(None, "data"))


def shard_batch(mesh: Mesh, batch):
    """Place a host batch pytree with the batch axis sharded over 'data'.

    Single-process: a plain device_put.  Multi-process (multi-host): the
    input is this process's LOCAL shard (host numpy — do NOT pre-upload;
    device->host readback of eager arrays hangs on tunneled backends) and
    the result is the logically global array, assembled by
    `parallel.distributed.make_global_batch` to match the per-process
    loader slices (data/loader.py)."""
    if jax.process_count() > 1:
        from gesturediffusion_tpu.parallel.distributed import (
            make_global_batch,
        )

        return make_global_batch(mesh, batch)
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def shard_params_tp(
    params, mesh: Mesh, min_size: int = 1 << 16
) -> "jax.tree_util.PyTreeDef":
    """Opt-in tensor parallelism: shard large Dense kernels over 'model'.

    2-D kernels [in, out] shard the output dim; everything else (biases,
    norms, small tables) stays replicated.  GSPMD then propagates the
    layouts through the jitted train/sample steps and inserts the
    all-reduces — no model-code changes (the scaling-book recipe: pick a
    mesh, annotate shardings, let XLA place collectives).

    Known limits (dp is the production layout; tp is for larger configs):
      * the heuristic is shape-based — it does not align attention-head
        boundaries, so a head can straddle shards (GSPMD stays correct
        but inserts extra collectives);
      * packed QKV kernels [D, 3D] shard across the q/k/v split;
      * correctness is covered by the 8-device dryrun + sharded-vs-single
        numeric equivalence tests at test scale for BOTH dp-only and
        dp=4 x tp=2 layouts (tests/test_train.py::TestSharding), not at
        CLI scale.
    """
    tp = mesh.shape["model"]

    def place(x):
        if (
            hasattr(x, "ndim")
            and x.ndim == 2
            and x.size >= min_size
            and x.shape[1] % tp == 0
        ):
            return jax.device_put(x, NamedSharding(mesh, P(None, "model")))
        return jax.device_put(x, replicated(mesh))

    return jax.tree_util.tree_map(place, params)
