"""Multi-host (multi-process) scaffolding.

The reference's multi-node story is vestigial MPI rank plumbing
(reference: utils/dist_util.py:12-41 commented-out init,
diffusion/logger.py:403-439 env rank detection).  The TPU-native
replacement (SURVEY.md §2.9/§5) is:

  * `jax.distributed.initialize` once per process (env-gated here so
    single-host runs are untouched),
  * a global `Mesh` spanning all processes' devices — GSPMD handles ICI
    within a slice and DCN across slices from the same sharding
    annotations,
  * per-process data loading: every process loads only its slice of each
    global batch (same permutation everywhere via a shared seed), and
    `jax.make_array_from_process_local_data` assembles the logically
    global sharded batch.

Multi-HOST hardware cannot run in this environment, but the full
multi-PROCESS path is executed for real: tests/test_distributed.py
::TestRealMultiProcess spawns two processes over a localhost
coordinator (4 CPU devices each), builds the global mesh, loads
per-process shards, and runs jitted train steps with actual
cross-process collectives — losses match a single-process run over the
same 8 devices.  The remaining untested delta to a TPU pod is the
DCN/ICI transport, not this code path.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def maybe_initialize() -> bool:
    """Env-gated `jax.distributed.initialize`.

    Set GDT_COORDINATOR_ADDRESS (+ GDT_NUM_PROCESSES, GDT_PROCESS_ID) to
    opt in; on TPU pods where the runtime provides the topology the two
    latter vars may be omitted.  Returns True if initialization ran.
    """
    addr = os.environ.get("GDT_COORDINATOR_ADDRESS")
    if not addr:
        return False
    kwargs = {"coordinator_address": addr}
    if os.environ.get("GDT_NUM_PROCESSES"):
        kwargs["num_processes"] = int(os.environ["GDT_NUM_PROCESSES"])
    if os.environ.get("GDT_PROCESS_ID"):
        kwargs["process_id"] = int(os.environ["GDT_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    return True


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def local_batch_slice(
    global_batch: int, num_processes: int, process_id: int
) -> slice:
    """The contiguous slice of a global batch owned by `process_id`.

    Global batches must divide evenly (static shapes under jit); the
    loader enforces this at construction time.
    """
    if global_batch % num_processes != 0:
        raise ValueError(
            f"global batch {global_batch} not divisible by "
            f"{num_processes} processes"
        )
    per = global_batch // num_processes
    if not 0 <= process_id < num_processes:
        raise ValueError(f"process_id {process_id} out of range")
    return slice(process_id * per, (process_id + 1) * per)


def make_global_batch(mesh, local_tree):
    """Assemble a logically-global, batch-sharded array from this
    process's local shard (`jax.make_array_from_process_local_data`)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sh, np.asarray(x)
        ),
        local_tree,
    )
