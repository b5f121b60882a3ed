"""Multi-process training worker (NOT a test module — spawned by
tests/test_distributed.py::TestRealMultiProcess).

Each process: jax.distributed.initialize over a localhost coordinator
(via parallel.distributed.maybe_initialize's env gate), a GLOBAL
(data,) mesh over both processes' CPU devices, per-process loader
slices, `make_global_batch` assembly, and two REAL jitted train steps of
the gesture model — actual cross-process collectives, not shard math.

Prints one line per step: `MPLOSS <step> <loss>`; both processes must
print identical values (the step is deterministic given the seeds), and
the spawning test compares them against a single-process 8-device run.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# CPU before any backend init (sitecustomize may force the TPU plugin)
jax.config.update("jax_platforms", "cpu")

from gesturediffusion_tpu.parallel import distributed as dist_lib

assert dist_lib.maybe_initialize(), "GDT_COORDINATOR_ADDRESS must be set"

import numpy as np

from gesturediffusion_tpu.parallel import mesh as mesh_lib
from tests.mp_train_common import build_loop, run_sample, run_steps


def main():
    nproc = dist_lib.process_count()
    pid = dist_lib.process_index()
    assert nproc == int(os.environ["GDT_NUM_PROCESSES"])
    print(f"proc {pid}: local={jax.local_device_count()} "
          f"global={jax.device_count()}", flush=True)

    mesh = mesh_lib.make_mesh(model=1)
    loop = build_loop(
        mesh, save_dir=os.environ["GDT_MP_SAVE_DIR"] + f"/p{pid}",
        process_count=nproc, process_index=pid,
    )
    losses = run_steps(loop, n=2)
    for i, l in enumerate(losses):
        print(f"MPLOSS {i} {l:.6f}", flush=True)
    print(f"MPSAMPLE {run_sample(loop):.4f}", flush=True)

    # save -> resume -> one more step, all processes participating in
    # the (coordinated) orbax write of the global-mesh state
    shared_dir = os.environ["GDT_MP_SAVE_DIR"] + "/shared"
    loop.config = loop.config.__class__(**{
        **loop.config.__dict__, "save_dir": shared_dir})
    path = loop.save()
    loop.load(path)
    post = run_steps(loop, n=1)
    print(f"MPRESUME {post[0]:.6f}", flush=True)
    print(f"proc {pid}: WORKER_OK", flush=True)


if __name__ == "__main__":
    main()
