"""Sustained on-chip training soak (TRAINRUN.md evidence capture).

Runs the REAL training CLI (`train_mdm.main`) at the production gesture
config — synthetic dataset at production shapes (498-dim pose, T=80,
MFCC-26, 10 seed poses), batch 256 bf16 with 128-microbatch gradient
accumulation, the same step `tools/profile_train.py` traces — for
SOAK_STEPS steps on the default platform (the real TPU chip), then dumps
the device allocator stats (peak HBM).

Transport: by default the soak trains from a `--device_batch_pool`
(SOAK_POOL batches pre-staged on device once, then cycled).  This
environment reaches the TPU through a tunneled backend whose
host->device link measures 3-80 MB/s (vs >10 GB/s PCIe on a real TPU
host), so per-step upload of the ~48 MB batch would measure the tunnel,
not the machine (measured: ~4 s/step vs the 21 ms device step).  The
jitted step, logger, Orbax checkpointing, and eval paths are exactly the
production ones.  Set SOAK_POOL=0 to run the full host pipeline
(loader -> collate -> per-step upload) end-to-end instead.

To still prove the HOST pipeline paces training, a concurrent daemon
thread runs the real threaded DataLoader (same synthetic dataset, same
batch size, same collate) for the whole soak and reports its production
rate as `LOADERPACE` lines — host batches/s must exceed the device
steps/s for the pipeline to never starve.

Every stdout line is prefixed with epoch seconds so windowed steps/s
(host-pipeline health over hours: loader starvation, logger overhead,
memory creep, tunnel stalls) can be derived from the log afterwards:

    SOAK_STEPS=120000 SOAK_DIR=/tmp/soak python tools/soak_train.py

Env knobs: SOAK_STEPS (default 2000), SOAK_DIR (default /tmp/soak_run),
SOAK_LOG_INTERVAL (default 200), SOAK_SAVE_INTERVAL (default 20000),
SOAK_BATCH (default 256), SOAK_MB (default 128), SOAK_POOL (default 32
pre-staged device batches; 0 = per-step host upload).

The post-soak chain (checkpoint -> sample.generate -> BVH) is driven
separately; see TRAINRUN.md.
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class _Stamped:
    """Line-buffering stdout wrapper prefixing epoch seconds to each line."""

    def __init__(self, stream):
        self.stream = stream
        self._at_line_start = True

    def write(self, s):
        for chunk in s.splitlines(keepends=True):
            if self._at_line_start and chunk.strip():
                self.stream.write(f"[{time.time():.1f}] ")
            self.stream.write(chunk)
            self._at_line_start = chunk.endswith("\n")
        self.stream.flush()

    def flush(self):
        self.stream.flush()


def _loader_pace(batch, stop, report_every=500):
    """Run the real threaded host loader forever; report batches/s."""
    from gesturediffusion_tpu.data.registry import get_dataset_loader
    from gesturediffusion_tpu.data.loader import infinite_batches

    data = get_dataset_loader(
        name="synthetic", batch_size=batch, num_frames=80, seed=123
    )
    n, t0 = 0, time.time()
    for _ in infinite_batches(data):
        n += 1
        if n % report_every == 0:
            dt = time.time() - t0
            print(f"LOADERPACE batches={n} wall={dt:.1f}s "
                  f"rate={n / dt:.2f} batches/s")
        if stop.is_set():
            return


def main():
    sys.stdout = _Stamped(sys.stdout)
    steps = int(os.environ.get("SOAK_STEPS", "2000"))
    save_dir = os.environ.get("SOAK_DIR", "/tmp/soak_run")
    log_interval = os.environ.get("SOAK_LOG_INTERVAL", "200")
    save_interval = os.environ.get("SOAK_SAVE_INTERVAL", "20000")
    batch = os.environ.get("SOAK_BATCH", "256")
    mb = os.environ.get("SOAK_MB", "128")
    pool = os.environ.get("SOAK_POOL", "32")

    from gesturediffusion_tpu.train import train_mdm

    stop = threading.Event()
    pacer = threading.Thread(
        target=_loader_pace, args=(int(batch), stop), daemon=True
    )
    pacer.start()

    t0 = time.time()
    print(f"SOAK start: steps={steps} batch={batch} microbatch={mb} "
          f"pool={pool} save_dir={save_dir}")
    train_mdm.main([
        "--dataset", "synthetic",
        "--save_dir", save_dir,
        "--overwrite",
        "--batch_size", batch,
        "--num_frames", "80",  # the production gesture window (T=80)
        "--use_bf16",
        "--microbatch_size", mb,
        "--device_batch_pool", pool,
        "--log_interval", log_interval,
        "--save_interval", save_interval,
        "--num_steps", str(steps),
    ])
    stop.set()
    wall = time.time() - t0
    print(f"SOAK done: {steps} steps in {wall:.1f}s "
          f"({steps / wall:.2f} steps/s overall)")

    import jax

    dev = jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    print("MEMSTATS " + json.dumps(stats))


if __name__ == "__main__":
    main()
