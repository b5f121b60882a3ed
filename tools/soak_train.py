"""Sustained on-chip training soak (TRAINRUN.md evidence capture).

Runs the REAL training CLI (`train_mdm.main`) at the production gesture
config — synthetic dataset at production shapes (498-dim pose, T=80,
MFCC-26, 10 seed poses), batch 256 bf16 with 128-microbatch gradient
accumulation, the same step `tools/profile_train.py` traces — for
SOAK_STEPS steps on the default platform (the real TPU chip), then dumps
the device allocator stats (peak HBM).

Every stdout line is prefixed with epoch seconds so windowed steps/s
(host-pipeline health over hours: loader starvation, logger overhead,
memory creep, tunnel stalls) can be derived from the log afterwards:

    SOAK_STEPS=120000 SOAK_DIR=/tmp/soak python tools/soak_train.py

Env knobs: SOAK_STEPS (default 2000), SOAK_DIR (default /tmp/soak_run),
SOAK_LOG_INTERVAL (default 200), SOAK_SAVE_INTERVAL (default 20000),
SOAK_BATCH (default 256), SOAK_MB (default 128).

The post-soak chain (checkpoint -> sample.generate -> BVH) is driven
separately; see TRAINRUN.md.
"""

import json
import os
import sys
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


def main():
    sys.stdout = _Stamped(sys.stdout)
    steps = int(os.environ.get("SOAK_STEPS", "2000"))
    save_dir = os.environ.get("SOAK_DIR", "/tmp/soak_run")
    log_interval = os.environ.get("SOAK_LOG_INTERVAL", "200")
    save_interval = os.environ.get("SOAK_SAVE_INTERVAL", "20000")
    batch = os.environ.get("SOAK_BATCH", "256")
    mb = os.environ.get("SOAK_MB", "128")

    from gesturediffusion_tpu.train import train_mdm

    t0 = time.time()
    print(f"SOAK start: steps={steps} batch={batch} microbatch={mb} "
          f"save_dir={save_dir}")
    train_mdm.main([
        "--dataset", "synthetic",
        "--save_dir", save_dir,
        "--overwrite",
        "--batch_size", batch,
        "--num_frames", "80",  # the production gesture window (T=80)
        "--use_bf16",
        "--microbatch_size", mb,
        "--log_interval", log_interval,
        "--save_interval", save_interval,
        "--num_steps", str(steps),
    ])
    wall = time.time() - t0
    print(f"SOAK done: {steps} steps in {wall:.1f}s "
          f"({steps / wall:.2f} steps/s overall)")

    import jax

    dev = jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    print("MEMSTATS " + json.dumps(stats))


if __name__ == "__main__":
    main()
