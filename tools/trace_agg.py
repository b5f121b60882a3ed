"""Aggregate XLA device-op costs from a jax.profiler chrome trace.

Shared helper for tools/profile_take.py and tools/profile_train.py (the
PROFILE.md capture scripts).  Reads the ``*.trace.json.gz`` files a
``jax.profiler.trace(dir)`` block writes, keeps only the "XLA Ops"
device track, strips trailing op-instance numbers (``fusion.216`` ->
``fusion``) unless ``group=False``, and prints per-step costs.

Usage:  python tools/trace_agg.py TRACEDIR N_STEPS [--no-group]
"""

import glob
import gzip
import json
import re
import sys
from collections import defaultdict


def aggregate(tracedir, n_steps, group=True, top=30):
    files = glob.glob(f"{tracedir}/**/*.trace.json.gz", recursive=True)
    if not files:
        raise SystemExit(f"no *.trace.json.gz under {tracedir}")
    agg = defaultdict(float)
    cnt = defaultdict(int)
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        tid_names = {}
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "M" and ev.get("name") == "thread_name":
                tid_names[(ev["pid"], ev["tid"])] = ev["args"].get("name", "")
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            if tid_names.get((ev.get("pid"), ev.get("tid")), "") != "XLA Ops":
                continue
            name = ev["name"]
            if name.startswith("while"):
                continue  # loop wrapper; children are counted individually
            if group:
                name = re.sub(r"[.\d]+$", "", name)
            agg[name] += ev.get("dur", 0)
            cnt[name] += 1
    tot = sum(agg.values())
    print(f"op total (excl. while wrapper): {tot/n_steps/1e3:.3f} ms/step")
    for name, us in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{us/n_steps:10.1f} us/step  x{cnt[name]/n_steps:<7.1f} "
              f"{name[:90]}")
    return agg, cnt


if __name__ == "__main__":
    tracedir = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    aggregate(tracedir, n, group="--no-group" not in sys.argv)
