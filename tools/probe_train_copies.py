"""Pinpoint the train step's copy ops (the ~26%-of-device-time family in
PROFILE.md's decomposition) from the optimized HLO, without running.

Compiles the production train step for the default backend (TPU when the
chip is up; set JAX_PLATFORMS=cpu for a structural-only look), then
groups every `copy`, `copy-start`, and kCopy-fusion instruction by the
copied operand's shape, attributing bytes to a component:

  * params/opt-state-shaped arrays (donation layout reconciliation)
  * [B,T,latent]-shaped activations (backward residuals)
  * [B,H,T,T] score tensors (attention backward)

Also compiles a NO-DONATION variant of the same step: if its copy-byte
total drops, the copies are the aliasing/layout reconciliation XLA
inserts to satisfy donated input->output buffer reuse, not residuals.

    python tools/probe_train_copies.py            # bf16, microbatch 128
    TP_MB=0 TP_BF16=0 python tools/probe_train_copies.py
"""

import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from gesturediffusion_tpu.utils.cache import enable_compilation_cache
from gesturediffusion_tpu.utils.fixseed import set_prng_impl

from profile_train import build_production_step

_SHAPE = re.compile(r"(?:bf16|f32|f16|s32|u32|pred|u8)\[[0-9,]*\]")
_DTYPE_BYTES = {"bf16": 2, "f16": 2, "f32": 4, "s32": 4, "u32": 4,
                "pred": 1, "u8": 1}


def shape_bytes(s: str) -> int:
    dt, dims = s.split("[", 1)
    dims = dims.rstrip("]")
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES[dt]


def copy_table(hlo: str):
    """{result_shape: (count, bytes)} over copy/copy-start instructions."""
    out = collections.Counter()
    nbytes = collections.Counter()
    for line in hlo.splitlines():
        stripped = line.strip()
        # `shape copy(operand)` / `(shape,...) copy-start(...)`
        m = re.search(r"=\s*(\S+?)\s+(copy|copy-start)\(", stripped)
        if not m:
            continue
        shapes = _SHAPE.findall(m.group(1))
        if not shapes:
            continue
        s = shapes[0]
        out[s] += 1
        nbytes[s] += shape_bytes(s)
    return out, nbytes


def report(tag: str, hlo: str):
    counts, nbytes = copy_table(hlo)
    total = sum(nbytes.values())
    print(f"\n== {tag}: {sum(counts.values())} copies, "
          f"{total / 1e6:.1f} MB total ==")
    for s, b in nbytes.most_common(12):
        print(f"  {s:>28}  x{counts[s]:<4} {b / 1e6:9.2f} MB")
    return total


def main():
    set_prng_impl("rbg")
    enable_compilation_cache()
    use_bf16 = os.environ.get("TP_BF16", "1") == "1"
    mb = int(os.environ.get("TP_MB", "128"))
    step_fn, state, motion, cond, rng = build_production_step(
        use_bf16=use_bf16, mb=mb)

    lowered = step_fn.lower(state, motion, cond, rng)
    hlo = lowered.compile().as_text()
    donated_total = report("donated (production) step", hlo)

    step_nodonate = jax.jit(step_fn.__wrapped__)
    hlo2 = step_nodonate.lower(state, motion, cond, rng).compile().as_text()
    nodonate_total = report("no-donation variant", hlo2)

    print(f"\ndonated copy bytes {donated_total / 1e6:.1f} MB vs "
          f"no-donation {nodonate_total / 1e6:.1f} MB -> "
          + ("donation-reconciliation dominated"
             if donated_total > 1.5 * nodonate_total
             else "copies are NOT donation artifacts (residual/layout)"))


if __name__ == "__main__":
    main()
