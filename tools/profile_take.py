"""Capture a jax.profiler trace of one full gesture take on the chip.

Reproduces the "Trace-derived decomposition" table in PROFILE.md: runs
the same program as bench.py's headline (a full 14-chunk, 1000-step
DDPM+CFG take as ONE device program on the bf16 fast path), traces one
warm take, and aggregates device-op costs per denoise step.

    python tools/profile_take.py                       # 1 take-set (41)
    GDT_BENCH_TAKESETS=4 python tools/profile_take.py  # serving layout

Env knobs mirror bench.py (GDT_BENCH_TAKESETS, GDT_BENCH_DTYPE,
GDT_BENCH_FASTPATH); TP_TRACEDIR defaults to /tmp/take_trace_out
(~160 MB, not committed).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gesturediffusion_tpu.diffusion import ModelMeanType, create_diffusion
from gesturediffusion_tpu.diffusion.sampling import (
    autoregressive_sample_loop,
)
from gesturediffusion_tpu.models.cfg import classifier_free_guidance
from gesturediffusion_tpu.models.mdm import MDM
from gesturediffusion_tpu.models.mdm_fastpath import make_fast_cfg_fn
from gesturediffusion_tpu.utils.cache import enable_compilation_cache
from gesturediffusion_tpu.utils.fixseed import set_prng_impl

from trace_agg import aggregate


def main():
    set_prng_impl("rbg")
    enable_compilation_cache()

    n_sets = int(os.environ.get("GDT_BENCH_TAKESETS", "1"))
    B, J, T, S = 41 * n_sets, 498, 80, 10
    C, STEPS = 14, 1000
    use_bf16 = os.environ.get("GDT_BENCH_DTYPE", "bf16") == "bf16"
    tracedir = os.environ.get("TP_TRACEDIR", "/tmp/take_trace_out")

    model = MDM(njoints=J, latent_dim=256, num_layers=8, ff_size=1024,
                seed_poses=S, cond_mask_prob=0.1, use_fused_encoder=True,
                dtype=jnp.bfloat16 if use_bf16 else jnp.float32)
    diffusion = create_diffusion(steps=STEPS,
                                 model_mean_type=ModelMeanType.START_X)
    rs = np.random.RandomState(0)
    x0 = jnp.asarray(rs.randn(B, J, 1, T), jnp.float32)
    cond_init = {
        "mfcc": jnp.asarray(rs.randn(B, 26, 1, T), jnp.float32),
        "seed": jnp.asarray(rs.randn(B, J, 1, S), jnp.float32),
    }
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), x0, jnp.zeros((B,), jnp.int32), cond_init
    )
    if os.environ.get("GDT_BENCH_FASTPATH", "1") == "1":
        precompute_cfg, model_fn = make_fast_cfg_fn(model, params, 0.1)
    else:
        precompute_cfg = None
        model_fn = classifier_free_guidance(
            lambda x, t, c: model.apply(params, x, t, c), 0.1
        )
    chunk_conds = {
        "mfcc": jnp.asarray(rs.randn(C, B, 26, 1, T), jnp.float32),
        "scale": jnp.full((C, B), 2.5, jnp.float32),
    }

    @jax.jit
    def take(rng, cc, seed0):
        return autoregressive_sample_loop(
            diffusion, model_fn, (B, J, 1, T), rng, cc, seed0, S,
            cond_precompute=precompute_cfg,
        )

    out = jax.block_until_ready(
        take(jax.random.PRNGKey(0), chunk_conds, cond_init["seed"])
    )
    assert bool(jnp.all(jnp.isfinite(out)))

    os.system(f"rm -rf {tracedir}")
    t0 = time.perf_counter()
    with jax.profiler.trace(tracedir):
        out = take(jax.random.PRNGKey(1), chunk_conds, cond_init["seed"])
        float(jnp.sum(out))  # forced readback before reading the clock
    wall = time.perf_counter() - t0
    n_steps = C * STEPS
    print(f"take wall {wall:.2f} s = {wall/n_steps*1e3:.4f} ms/denoise-step "
          f"({B*C/wall:.2f} chunks/s)")
    aggregate(tracedir, n_steps)


if __name__ == "__main__":
    main()
