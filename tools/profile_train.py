"""Capture a jax.profiler trace of the production gesture train step.

Reproduces the "Train-step decomposition" table in PROFILE.md: traces N
warm donated steps of the bf16 microbatched gesture config (8 layers,
latent 256, 498 joints, T=80) and aggregates device-op costs.

    python tools/profile_train.py            # trace + aggregate
    TP_MB=0 python tools/profile_train.py    # no gradient accumulation
    TP_BF16=0 python tools/profile_train.py  # f32 activations

Env knobs: TP_MB (microbatch size, default 128; 0 = full batch),
TP_BF16 (default 1), TP_REMAT (default 0; rematerialize encoder layers),
TP_DROPOUT (default 0.1; 0 ablates the dropout-mask cost),
TP_STEPS (traced steps, default 100),
TP_TRACEDIR (default /tmp/train_trace_out — ~100 MB, not committed).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gesturediffusion_tpu.diffusion import ModelMeanType, create_diffusion
from gesturediffusion_tpu.diffusion.resample import (
    create_named_schedule_sampler,
)
from gesturediffusion_tpu.models.mdm import MDM
from gesturediffusion_tpu.train.loop import (
    TrainConfig, TrainState, make_optimizer, make_train_step,
)
from gesturediffusion_tpu.utils.cache import enable_compilation_cache
from gesturediffusion_tpu.utils.fixseed import set_prng_impl

from trace_agg import aggregate


def build_production_step(use_bf16: bool = True, mb: int = 128,
                          remat: bool = False, dropout: float = 0.1,
                          fused_train: bool = None):
    """The production gesture train step + its inputs (8 layers, latent
    256, 498-dim pose, T=80, batch 256): (step_fn, state, motion, cond,
    rng).  Shared by the trace capture below and
    tools/probe_train_copies.py.  ``fused_train`` (or TP_FUSED=1) runs
    the encoder through the custom-VJP fused Pallas layers."""
    if fused_train is None:
        fused_train = os.environ.get("TP_FUSED", "0") == "1"
    B, J, T, S = 256, 498, 80, 10
    rs = np.random.RandomState(0)
    motion = jnp.asarray(rs.randn(B, J, 1, T), jnp.float32)
    cond = {
        "mfcc": jnp.asarray(rs.randn(B, 26, 1, T), jnp.float32),
        "seed": jnp.asarray(rs.randn(B, J, 1, S), jnp.float32),
        "mask": jnp.ones((B, 1, 1, T), jnp.bool_),
    }
    diffusion = create_diffusion(steps=1000,
                                 model_mean_type=ModelMeanType.START_X)
    model = MDM(njoints=J, latent_dim=256, num_layers=8, ff_size=1024,
                seed_poses=S, cond_mask_prob=0.1, remat=remat,
                dropout=dropout, use_fused_train_encoder=fused_train,
                dtype=jnp.bfloat16 if use_bf16 else jnp.float32)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), motion, jnp.zeros((B,), jnp.int32),
        {k: v for k, v in cond.items() if k != "mask"},
    )

    def apply_fn(p, x, t, c, rngs=None):
        return model.apply(p, x, t, c, train=True, rngs=rngs)

    config = TrainConfig(use_bf16=use_bf16, microbatch_size=mb, batch_size=B)
    tx = make_optimizer(config)
    sampler = create_named_schedule_sampler("uniform", 1000)
    state = TrainState(
        step=jnp.asarray(0, jnp.int32), params=params,
        opt_state=tx.init(params), ema_params={}, sampler=sampler,
    )
    step_fn = make_train_step(diffusion, apply_fn, tx, config)
    return step_fn, state, motion, cond, jax.random.PRNGKey(1)


def main():
    set_prng_impl("rbg")
    enable_compilation_cache()

    use_bf16 = os.environ.get("TP_BF16", "1") == "1"
    mb = int(os.environ.get("TP_MB", "128"))
    n_steps = int(os.environ.get("TP_STEPS", "100"))
    tracedir = os.environ.get("TP_TRACEDIR", "/tmp/train_trace_out")

    step_fn, state, motion, cond, rng = build_production_step(
        use_bf16=use_bf16, mb=mb,
        remat=os.environ.get("TP_REMAT", "0") == "1",
        dropout=float(os.environ.get("TP_DROPOUT", "0.1")),
    )
    state, metrics = step_fn(state, motion, cond, rng)  # compile + warm
    float(metrics["loss"])

    os.system(f"rm -rf {tracedir}")
    t0 = time.perf_counter()
    with jax.profiler.trace(tracedir):
        for _ in range(n_steps):
            state, metrics = step_fn(state, motion, cond, rng)
        loss = float(metrics["loss"])  # forced readback before the clock
    wall = (time.perf_counter() - t0) / n_steps
    print(f"wall {wall*1e3:.2f} ms/step (tunnel dispatch-bound; trust the "
          f"device-op totals below)  loss={loss:.4f}")
    aggregate(tracedir, n_steps)


if __name__ == "__main__":
    main()
