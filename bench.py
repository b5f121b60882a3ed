"""Headline benchmark: HumanML3D-config sampling throughput per chip.

Measures the north-star metric from BASELINE.json: samples/sec/chip on the
1000-step DDPM loop with classifier-free guidance, using the
humanml-encoder-512 model configuration (8 layers, d=512, 263-dim pose,
196 frames, batch 32, guidance 2.5).  The whole chain runs as one on-device
lax.scan with the CFG pair batched (2x32 effective batch per step).

vs_baseline: the reference publishes no direct throughput number; the
anchor is derived from its own wall-clocks (BASELINE.md): the T2M eval —
~20h for 20 replications over the HumanML3D test split (~4384 prompts,
batch 32, 1000 DDPM steps, 2 sequential CFG passes) — implies ≈1.2
samples/sec on the reference's single GPU.  vs_baseline = ours / 1.2.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_SAMPLES_PER_SEC = 1.2  # derived from README.md:379 wall-clock


# Derived gesture anchor: the reference runs one 1000-step chain with 2
# sequential CFG passes per chunk (sample/generate.py:91-130), same
# structure as its T2M eval loop that implies 1.2 samples/sec (above).
# Scale that anchor by batch (41 takes/chunk vs 32) and per-forward cost
# (t2m: 197 tokens x d512 vs gesture: 81 tokens x d256 encoder):
_T2M_FWD_COST = 197 * (4 * 512**2 + 2 * 512 * 1024)
_GESTURE_FWD_COST = 81 * (4 * 256**2 + 2 * 256 * 1024)
REFERENCE_GESTURE_CHUNKS_PER_SEC = (
    REFERENCE_SAMPLES_PER_SEC * (41 / 32) * (_T2M_FWD_COST / _GESTURE_FWD_COST)
)  # ~14.7 take-chunks/sec


def bench_gesture():
    """Secondary config (GDT_BENCH_CONFIG=gesture): MDM-V2 chunked-AR
    gesture throughput — 1000-step DDPM + CFG per 80-frame chunk with
    seed hand-off, the fork's production path (sample/generate.py:91-130).
    Reports 80-frame take-chunks/sec/chip."""
    from gesturediffusion_tpu.diffusion import ModelMeanType, create_diffusion
    from gesturediffusion_tpu.diffusion.sampling import p_sample_loop
    from gesturediffusion_tpu.models.cfg import classifier_free_guidance
    from gesturediffusion_tpu.models.mdm import MDM
    from gesturediffusion_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    B, J, T, S = 41, 498, 80, 10  # 41 takes per chunk (reference layout)
    model = MDM(njoints=J, latent_dim=256, num_layers=8, ff_size=1024,
                seed_poses=S, cond_mask_prob=0.1)
    diffusion = create_diffusion(
        steps=1000, model_mean_type=ModelMeanType.START_X
    )
    rs = np.random.RandomState(0)
    x0 = jnp.asarray(rs.randn(B, J, 1, T), jnp.float32)
    cond = {
        "mfcc": jnp.asarray(rs.randn(B, 26, 1, T), jnp.float32),
        "seed": jnp.asarray(rs.randn(B, J, 1, S), jnp.float32),
        "scale": jnp.full((B,), 2.5, jnp.float32),
    }
    params = model.init(
        jax.random.PRNGKey(0), x0, jnp.zeros((B,), jnp.int32),
        {k: v for k, v in cond.items() if k != "scale"},
    )
    model_fn = classifier_free_guidance(
        lambda x, t, c: model.apply(params, x, t, c), 0.1
    )

    @jax.jit
    def chunk(rng, c):
        return p_sample_loop(diffusion, model_fn, (B, J, 1, T), rng, c)

    out = jax.block_until_ready(chunk(jax.random.PRNGKey(0), cond))
    n_chunks = 3
    t0 = time.perf_counter()
    for i in range(n_chunks):
        # autoregressive seed hand-off between chunks
        c = dict(cond, seed=out[..., -S:])
        out = chunk(jax.random.PRNGKey(i + 1), c)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - t0
    takes_sec = B * n_chunks / elapsed
    per_chip = takes_sec / jax.device_count()
    print(json.dumps({
        "metric": "genea_ddpm1000_cfg_take_chunks_per_sec_per_chip",
        "value": round(per_chip, 4),
        "unit": "80-frame chunks/sec/chip",
        "vs_baseline": round(
            per_chip / REFERENCE_GESTURE_CHUNKS_PER_SEC, 3
        ),
    }))


def main():
    if os.environ.get("GDT_BENCH_CONFIG", "humanml") == "gesture":
        return bench_gesture()
    from gesturediffusion_tpu.diffusion import ModelMeanType, create_diffusion
    from gesturediffusion_tpu.diffusion.sampling import p_sample_loop
    from gesturediffusion_tpu.models.cfg import classifier_free_guidance
    from gesturediffusion_tpu.models.mdm_t2m import MotionMDM
    from gesturediffusion_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    B, J, T = 32, 263, 196
    use_bf16 = os.environ.get("GDT_BENCH_DTYPE", "bf16") == "bf16"
    dtype = jnp.bfloat16 if use_bf16 else jnp.float32

    model = MotionMDM(njoints=J, latent_dim=512, num_layers=8, ff_size=1024,
                      cond_mode="text", cond_mask_prob=0.1)
    diffusion = create_diffusion(
        steps=1000, noise_schedule="cosine",
        model_mean_type=ModelMeanType.START_X,
    )

    rs = np.random.RandomState(0)
    x0 = jnp.asarray(rs.randn(B, J, 1, T), jnp.float32)
    t0 = jnp.zeros((B,), jnp.int32)
    cond = {
        "text_emb": jnp.asarray(rs.randn(B, 512), jnp.float32),
        "scale": jnp.full((B,), 2.5, jnp.float32),
    }
    params = model.init(jax.random.PRNGKey(0), x0, t0,
                        {"text_emb": cond["text_emb"]})
    if use_bf16:
        params = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16), params
        )

    def base_model_fn(x, t, c):
        out = model.apply(params, x.astype(dtype), t, c)
        return out.astype(jnp.float32)

    model_fn = classifier_free_guidance(base_model_fn, cond_mask_prob=0.1)

    @jax.jit
    def sample(rng):
        return p_sample_loop(
            diffusion, model_fn, (B, J, 1, T), rng, cond, clip_denoised=False
        )

    # compile + warmup
    out = jax.block_until_ready(sample(jax.random.PRNGKey(0)))
    assert bool(jnp.all(jnp.isfinite(out))), "non-finite samples"

    n_iters = int(os.environ.get("GDT_BENCH_ITERS", "3"))
    t_start = time.perf_counter()
    for i in range(n_iters):
        out = sample(jax.random.PRNGKey(i + 1))
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - t_start

    samples_per_sec = (B * n_iters) / elapsed
    n_chips = jax.device_count()
    per_chip = samples_per_sec / n_chips
    print(json.dumps({
        "metric": "humanml3d_ddpm1000_cfg_samples_per_sec_per_chip",
        "value": round(per_chip, 4),
        "unit": "samples/sec/chip",
        "vs_baseline": round(per_chip / REFERENCE_SAMPLES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
