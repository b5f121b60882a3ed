"""Shared builder for the real-multi-process training test: the SAME
model/data/step construction runs (a) inside each spawned worker over a
global 2-process mesh and (b) in the normal single-process 8-device test
for the reference losses — determinism of every piece (synthetic data,
CPU PRNG, uniform sampler) makes the losses bit-comparable."""

from __future__ import annotations

import jax
import numpy as np

from gesturediffusion_tpu.data.collate import collate_gesture, device_cond
from gesturediffusion_tpu.data.loader import DataLoader
from gesturediffusion_tpu.data.synthetic import SyntheticGesture
from gesturediffusion_tpu.diffusion import ModelMeanType, create_diffusion
from gesturediffusion_tpu.models.mdm import MDM
from gesturediffusion_tpu.parallel import mesh as mesh_lib
from gesturediffusion_tpu.train.loop import TrainConfig, TrainLoop

J, T, S, B = 24, 20, 4, 8


def build_loop(mesh, save_dir: str, process_count: int = 1,
               process_index: int = 0) -> TrainLoop:
    model = MDM(njoints=J, latent_dim=32, num_layers=1, ff_size=64,
                seed_poses=S, cl_head=4, window_size=10,
                cond_mask_prob=0.1)
    diffusion = create_diffusion(
        steps=16, model_mean_type=ModelMeanType.START_X
    )
    ds = SyntheticGesture(n_items=32, window=T, pose_dim=J, n_seed_poses=S)
    data = DataLoader(
        ds, batch_size=B, collate_fn=collate_gesture, num_workers=1,
        seed=0, process_count=process_count, process_index=process_index,
    )

    x0 = np.zeros((B, J, 1, T), np.float32)
    t0 = np.zeros((B,), np.int32)
    item0 = [ds[i] for i in range(B)]
    _, cond0 = collate_gesture(item0, max_frames=T)
    dcond0 = {k: np.asarray(v) for k, v in device_cond(cond0).items()}
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0, t0, dcond0)

    def apply_fn(p, x, t, c, rngs=None):
        return model.apply(p, x, t, c, train=True, rngs=rngs)

    cfg = TrainConfig(save_dir=save_dir, lr=1e-3, num_steps=2,
                      batch_size=B, log_interval=1000,
                      save_interval=10_000, seed=0)
    return TrainLoop(cfg, diffusion, apply_fn, params, data, mesh=mesh)


def run_steps(loop: TrainLoop, n: int = 2) -> list:
    """n deterministic steps through the SAME path run_loop uses
    (shard_batch + jitted train_step); returns the host losses."""
    from gesturediffusion_tpu.data.loader import infinite_batches

    batches = infinite_batches(loop.data)
    losses = []
    for _ in range(n):
        motion, cond = next(batches)
        dcond = device_cond(cond)
        motion = mesh_lib.shard_batch(loop.mesh, motion)
        dcond = mesh_lib.shard_batch(loop.mesh, dcond)
        loop.state, metrics = loop.train_step(
            loop.state, motion, dcond, loop.rng
        )
        losses.append(float(jax.device_get(metrics["loss"])))
    return losses
