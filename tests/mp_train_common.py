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
    loop = TrainLoop(cfg, diffusion, apply_fn, params, data, mesh=mesh)
    loop._mp_apply = lambda p, x, t, c: model.apply(p, x, t, c)
    return loop


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


def run_sample(loop: TrainLoop) -> float:
    """One dp-sharded DDIM chain over the global mesh with the loop's
    (post-step) params; deterministic, so single- and multi-process runs
    must produce the same checksum."""
    import jax.numpy as jnp

    from gesturediffusion_tpu.diffusion import create_diffusion
    from gesturediffusion_tpu.diffusion.sampling import ddim_sample_loop

    from gesturediffusion_tpu.parallel import distributed as dist_lib

    ds = loop.data.dataset  # identical items in every process
    # multi-process shard_batch expects this process's LOCAL slice of
    # the global batch (exactly like the loader feeds it)
    sl = (dist_lib.local_batch_slice(
        B, jax.process_count(), jax.process_index())
        if jax.process_count() > 1 else slice(0, B))
    items = [ds[i] for i in range(B)][sl]
    _, cond = collate_gesture(items, max_frames=T)
    dcond = {k: np.asarray(v) for k, v in device_cond(cond).items()}
    dcond = mesh_lib.shard_batch(loop.mesh, dcond)

    diffusion = create_diffusion(
        steps=16, model_mean_type=ModelMeanType.START_X,
        timestep_respacing="ddim4",
    )
    apply = loop._mp_apply  # eval-mode apply, set by build_loop

    # global arrays (params live on the global mesh) must be ARGUMENTS —
    # closing over non-addressable-device arrays is rejected under
    # multi-process jit
    @jax.jit
    def sample(params, c, rng):
        out = ddim_sample_loop(
            diffusion, lambda x, t, cc: apply(params, x, t, cc),
            (B, J, 1, T), rng, c,
        )
        return jnp.sum(out * out)

    return float(jax.device_get(
        sample(loop.state.params, dcond, jax.random.PRNGKey(7))
    ))
