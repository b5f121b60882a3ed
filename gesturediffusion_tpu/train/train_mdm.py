"""Training CLI: `python -m gesturediffusion_tpu.train.train_mdm`.

Functional parity surface with the reference trainer entry
(reference: train/train_mdm.py:16-49): flags -> seed -> platform ->
save_dir guard + args.json dump -> data -> model+diffusion -> TrainLoop.
"""

from __future__ import annotations

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from gesturediffusion_tpu.data.collate import device_cond
from gesturediffusion_tpu.data.registry import get_dataset_loader
from gesturediffusion_tpu.parallel import mesh as mesh_lib
from gesturediffusion_tpu.train.loop import TrainConfig, TrainLoop
from gesturediffusion_tpu.train.platforms import create_platform
from gesturediffusion_tpu.utils import logger as log_lib
from gesturediffusion_tpu.utils.cache import enable_compilation_cache
from gesturediffusion_tpu.utils.fixseed import fixseed
from gesturediffusion_tpu.utils.model_factory import create_model_and_diffusion
from gesturediffusion_tpu.utils.parser import train_args


def main(argv=None):
    args = train_args(argv)
    fixseed(args.seed)
    from gesturediffusion_tpu.utils.fixseed import set_prng_impl

    set_prng_impl(getattr(args, "prng", "rbg"))
    enable_compilation_cache()

    # multi-host: env-gated jax.distributed.initialize BEFORE backend use
    # (TPU-native replacement for the reference's MPI rank infra,
    # utils/dist_util.py:12-41)
    from gesturediffusion_tpu.parallel import distributed as dist_lib

    dist_lib.maybe_initialize()

    # save_dir guard BEFORE the platform: TensorboardPlatform's
    # SummaryWriter mkdirs save_dir in its constructor, which would trip
    # the exists-check on every fresh run
    if args.save_dir is None:
        raise FileNotFoundError("save_dir was not specified.")
    if os.path.exists(args.save_dir) and not args.overwrite:
        raise FileExistsError(f"save_dir [{args.save_dir}] already exists.")
    os.makedirs(args.save_dir, exist_ok=True)

    train_platform = create_platform(args.train_platform_type, args.save_dir)
    train_platform.report_args(vars(args), name="Args")

    log_lib.log("creating data loader...")
    data = get_dataset_loader(
        name=args.dataset,
        batch_size=args.batch_size,
        num_frames=args.num_frames,
        datapath=args.data_dir or None,
        n_seed_poses=args.seed_poses,
        seed=args.seed,
        # per-process slice of each global batch under multi-host
        process_count=dist_lib.process_count(),
        process_index=dist_lib.process_index(),
    )

    log_lib.log("creating model and diffusion...")
    model, diffusion = create_model_and_diffusion(args, data.dataset)

    text_encoder = None
    if args.dataset in ("humanml", "kit") and not args.unconstrained:
        from gesturediffusion_tpu.utils.text_embedder import get_text_encoder

        text_encoder = get_text_encoder()

    motion, cond = next(iter(data))
    dcond = {k: jnp.asarray(v) for k, v in device_cond(cond).items()}
    if text_encoder is not None and "text" in cond:
        dcond["text_emb"] = jnp.asarray(text_encoder(cond["text"]))
    x0 = jnp.asarray(motion)
    t0 = jnp.zeros((motion.shape[0],), jnp.int32)
    variables = model.init(jax.random.PRNGKey(args.seed), x0, t0, dcond)
    # non-param collections (e.g. WavEncoder BatchNorm running stats) are
    # carried in TrainState.model_state and updated mutably per step
    model_state = {k: v for k, v in variables.items() if k != "params"}
    params = {"params": variables["params"]}
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    log_lib.log(f"model initialized: {n_params / 1e6:.2f}M params")

    if model_state:
        def apply_fn(p, x, t, c, rngs=None, model_state=None):
            out, new_ms = model.apply(
                {**p, **(model_state or {})}, x, t, c, train=True,
                rngs=rngs, mutable=list(model_state.keys()),
            )
            return out, new_ms
    else:
        def apply_fn(p, x, t, c, rngs=None):
            return model.apply(p, x, t, c, train=True, rngs=rngs)

    fk_fn = None
    if args.lambda_rcxyz > 0 or args.lambda_fc > 0:
        from gesturediffusion_tpu.models.rotation2xyz import rotation2xyz
        from gesturediffusion_tpu.models.smpl import load_smpl_pickle

        smpl = load_smpl_pickle(
            os.environ.get("SMPL_MODEL_PATH",
                           "body_models/smpl/SMPL_NEUTRAL.pkl")
        )
        fk_fn = lambda sample: rotation2xyz(  # noqa: E731
            smpl, sample, pose_rep="rot6d", translation=True, glob=True,
            jointstype="smpl", vertstrans=False,
        )

    config = TrainConfig(
        save_dir=args.save_dir,
        lr=args.lr,
        weight_decay=args.weight_decay,
        lr_anneal_steps=args.lr_anneal_steps,
        num_steps=args.num_steps,
        batch_size=args.batch_size,
        log_interval=args.log_interval,
        save_interval=args.save_interval,
        schedule_sampler=args.schedule_sampler,
        ema_rate=args.ema_rate,
        use_bf16=args.use_bf16,
        microbatch_size=getattr(args, "microbatch_size", 0),
        seed=args.seed,
    )
    eval_fn = None
    if args.eval_during_training and args.dataset in ("humanml", "kit"):
        # full T2M benchmark eval every save_interval
        # (reference: training_loop.py:165-202); evaluator falls back to
        # random frozen weights with a loud log when finest.tar is absent
        try:
            from gesturediffusion_tpu.eval.eval_humanml import (
                make_training_eval_fn,
            )

            eval_fn = make_training_eval_fn(
                args, model, diffusion, text_encoder=text_encoder
            )
        except Exception as e:
            log_lib.log(
                f"benchmark eval_during_training unavailable ({e}); "
                "falling back to val-loss eval"
            )
    if args.eval_during_training and eval_fn is None and args.dataset in (
        "humanact12", "uestc"
    ):
        # a2m benchmark eval (reference: training_loop.py:188-199)
        try:
            from gesturediffusion_tpu.eval.eval_a2m import (
                make_a2m_training_eval_fn,
            )

            eval_fn = make_a2m_training_eval_fn(
                args, model, diffusion, data.dataset
            )
        except Exception as e:
            log_lib.log(
                f"a2m eval_during_training unavailable ({e}); "
                "falling back to val-loss eval"
            )
    if args.eval_during_training and eval_fn is None:
        # validation diffusion loss over a fixed batch set with fixed RNG
        # (always-available signal for datasets without a benchmark
        # evaluator)
        try:
            if args.dataset in ("humanml", "kit"):
                eval_split = args.eval_split  # val|test both exist
            elif args.dataset == "synthetic":
                eval_split = "train"
            else:
                eval_split = "val"  # gesture datasets have no test split
            val_data = get_dataset_loader(
                name=args.dataset, batch_size=args.eval_batch_size,
                num_frames=args.num_frames,
                split=eval_split,
                datapath=args.data_dir or None,
                n_seed_poses=args.seed_poses, seed=args.seed + 1,
            )
            max_batches = -(-args.eval_num_samples // args.eval_batch_size)
            val_batches = []
            for i, (vm, vc) in enumerate(val_data):
                if i >= max_batches:
                    break
                vcond = {
                    k: jnp.asarray(v) for k, v in device_cond(vc).items()
                }
                if text_encoder is not None and "text" in vc:
                    vcond["text_emb"] = jnp.asarray(text_encoder(vc["text"]))
                val_batches.append((jnp.asarray(vm), vcond))
            if not val_batches:
                raise ValueError(
                    f"{eval_split} split smaller than eval_batch_size"
                )

            @jax.jit
            def val_loss(params, motion, cond, rng):
                t = jax.random.randint(
                    jax.random.fold_in(rng, 0), (motion.shape[0],), 0,
                    diffusion.num_timesteps,
                )
                noise = jax.random.normal(
                    jax.random.fold_in(rng, 1), motion.shape
                )
                terms = diffusion.training_losses(
                    lambda x, tt, c: model.apply(params, x, tt, c),
                    motion, t, cond, mask=cond["mask"], noise=noise,
                )
                return jnp.mean(terms["loss"])

            def eval_fn(state, step):
                rng = jax.random.PRNGKey(args.seed + 12345)
                # full variables dict: mutable collections (batch_stats
                # for use_wav_enc BatchNorm) live in state.model_state
                variables = {**state.params, **state.model_state}
                losses = [
                    float(val_loss(variables, vm, vc,
                                   jax.random.fold_in(rng, i)))
                    for i, (vm, vc) in enumerate(val_batches)
                ]
                return {"val_loss": float(np.mean(losses))}
        except Exception as e:  # val split may not exist
            log_lib.log(f"eval_during_training disabled: {e}")

    mesh = mesh_lib.make_data_mesh_for_batch(
        args.batch_size, model=args.mesh_model_axis
    )
    loop = TrainLoop(
        config,
        diffusion,
        apply_fn,
        params,
        data,
        mesh=mesh,
        platform=train_platform,
        fk_fn=fk_fn,
        text_encoder=text_encoder,
        args_to_save=vars(args),
        eval_fn=eval_fn,
        init_model_state=model_state,
    )
    if args.resume_checkpoint:
        from gesturediffusion_tpu.train.loop import find_latest_checkpoint
        from gesturediffusion_tpu.utils.checkpoint import TORCH_SUFFIXES

        resume = args.resume_checkpoint
        if resume == "latest":
            # crash-recovery convenience: newest model* dir in save_dir
            resume = find_latest_checkpoint(args.save_dir)
            if resume is None:
                raise FileNotFoundError(
                    f"--resume_checkpoint latest: no model* checkpoint "
                    f"under {args.save_dir}"
                )
        if resume.endswith(TORCH_SUFFIXES):
            # fine-tune from a reference torch checkpoint
            loop.load_torch(resume, model)
        else:
            loop.load(resume)
    batch_source = None
    if getattr(args, "device_batch_pool", 0) > 0:
        batch_source = build_device_batch_pool(
            loop, n_batches=args.device_batch_pool
        )
    log_lib.log("training...")
    loop.run_loop(batch_source=batch_source)
    train_platform.close()


def build_device_batch_pool(loop, n_batches: int):
    """Pre-stage `n_batches` collated batches on device; cycle forever.

    One-time upload through `shard_batch` (so pool arrays carry the exact
    mesh sharding the step expects); the returned iterator feeds
    `TrainLoop.run_loop(batch_source=...)`.  See `--device_batch_pool`.
    """
    import itertools

    log_lib.log(f"staging {n_batches}-batch device pool...")
    src = loop._host_batches()
    pool = []
    for _ in range(n_batches):
        motion, dcond = next(src)
        pool.append((
            mesh_lib.shard_batch(loop.mesh, motion),
            mesh_lib.shard_batch(loop.mesh, dcond),
        ))
    jax.block_until_ready(pool)
    nbytes = sum(
        leaf.nbytes for leaf in jax.tree_util.tree_leaves(pool)
    )
    log_lib.log(
        f"device pool staged: {n_batches} batches, {nbytes / 1e6:.1f} MB"
    )
    return itertools.cycle(pool)


if __name__ == "__main__":
    main(sys.argv[1:])
