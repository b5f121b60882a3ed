"""Training loop tests: jitted GSPMD step, loss descent, checkpoint/resume."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gesturediffusion_tpu.data.collate import collate_gesture
from gesturediffusion_tpu.data.loader import DataLoader
from gesturediffusion_tpu.data.synthetic import SyntheticGesture
from gesturediffusion_tpu.diffusion import ModelMeanType, create_diffusion
from gesturediffusion_tpu.models.mdm import MDM
from gesturediffusion_tpu.parallel import mesh as mesh_lib
from gesturediffusion_tpu.train.loop import (
    TrainConfig,
    TrainLoop,
    find_latest_checkpoint,
    parse_resume_step_from_filename,
)

J, T, S = 16, 20, 4


def tiny_setup(tmp_path, **cfg_kw):
    model = MDM(njoints=J, latent_dim=32, num_layers=1, ff_size=64,
                seed_poses=S, cl_head=4, window_size=10, cond_mask_prob=0.1)
    diffusion = create_diffusion(
        steps=20, model_mean_type=ModelMeanType.START_X
    )
    ds = SyntheticGesture(n_items=32, window=T, pose_dim=J, n_seed_poses=S)
    data = DataLoader(ds, batch_size=8, collate_fn=collate_gesture,
                      num_workers=1)

    x0 = jnp.zeros((8, J, 1, T))
    t0 = jnp.zeros((8,), jnp.int32)
    from gesturediffusion_tpu.data.collate import device_cond

    _, cond = next(iter(data))
    cond = {k: jnp.asarray(v) for k, v in device_cond(cond).items()}
    params = model.init(jax.random.PRNGKey(0), x0, t0, cond)

    def apply_fn(p, x, t, c, rngs=None):
        return model.apply(p, x, t, c, train=True, rngs=rngs)

    cfg = TrainConfig(
        save_dir=str(tmp_path / "run"),
        lr=1e-3,
        num_steps=cfg_kw.pop("num_steps", 5),
        log_interval=2,
        save_interval=cfg_kw.pop("save_interval", 100),
        batch_size=8,
        **cfg_kw,
    )
    loop = TrainLoop(cfg, diffusion, apply_fn, params, data,
                     args_to_save={"dataset": "synthetic"})
    return loop


class TestTrainStep:
    def test_loss_decreases(self, tmp_path):
        loop = tiny_setup(tmp_path, num_steps=30)
        from gesturediffusion_tpu.data.collate import device_cond

        losses = []
        batches = iter(loop.data)
        data_cycle = []
        for motion, cond in batches:
            data_cycle.append((motion, cond))
        i = 0
        for step in range(30):
            motion, cond = data_cycle[i % len(data_cycle)]
            i += 1
            dcond = {k: jnp.asarray(v) for k, v in device_cond(cond).items()}
            loop.state, metrics = loop.train_step(
                loop.state, jnp.asarray(motion), dcond, loop.rng
            )
            losses.append(float(metrics["loss"]))
        assert np.all(np.isfinite(losses))
        assert np.mean(losses[-5:]) < np.mean(losses[:5])

    def test_nonfinite_batch_skips_update_and_training_continues(
        self, tmp_path
    ):
        """A NaN batch must not poison params: the jitted step skips the
        update, bumps the skip counter, and the next clean step proceeds."""
        loop = tiny_setup(tmp_path, num_steps=3)
        from gesturediffusion_tpu.data.collate import device_cond

        motion, cond = next(iter(loop.data))
        dcond = {k: jnp.asarray(v) for k, v in device_cond(cond).items()}
        motion = jnp.asarray(motion)
        params_before = jax.tree_util.tree_map(np.asarray, loop.state.params)

        bad = motion.at[0, 0, 0, 0].set(jnp.nan)
        loop.state, metrics = loop.train_step(loop.state, bad, dcond, loop.rng)
        assert int(metrics["nonfinite_skips"]) == 1
        assert not np.isfinite(float(metrics["loss"]))
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
            loop.state.params,
            params_before,
        )

        loop.state, metrics = loop.train_step(
            loop.state, motion, dcond, loop.rng
        )
        assert int(metrics["nonfinite_skips"]) == 1
        assert np.isfinite(float(metrics["loss"]))
        changed = any(
            not np.array_equal(np.asarray(a), b)
            for a, b in zip(
                jax.tree_util.tree_leaves(loop.state.params),
                jax.tree_util.tree_leaves(params_before),
            )
        )
        assert changed

    def test_microbatch_grads_match_full_batch(self, tmp_path):
        """Gradient accumulation (microbatch_size) must produce the same
        update as the full batch when dropout/cond-mask are off (the RNG
        streams differ only for the stochastic masks)."""
        from gesturediffusion_tpu.diffusion import (
            ModelMeanType,
            create_diffusion,
        )
        from gesturediffusion_tpu.train.loop import make_train_step

        model = MDM(njoints=J, latent_dim=32, num_layers=1, ff_size=64,
                    seed_poses=S, cl_head=4, window_size=10,
                    cond_mask_prob=0.0, dropout=0.0)
        diffusion = create_diffusion(
            steps=16, model_mean_type=ModelMeanType.START_X
        )
        ds = SyntheticGesture(n_items=8, window=T, pose_dim=J,
                              n_seed_poses=S)
        data = DataLoader(ds, batch_size=8, collate_fn=collate_gesture,
                          num_workers=1)
        from gesturediffusion_tpu.data.collate import device_cond

        motion, cond = next(iter(data))
        dcond = {k: jnp.asarray(v) for k, v in device_cond(cond).items()}
        motion = jnp.asarray(motion)
        params = model.init(jax.random.PRNGKey(0), motion,
                            jnp.zeros((8,), jnp.int32), dcond)

        def apply_fn(p, x, t, c, rngs=None):
            return model.apply(p, x, t, c, train=True, rngs=rngs)

        import optax

        from gesturediffusion_tpu.diffusion.resample import (
            create_named_schedule_sampler,
        )
        from gesturediffusion_tpu.train.loop import (
            TrainConfig as TC,
            TrainState as TS,
            make_optimizer,
        )

        results = {}
        for mb in (0, 4, 2):
            cfg = TC(lr=1e-3, microbatch_size=mb)
            # SGD: the update is LINEAR in the gradient, so microbatch
            # accumulation equivalence shows directly in the params
            # (Adam's sqrt(v) normalization amplifies f32 summation-order
            # noise on near-zero grads into sign flips)
            tx = optax.sgd(1e-3)
            state = TS(
                step=jnp.asarray(0, jnp.int32),
                params=jax.tree_util.tree_map(jnp.copy, params),
                opt_state=tx.init(params),
                ema_params={},
                sampler=create_named_schedule_sampler("uniform", 16),
            )
            step = make_train_step(diffusion, apply_fn, tx, cfg)
            new_state, metrics = step(state, motion, dcond,
                                      jax.random.PRNGKey(7))
            results[mb] = (
                jax.tree_util.tree_map(np.asarray, new_state.params),
                float(metrics["loss"]),
            )
        for mb in (4, 2):
            assert abs(results[mb][1] - results[0][1]) < 1e-5
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_allclose(
                    a, b, atol=1e-6, rtol=1e-4
                ),
                results[mb][0], results[0][0],
            )

    def test_wav_encoder_batchnorm_trains_mutably(self, tmp_path):
        """Models with mutable collections (WavEncoder BatchNorm running
        stats) must train: stats live in TrainState.model_state and are
        updated per step."""
        model = MDM(njoints=J, latent_dim=32, num_layers=1, ff_size=64,
                    seed_poses=S, cl_head=4, window_size=10,
                    mfcc_input=False, use_wav_enc=True, cond_mask_prob=0.1)
        from gesturediffusion_tpu.diffusion import (
            ModelMeanType,
            create_diffusion,
        )

        diffusion = create_diffusion(
            steps=8, model_mean_type=ModelMeanType.START_X
        )
        ds = SyntheticGesture(n_items=8, window=T, pose_dim=J,
                              n_seed_poses=S)
        data = DataLoader(ds, batch_size=4, collate_fn=collate_gesture,
                          num_workers=1)
        from gesturediffusion_tpu.data.collate import device_cond

        motion, cond = next(iter(data))
        dcond = {k: jnp.asarray(v) for k, v in device_cond(cond).items()}
        variables = model.init(
            jax.random.PRNGKey(0), jnp.asarray(motion),
            jnp.zeros((4,), jnp.int32), dcond,
        )
        assert "batch_stats" in variables
        model_state = {k: v for k, v in variables.items() if k != "params"}
        params = {"params": variables["params"]}

        def apply_fn(p, x, t, c, rngs=None, model_state=None):
            out, new_ms = model.apply(
                {**p, **(model_state or {})}, x, t, c, train=True,
                rngs=rngs, mutable=list(model_state.keys()),
            )
            return out, new_ms

        cfg = TrainConfig(save_dir=str(tmp_path / "wav"), lr=1e-3,
                          num_steps=2, log_interval=1, batch_size=4)
        loop = TrainLoop(cfg, diffusion, apply_fn, params, data,
                         init_model_state=model_state)
        before = np.asarray(
            loop.state.model_state["batch_stats"]["wav_encoder"]["bn_0"][
                "mean"
            ]
        ).copy()
        loop.state, metrics = loop.train_step(
            loop.state, jnp.asarray(motion), dcond, loop.rng
        )
        assert np.isfinite(float(metrics["loss"]))
        after = np.asarray(
            loop.state.model_state["batch_stats"]["wav_encoder"]["bn_0"][
                "mean"
            ]
        )
        assert not np.array_equal(before, after)  # running stats updated
        # checkpoint merges batch_stats into "params" for inference
        loop.host_step = 1
        path = loop.save()
        import orbax.checkpoint as ocp

        restored = ocp.PyTreeCheckpointer().restore(path)
        assert "batch_stats" in restored["params"]

    def test_run_loop_and_checkpoint(self, tmp_path):
        os.environ["DIFFUSION_TRAINING_TEST"] = "1"
        try:
            loop = tiny_setup(tmp_path, num_steps=4, save_interval=2)
            loop.run_loop()
        finally:
            os.environ.pop("DIFFUSION_TRAINING_TEST")
        ckpt = find_latest_checkpoint(loop.config.save_dir)
        assert ckpt is not None
        assert os.path.exists(
            os.path.join(loop.config.save_dir, "args.json")
        )

    def test_checkpoint_roundtrip(self, tmp_path):
        loop = tiny_setup(tmp_path, num_steps=3)
        from gesturediffusion_tpu.data.collate import device_cond

        motion, cond = next(iter(loop.data))
        dcond = {k: jnp.asarray(v) for k, v in device_cond(cond).items()}
        loop.state, _ = loop.train_step(
            loop.state, jnp.asarray(motion), dcond, loop.rng
        )
        loop.host_step = 1  # run_loop does this bookkeeping
        path = loop.save()

        loop2 = tiny_setup(tmp_path, num_steps=3)
        loop2.load(path)
        assert int(loop2.state.step) == 1
        p1 = jax.tree_util.tree_leaves(loop.state.params)
        p2 = jax.tree_util.tree_leaves(loop2.state.params)
        for a, b in zip(p1, p2):
            np.testing.assert_allclose(a, b)

    def test_finetune_from_torch_checkpoint(self, tmp_path):
        """--resume_checkpoint model*.pt: converted weights load, EMA
        restarts from them, optimizer is fresh, step comes from the
        filename, and training continues."""
        import jax.tree_util as jtu

        from gesturediffusion_tpu.utils.convert_torch import (
            save_torch_checkpoint,
        )

        loop = tiny_setup(tmp_path, num_steps=126, ema_rate=0.5)
        model = MDM(njoints=J, latent_dim=32, num_layers=1, ff_size=64,
                    seed_poses=S, cl_head=4, window_size=10,
                    cond_mask_prob=0.1)
        before = jtu.tree_map(np.asarray, loop.state.params)
        pt = str(tmp_path / "model000000123.pt")
        save_torch_checkpoint(pt, loop.state.params, model)

        loop.load_torch(pt, model)
        assert loop.resume_step == 123
        after = jtu.tree_map(np.asarray, loop.state.params)
        diffs = jtu.tree_map(
            lambda a, b: float(np.abs(a - b).max()), before, after
        )
        assert max(jtu.tree_leaves(diffs)) < 1e-6
        # EMA restarted from the loaded weights
        ediffs = jtu.tree_map(
            lambda a, b: float(np.abs(np.asarray(a) - b).max()),
            loop.state.ema_params, after,
        )
        assert max(jtu.tree_leaves(ediffs)) < 1e-6
        loop.run_loop()  # 3 steps (126 - 123) must run clean

    def test_finetune_resumes_lr_anneal_schedule(self, tmp_path):
        """load_torch must advance the LR-anneal schedule count to the
        filename step (the reference anneals on step + resume_step) while
        Adam's own count stays 0 (its moments are fresh)."""
        import optax

        from gesturediffusion_tpu.utils.convert_torch import (
            save_torch_checkpoint,
        )

        loop = tiny_setup(tmp_path, num_steps=130, lr_anneal_steps=1000)
        model = MDM(njoints=J, latent_dim=32, num_layers=1, ff_size=64,
                    seed_poses=S, cl_head=4, window_size=10,
                    cond_mask_prob=0.1)
        pt = str(tmp_path / "model000000123.pt")
        save_torch_checkpoint(pt, loop.state.params, model)
        loop.load_torch(pt, model)

        sched_counts = [
            int(s.count)
            for s in jax.tree_util.tree_leaves(
                loop.state.opt_state,
                is_leaf=lambda s: isinstance(
                    s, optax.ScaleByScheduleState
                ),
            )
            if isinstance(s, optax.ScaleByScheduleState)
        ]
        assert sched_counts and all(c == 123 for c in sched_counts)
        adam_counts = [
            int(s.count)
            for s in jax.tree_util.tree_leaves(
                loop.state.opt_state,
                is_leaf=lambda s: isinstance(s, optax.ScaleByAdamState),
            )
            if isinstance(s, optax.ScaleByAdamState)
        ]
        assert adam_counts and all(c == 0 for c in adam_counts)

    def test_parse_resume_step(self):
        assert parse_resume_step_from_filename("/x/model000012345") == 12345
        assert parse_resume_step_from_filename("model000000050/") == 50
        assert parse_resume_step_from_filename("nothing") == 0


class TestSharding:
    def test_eight_device_mesh_step(self, tmp_path):
        assert jax.device_count() == 8, "conftest must fake 8 devices"
        loop = tiny_setup(tmp_path)
        mesh = mesh_lib.make_mesh()
        from gesturediffusion_tpu.data.collate import device_cond

        motion, cond = next(iter(loop.data))
        dcond = {k: jnp.asarray(v) for k, v in device_cond(cond).items()}
        motion = mesh_lib.shard_batch(mesh, jnp.asarray(motion))
        dcond = mesh_lib.shard_batch(mesh, dcond)
        state, metrics = loop.train_step(loop.state, motion, dcond, loop.rng)
        assert np.isfinite(float(metrics["loss"]))

    def test_sharded_equals_single(self, tmp_path):
        """GSPMD-sharded step must produce the same update as unsharded."""
        loop_a = tiny_setup(tmp_path / "a")
        loop_b = tiny_setup(tmp_path / "b")
        mesh = mesh_lib.make_mesh()
        from gesturediffusion_tpu.data.collate import device_cond

        motion, cond = next(iter(loop_a.data))
        dcond = {k: jnp.asarray(v) for k, v in device_cond(cond).items()}

        state_a, ma = loop_a.train_step(
            loop_a.state, jnp.asarray(motion), dcond, loop_a.rng
        )
        sharded_motion = mesh_lib.shard_batch(mesh, jnp.asarray(motion))
        sharded_cond = mesh_lib.shard_batch(mesh, dcond)
        state_b, mb = loop_b.train_step(
            loop_b.state, sharded_motion, sharded_cond, loop_b.rng
        )
        np.testing.assert_allclose(
            float(ma["loss"]), float(mb["loss"]), rtol=1e-5
        )
        la = jax.tree_util.tree_leaves(state_a.params)
        lb = jax.tree_util.tree_leaves(state_b.params)
        # Adam divides by sqrt(v)+eps, amplifying reduction-order noise from
        # the sharded gradient all-reduce; 5e-4 still catches real bugs.
        for a, b in zip(la, lb):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)

    def test_tensor_parallel_equals_single(self, tmp_path):
        """dp=4 x tp=2: shard_params_tp kernels over 'model' — the step
        must match the unsharded update (GSPMD propagates the layouts and
        inserts the collectives; VERDICT r1 asked for this assertion)."""
        loop_a = tiny_setup(tmp_path / "a")
        loop_b = tiny_setup(tmp_path / "b")
        mesh = mesh_lib.make_mesh(data=4, model=2)
        from gesturediffusion_tpu.data.collate import device_cond

        motion, cond = next(iter(loop_a.data))
        dcond = {k: jnp.asarray(v) for k, v in device_cond(cond).items()}

        state_a, ma = loop_a.train_step(
            loop_a.state, jnp.asarray(motion), dcond, loop_a.rng
        )
        # min_size=0: every 2-D kernel (incl. the tiny test model's) shards
        state_b = loop_b.state.replace(
            params=mesh_lib.shard_params_tp(
                loop_b.state.params, mesh, min_size=0
            )
        )
        state_b, mb = loop_b.train_step(
            state_b,
            mesh_lib.shard_batch(mesh, jnp.asarray(motion)),
            mesh_lib.shard_batch(mesh, dcond),
            loop_b.rng,
        )
        np.testing.assert_allclose(
            float(ma["loss"]), float(mb["loss"]), rtol=1e-5
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(state_a.params),
            jax.tree_util.tree_leaves(state_b.params),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-4)


class TestReviewFixesRound3d:
    """Regressions from the train/parallel package review (round 3)."""

    def test_find_latest_checkpoint_numeric_order(self, tmp_path):
        from gesturediffusion_tpu.train.loop import find_latest_checkpoint

        assert find_latest_checkpoint(str(tmp_path / "nope")) is None
        for n in ("model9", "model10", "model000000002"):
            (tmp_path / n).mkdir()
        # lexicographic would pick 'model9'; numeric must pick 10
        got = find_latest_checkpoint(str(tmp_path))
        assert os.path.basename(got) == "model10"

    def test_trainloop_places_state_on_mesh(self, tmp_path):
        """TrainLoop must commit its state to the mesh at init: on a
        (data=4, model=2) mesh, large kernels (and their Adam moments)
        get the TP sharding without the caller invoking
        shard_params_tp."""
        model = MDM(njoints=J, latent_dim=256, num_layers=1, ff_size=256,
                    seed_poses=S, cl_head=4, window_size=10,
                    cond_mask_prob=0.1)
        diffusion = create_diffusion(
            steps=8, model_mean_type=ModelMeanType.START_X
        )
        ds = SyntheticGesture(n_items=16, window=T, pose_dim=J,
                              n_seed_poses=S)
        data = DataLoader(ds, batch_size=8, collate_fn=collate_gesture,
                          num_workers=1)
        from gesturediffusion_tpu.data.collate import device_cond

        _, cond = next(iter(data))
        cond = {k: jnp.asarray(v) for k, v in device_cond(cond).items()}
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((8, J, 1, T)),
            jnp.zeros((8,), jnp.int32), cond,
        )
        cfg = TrainConfig(save_dir=str(tmp_path / "run"), lr=1e-3,
                          num_steps=1, batch_size=8)
        mesh = mesh_lib.make_mesh(model=2)
        loop = TrainLoop(cfg, diffusion, apply_fn=lambda p, x, t, c,
                         rngs=None: model.apply(p, x, t, c, train=True,
                                                rngs=rngs),
                         init_params=params, data=data, mesh=mesh)

        specs = {
            ".".join(str(k.key) for k in path): leaf.sharding.spec
            for path, leaf in jax.tree_util.tree_leaves_with_path(
                loop.state.params
            )
        }
        tp_specs = [s for s in specs.values() if "model" in str(s)]
        assert tp_specs, f"no TP-sharded kernel found: {specs}"
        # Adam moments mirror the kernel shapes -> same placement
        opt_tp = [
            leaf for leaf in jax.tree_util.tree_leaves(loop.state.opt_state)
            if hasattr(leaf, "sharding")
            and "model" in str(getattr(leaf.sharding, "spec", ""))
        ]
        assert opt_tp, "optimizer moments not TP-sharded"
        # and the placed state still trains
        motion, cond2 = next(iter(loop.data))
        dcond = {k: jnp.asarray(v)
                 for k, v in device_cond(cond2).items()}
        motion = mesh_lib.shard_batch(mesh, jnp.asarray(motion))
        dcond = mesh_lib.shard_batch(mesh, dcond)
        new_state, metrics = loop.train_step(
            loop.state, motion, dcond, jax.random.PRNGKey(1)
        )
        assert np.isfinite(float(metrics["loss"]))

    def test_logged_loss_is_weighted_objective(self, tmp_path):
        """metrics['loss'] (and the per-term means) must be the
        importance-WEIGHTED values the optimizer sees, matching the
        reference's log_loss_dict(losses * weights)."""
        loop = tiny_setup(tmp_path)
        from gesturediffusion_tpu.data.collate import device_cond

        motion, cond = next(iter(loop.data))
        dcond = {k: jnp.asarray(v) for k, v in device_cond(cond).items()}
        new_state, metrics = loop.train_step(
            loop.state, jnp.asarray(motion), dcond, jax.random.PRNGKey(3)
        )
        # uniform sampler: weights == 1, so rot_mse mean must equal the
        # optimized loss exactly (both weighted)
        np.testing.assert_allclose(
            float(metrics["loss"]), float(metrics["rot_mse"]), rtol=1e-6
        )


class TestDeviceBatchPool:
    """--device_batch_pool: pre-staged device batches cycle through the
    production run_loop (transport knob for bandwidth-limited hosts)."""

    def test_pool_run_matches_host_path_shapes_and_trains(self, tmp_path):
        from gesturediffusion_tpu.train.train_mdm import (
            build_device_batch_pool,
        )

        loop = tiny_setup(tmp_path, num_steps=8)
        src = build_device_batch_pool(loop, n_batches=3)
        # pool entries are device arrays with the mesh batch sharding
        motion, dcond = next(src)
        assert isinstance(motion, jax.Array)
        assert motion.shape == (8, J, 1, T)
        # cycles: after the remaining 2 pool entries, the 1st batch
        # comes around again (same device buffer, not a copy)
        batches = [next(src) for _ in range(2)]
        again, _ = next(src)
        assert again is motion
        loop.run_loop(batch_source=src)
        assert int(loop.state.step) == 8

    def test_pool_run_is_byte_identical_to_host_path(self, tmp_path):
        """run_loop(batch_source=pool) must produce the IDENTICAL
        parameter trajectory as the host path when the batch sequences
        coincide (unshuffled loader, pool size = batches/epoch): the
        jitted step, rng folding, and logging bookkeeping are shared, so
        the only difference is where the batch bytes come from."""
        from gesturediffusion_tpu.train.train_mdm import (
            build_device_batch_pool,
        )

        def make_loop(subdir):
            model = MDM(njoints=J, latent_dim=32, num_layers=1, ff_size=64,
                        seed_poses=S, cl_head=4, window_size=10,
                        cond_mask_prob=0.1)
            diffusion = create_diffusion(
                steps=20, model_mean_type=ModelMeanType.START_X
            )
            ds = SyntheticGesture(n_items=32, window=T, pose_dim=J,
                                  n_seed_poses=S)
            data = DataLoader(ds, batch_size=8, collate_fn=collate_gesture,
                              num_workers=1, shuffle=False)
            x0 = jnp.zeros((8, J, 1, T))
            t0 = jnp.zeros((8,), jnp.int32)
            from gesturediffusion_tpu.data.collate import device_cond

            _, cond = next(iter(data))
            cond = {k: jnp.asarray(v)
                    for k, v in device_cond(cond).items()}
            params = model.init(jax.random.PRNGKey(0), x0, t0, cond)

            def apply_fn(p, x, t, c, rngs=None):
                return model.apply(p, x, t, c, train=True, rngs=rngs)

            cfg = TrainConfig(
                save_dir=str(tmp_path / subdir), lr=1e-3, num_steps=9,
                log_interval=100, save_interval=100, batch_size=8,
            )
            return TrainLoop(cfg, diffusion, apply_fn, params, data,
                             args_to_save={"dataset": "synthetic"})

        host_loop = make_loop("host")
        host_loop.run_loop()

        pool_loop = make_loop("pool")
        # 32 items / batch 8 = 4 batches/epoch; unshuffled epochs repeat,
        # so a 4-batch pool cycles through the same sequence
        src = build_device_batch_pool(pool_loop, n_batches=4)
        pool_loop.run_loop(batch_source=src)

        host_leaves = jax.tree_util.tree_leaves_with_path(
            host_loop.state.params
        )
        pool_params = dict(
            jax.tree_util.tree_leaves_with_path(pool_loop.state.params)
        )
        assert host_leaves
        for path, leaf in host_leaves:
            np.testing.assert_array_equal(
                np.asarray(leaf), np.asarray(pool_params[path]),
                err_msg=f"param {path} diverged between host and pool path",
            )

    def test_cli_flag_wires_pool(self, tmp_path, capsys):
        from gesturediffusion_tpu.train import train_mdm

        train_mdm.main([
            "--dataset", "synthetic",
            "--save_dir", str(tmp_path / "pool_run"),
            "--batch_size", "8",
            "--num_frames", "20",
            "--device_batch_pool", "2",
            "--num_steps", "3",
            "--log_interval", "2",
            "--save_interval", "100",
        ])
        out = capsys.readouterr().out
        assert "device pool staged: 2 batches" in out
