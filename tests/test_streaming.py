"""Streaming serving session (serve/streaming.py).

The core contract: feeding per-chunk conditioning incrementally must
reproduce the batch path (`autoregressive_sample_loop`, one device
program over all chunks) — same per-chunk rng fold, same seed hand-off.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gesturediffusion_tpu.diffusion import ModelMeanType, create_diffusion
from gesturediffusion_tpu.diffusion.sampling import (
    autoregressive_sample_loop,
)
from gesturediffusion_tpu.models.mdm import MDM
from gesturediffusion_tpu.models.mdm_fastpath import (
    select_sampling_model_fn,
)
from gesturediffusion_tpu.serve import StreamingGestureSession

B, J, T, S, A, D, C = 2, 24, 16, 4, 8, 32, 3
STEPS = 8
GUIDANCE = 2.5


def _build():
    model = MDM(
        njoints=J, latent_dim=D, num_layers=2, ff_size=64, num_heads=4,
        seed_poses=S, cond_mask_prob=0.1, mfcc_dim=A, window_size=5,
    )
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(B, J, 1, T), jnp.float32)
    cond = {
        "mfcc": jnp.asarray(rs.randn(B, A, 1, T), jnp.float32),
        "seed": jnp.asarray(rs.randn(B, J, 1, S), jnp.float32),
    }
    params = model.init(
        jax.random.PRNGKey(0), x, jnp.zeros((B,), jnp.int32), cond
    )
    chunk_mfcc = np.asarray(
        np.random.RandomState(1).randn(C, B, A, 1, T), np.float32
    )
    return model, params, cond["seed"], chunk_mfcc


def _batch_path(model, params, seed0, chunk_mfcc, rng_seed=0):
    diffusion = create_diffusion(
        steps=STEPS, model_mean_type=ModelMeanType.START_X
    )
    precompute, model_fn = select_sampling_model_fn(
        model, params, GUIDANCE, 0.1
    )
    chunk_conds = {
        "mfcc": jnp.asarray(chunk_mfcc),
        "scale": jnp.full((C, B), GUIDANCE, jnp.float32),
    }
    return np.asarray(
        autoregressive_sample_loop(
            diffusion, model_fn, (B, J, 1, T),
            jax.random.PRNGKey(rng_seed), chunk_conds, seed0, S,
            cond_precompute=precompute,
        )
    )


class TestStreamingEquivalence:
    def test_incremental_matches_batch_path(self):
        model, params, seed0, chunk_mfcc = _build()
        want = _batch_path(model, params, seed0, chunk_mfcc)

        session = StreamingGestureSession(
            model, params, guidance_param=GUIDANCE, streams=B,
            chunk_frames=T, seed_poses=S, diffusion_steps=STEPS,
        )
        session.start(seed0, rng=0)
        got = np.stack(
            [session.feed({"mfcc": chunk_mfcc[k]}) for k in range(C)]
        )
        # XLA compiles the scan body and the standalone chunk program
        # with different fusion choices, so bitwise equality is not
        # expected — but a wrong rng fold or seed hand-off would diverge
        # at O(1), far past this tolerance
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)

    def test_rng_and_seed_carry_matter(self):
        # different session rng => different chunks; restarting with the
        # same rng reproduces chunk 0 exactly
        model, params, seed0, chunk_mfcc = _build()
        session = StreamingGestureSession(
            model, params, guidance_param=GUIDANCE, streams=B,
            chunk_frames=T, seed_poses=S, diffusion_steps=STEPS,
        )
        session.start(seed0, rng=0)
        first = session.feed({"mfcc": chunk_mfcc[0]})
        second = session.feed({"mfcc": chunk_mfcc[0]})
        assert not np.allclose(first, second)  # k folds into the rng

        session.start(seed0, rng=1)
        other_rng = session.feed({"mfcc": chunk_mfcc[0]})
        assert not np.allclose(first, other_rng)

        session.start(seed0, rng=0)
        np.testing.assert_array_equal(
            session.feed({"mfcc": chunk_mfcc[0]}), first
        )

    def test_feed_before_start_raises(self):
        model, params, _, chunk_mfcc = _build()
        session = StreamingGestureSession(
            model, params, streams=B, chunk_frames=T, seed_poses=S,
            diffusion_steps=STEPS,
        )
        with pytest.raises(RuntimeError, match="start"):
            session.feed({"mfcc": chunk_mfcc[0]})

    def test_bad_seed_shape_rejected(self):
        model, params, seed0, _ = _build()
        session = StreamingGestureSession(
            model, params, streams=B, chunk_frames=T, seed_poses=S,
            diffusion_steps=STEPS,
        )
        with pytest.raises(ValueError, match="init_seed shape"):
            session.start(np.zeros((B, J, 1, S + 1), np.float32))


class TestShardedServing:
    def test_mesh_sharded_matches_unsharded(self):
        from gesturediffusion_tpu.parallel import mesh as mesh_lib

        model, params, _, _ = _build()
        streams = 4
        rs = np.random.RandomState(3)
        seed0 = rs.randn(streams, J, 1, S).astype(np.float32)
        mfcc = rs.randn(streams, A, 1, T).astype(np.float32)

        def run(mesh):
            session = StreamingGestureSession(
                model, params, guidance_param=GUIDANCE, streams=streams,
                chunk_frames=T, seed_poses=S, diffusion_steps=STEPS,
                mesh=mesh,
            )
            session.start(seed0, rng=0)
            return session.feed({"mfcc": mfcc})

        want = run(None)
        mesh = mesh_lib.make_mesh(jax.devices()[:4], data=4)
        got = run(mesh)
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)

    def test_indivisible_streams_rejected(self):
        from gesturediffusion_tpu.parallel import mesh as mesh_lib

        model, params, _, _ = _build()
        mesh = mesh_lib.make_mesh(jax.devices()[:4], data=4)
        with pytest.raises(ValueError, match="data axis"):
            StreamingGestureSession(
                model, params, streams=3, chunk_frames=T, seed_poses=S,
                diffusion_steps=STEPS, mesh=mesh,
            )


class TestRespacedAndSamplers:
    @pytest.mark.parametrize("sampler", ["ddpm", "ddim", "plms", "dpmpp"])
    def test_respaced_sampler_runs(self, sampler):
        model, params, seed0, chunk_mfcc = _build()
        session = StreamingGestureSession(
            model, params, guidance_param=GUIDANCE, sampler=sampler,
            sample_steps=4, streams=B, chunk_frames=T, seed_poses=S,
            diffusion_steps=STEPS,
        )
        session.start(seed0, rng=0)
        out = session.feed({"mfcc": chunk_mfcc[0]})
        assert out.shape == (B, J, 1, T)
        assert np.isfinite(out).all()

    def test_diffusion_and_step_spacing_conflict(self):
        """step_spacing can only be baked into a session-built diffusion;
        silently ignoring it next to a prebuilt one would lie to the
        caller (regression)."""
        from gesturediffusion_tpu.diffusion import create_diffusion

        model, params, _, _ = _build()
        with pytest.raises(ValueError, match="prebuilt"):
            StreamingGestureSession(
                model, params, diffusion=create_diffusion(steps=STEPS),
                step_spacing="logsnr", streams=B, chunk_frames=T,
                seed_poses=S,
            )

    def test_logsnr_spacing_session_runs(self):
        model, params, seed0, chunk_mfcc = _build()
        session = StreamingGestureSession(
            model, params, guidance_param=GUIDANCE, streams=B,
            chunk_frames=T, seed_poses=S, diffusion_steps=STEPS,
            sampler="dpmpp", sample_steps=4, step_spacing="logsnr",
        )
        assert session._diffusion.num_timesteps == 4
        session.start(seed0, rng=0)
        out = session.feed({"mfcc": chunk_mfcc[0]})
        assert np.isfinite(out).all()

    def test_diffusion_and_sample_steps_conflict(self):
        model, params, _, _ = _build()
        diffusion = create_diffusion(
            steps=STEPS, model_mean_type=ModelMeanType.START_X
        )
        with pytest.raises(ValueError, match="not both"):
            StreamingGestureSession(
                model, params, diffusion=diffusion, sample_steps=4,
                streams=B, chunk_frames=T, seed_poses=S,
            )


class TestAudioFrontEnd:
    def test_feed_audio_matches_manual_mfcc(self):
        from gesturediffusion_tpu.ops.mfcc import mfcc_for_window

        _, _, seed0, _ = _build()
        model_a = MDM(
            njoints=J, latent_dim=D, num_layers=2, ff_size=64, num_heads=4,
            seed_poses=S, cond_mask_prob=0.1, mfcc_dim=26, window_size=5,
        )
        rs = np.random.RandomState(2)
        sr, fps = 8000, 30.0
        wav = rs.randn(int(sr * T / fps)).astype(np.float32)
        cond = {
            "mfcc": jnp.asarray(rs.randn(B, 26, 1, T), jnp.float32),
            "seed": seed0,
        }
        x = jnp.asarray(rs.randn(B, J, 1, T), jnp.float32)
        params_a = model_a.init(
            jax.random.PRNGKey(0), x, jnp.zeros((B,), jnp.int32), cond
        )
        mean = rs.randn(26).astype(np.float32)
        std = np.abs(rs.randn(26)).astype(np.float32) + 0.5

        def fresh():
            s = StreamingGestureSession(
                model_a, params_a, guidance_param=GUIDANCE, streams=B,
                chunk_frames=T, seed_poses=S, diffusion_steps=STEPS,
                fps=fps,
            )
            s.start(seed0, rng=0)
            return s

        got = fresh().feed_audio(
            wav, samplerate=sr, mfcc_mean=mean, mfcc_std=std
        )

        feats = mfcc_for_window(wav, fps=fps, samplerate=sr)
        feats = ((feats - mean) / std).astype(np.float32)[:T]
        mf = np.zeros((B, 26, 1, T), np.float32)
        mf[:, :, 0, : feats.shape[0]] = feats.T
        want = fresh().feed({"mfcc": mf})
        np.testing.assert_array_equal(got, want)

    def test_feed_audio_shape_validation(self):
        model, params, seed0, _ = _build()
        session = StreamingGestureSession(
            model, params, streams=B, chunk_frames=T, seed_poses=S,
            diffusion_steps=STEPS,
        )
        session.start(seed0, rng=0)
        with pytest.raises(ValueError, match="streams"):
            session.feed_audio(np.zeros((B + 1, 100), np.float32))


class TestStats:
    def test_latency_accounting(self):
        model, params, seed0, chunk_mfcc = _build()
        session = StreamingGestureSession(
            model, params, guidance_param=GUIDANCE, streams=B,
            chunk_frames=T, seed_poses=S, diffusion_steps=STEPS, fps=30.0,
        )
        session.start(seed0, rng=0)
        assert session.stats().chunks == 0
        for k in range(2):
            session.feed({"mfcc": chunk_mfcc[k]})
        s = session.stats()
        assert s.chunks == 2
        assert s.total_latency_s >= s.worst_latency_s >= s.last_latency_s > 0
        assert s.motion_seconds_per_chunk == pytest.approx(T / 30.0)
        assert s.realtime_speedup > 0
        # stats() returns a copy — mutating it doesn't touch the session
        s.chunks = 99
        assert session.stats().chunks == 2

    def test_reset_stats_keeps_take_state(self):
        model, params, seed0, chunk_mfcc = _build()
        session = StreamingGestureSession(
            model, params, guidance_param=GUIDANCE, streams=B,
            chunk_frames=T, seed_poses=S, diffusion_steps=STEPS, fps=30.0,
        )
        session.start(seed0, rng=0)
        want = [session.feed({"mfcc": chunk_mfcc[k]}) for k in range(C)]

        session.start(seed0, rng=0)
        got = [session.feed({"mfcc": chunk_mfcc[0]})]
        session.reset_stats()  # warm-up absorbed; take state untouched
        assert session.stats().chunks == 0
        got += [session.feed({"mfcc": chunk_mfcc[k]}) for k in range(1, C)]
        for w, g in zip(want, got):
            np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-5)
        assert session.stats().chunks == C - 1


class TestNfeats:
    def test_session_respects_model_nfeats(self):
        """A rot6d-style model (nfeats != 1) must get a correctly shaped
        sample and accept its [B, J, F, S] seed (regression: the shape
        was hardcoded to nfeats=1)."""
        F = 2
        model = MDM(
            njoints=J, nfeats=F, latent_dim=D, num_layers=2, ff_size=64,
            num_heads=4, seed_poses=S, cond_mask_prob=0.1, mfcc_dim=A,
            window_size=5,
        )
        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.randn(B, J, F, T), jnp.float32)
        cond = {
            "mfcc": jnp.asarray(rs.randn(B, A, 1, T), jnp.float32),
            "seed": jnp.asarray(rs.randn(B, J, F, S), jnp.float32),
        }
        params = model.init(
            jax.random.PRNGKey(0), x, jnp.zeros((B,), jnp.int32), cond
        )
        session = StreamingGestureSession(
            model, params, guidance_param=GUIDANCE, streams=B,
            chunk_frames=T, seed_poses=S, diffusion_steps=STEPS,
        )
        session.start(np.asarray(cond["seed"]), rng=0)
        out = session.feed(
            {"mfcc": np.asarray(rs.randn(B, A, 1, T), np.float32)}
        )
        assert out.shape == (B, J, F, T)
        assert np.all(np.isfinite(out))
