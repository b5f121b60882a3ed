"""Diffusion core tests: schedule math, process identities, samplers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gesturediffusion_tpu.diffusion import (
    GaussianDiffusion,
    LossType,
    ModelMeanType,
    ModelVarType,
    create_diffusion,
)
from gesturediffusion_tpu.diffusion import sampling, schedules
from gesturediffusion_tpu.diffusion.resample import (
    LossSecondMomentState,
    UniformSampler,
)

KEY = jax.random.PRNGKey(0)
SHAPE = (4, 6, 1, 8)  # [B, J, F, T]


def small_diffusion(steps=50, **kw):
    kw.setdefault("noise_schedule", "cosine")
    kw.setdefault("model_mean_type", ModelMeanType.START_X)
    return create_diffusion(steps=steps, **kw)


class TestSchedules:
    def test_linear_schedule_endpoints(self):
        betas = schedules.get_named_beta_schedule("linear", 1000)
        assert betas[0] == pytest.approx(1e-4)
        assert betas[-1] == pytest.approx(0.02)
        assert np.all(betas > 0) and np.all(betas <= 1)

    def test_cosine_schedule_bounded(self):
        betas = schedules.get_named_beta_schedule("cosine", 1000)
        assert np.all(betas > 0) and np.all(betas <= 0.999)

    def test_space_timesteps_ddim(self):
        steps = schedules.space_timesteps(1000, "ddim50")
        assert len(steps) == 50
        assert 0 in steps

    def test_space_timesteps_sections(self):
        steps = schedules.space_timesteps(100, [10])
        assert len(steps) == 10
        assert 0 in steps and 99 in steps

    def test_respaced_identity(self):
        """Respacing onto ALL timesteps must reproduce the base schedule."""
        betas = schedules.get_named_beta_schedule("cosine", 100)
        new_betas, tmap = schedules.respaced_betas(betas, set(range(100)))
        np.testing.assert_allclose(new_betas, betas, rtol=1e-10)
        np.testing.assert_array_equal(tmap, np.arange(100))

    def test_respaced_alphas_cumprod_match(self):
        """Kept steps must preserve the original cumulative alphas."""
        betas = schedules.get_named_beta_schedule("cosine", 100)
        keep = schedules.space_timesteps(100, [10])
        new_betas, tmap = schedules.respaced_betas(betas, keep)
        base_ac = np.cumprod(1 - betas)
        new_ac = np.cumprod(1 - new_betas)
        np.testing.assert_allclose(new_ac, base_ac[tmap], rtol=1e-10)


class TestProcessMath:
    def test_q_sample_statistics(self):
        d = small_diffusion()
        x0 = jnp.ones(SHAPE) * 2.0
        t = jnp.full((SHAPE[0],), 25)
        keys = jax.random.split(KEY, 2000)
        xs = jax.vmap(
            lambda k: d.q_sample(x0, t, jax.random.normal(k, SHAPE))
        )(keys)
        mean, _, _ = d.q_mean_variance(x0, t)
        np.testing.assert_allclose(xs.mean(axis=0), mean, atol=0.1)
        expected_var = float(1 - d.alphas_cumprod[25])
        np.testing.assert_allclose(
            xs.var(axis=0), jnp.full(SHAPE, expected_var), atol=0.1
        )

    def test_eps_xstart_inverse(self):
        d = small_diffusion()
        x_t = jax.random.normal(KEY, SHAPE)
        eps = jax.random.normal(jax.random.PRNGKey(1), SHAPE)
        t = jnp.asarray([0, 10, 25, 49])
        x0 = d.predict_xstart_from_eps(x_t, t, eps)
        eps2 = d.predict_eps_from_xstart(x_t, t, x0)
        np.testing.assert_allclose(eps, eps2, atol=1e-3)

    def test_posterior_at_t0_returns_xstart(self):
        d = small_diffusion()
        x0 = jax.random.normal(KEY, SHAPE)
        x1 = jax.random.normal(jax.random.PRNGKey(1), SHAPE)
        t = jnp.zeros((SHAPE[0],), jnp.int32)
        mean, _, _ = d.q_posterior_mean_variance(x0, x1, t)
        np.testing.assert_allclose(mean, x0, atol=1e-5)

    def test_masked_l2(self):
        d = small_diffusion()
        a = jnp.ones(SHAPE)
        b = jnp.zeros(SHAPE)
        mask = jnp.ones((SHAPE[0], 1, 1, SHAPE[3]), bool)
        mask = mask.at[:, :, :, 4:].set(False)  # half the frames valid
        out = GaussianDiffusion.masked_l2(a, b, mask)
        np.testing.assert_allclose(out, jnp.ones(SHAPE[0]), atol=1e-6)

    def test_model_t_respacing_map(self):
        d = create_diffusion(steps=100, timestep_respacing="ddim10")
        assert d.num_timesteps == 10
        ts = d.model_t(jnp.arange(10))
        # mapped ids must be strictly increasing original timesteps
        assert bool(jnp.all(ts[1:] > ts[:-1]))
        assert int(ts[0]) == 0


def perfect_model(x_true):
    """A denoiser that always predicts the true x_start."""

    def model_fn(x, t, cond):
        return jnp.broadcast_to(x_true, x.shape)

    return model_fn


class TestSamplers:
    def test_ddpm_loop_recovers_xstart_with_perfect_model(self):
        d = small_diffusion(steps=20)
        x_true = jax.random.normal(KEY, SHAPE)
        out = sampling.p_sample_loop(
            d, perfect_model(x_true), SHAPE, jax.random.PRNGKey(5), cond=None
        )
        np.testing.assert_allclose(out, x_true, atol=1e-4)

    def test_ddim_loop_recovers_xstart_with_perfect_model(self):
        d = small_diffusion(steps=20)
        x_true = jax.random.normal(KEY, SHAPE)
        out = sampling.ddim_sample_loop(
            d, perfect_model(x_true), SHAPE, jax.random.PRNGKey(5), cond=None
        )
        np.testing.assert_allclose(out, x_true, atol=1e-4)

    def test_plms_loop_recovers_xstart_with_perfect_model(self):
        d = small_diffusion(steps=20)
        x_true = jax.random.normal(KEY, SHAPE)
        for order in (1, 2, 4):
            out = sampling.plms_sample_loop(
                d,
                perfect_model(x_true),
                SHAPE,
                jax.random.PRNGKey(5),
                cond=None,
                order=order,
            )
            np.testing.assert_allclose(out, x_true, atol=1e-3)

    def test_dpmpp_loop_recovers_xstart_with_perfect_model(self):
        d = small_diffusion(steps=20)
        x_true = jax.random.normal(KEY, SHAPE)
        out = sampling.dpmpp_sample_loop(
            d, perfect_model(x_true), SHAPE, jax.random.PRNGKey(5), cond=None
        )
        np.testing.assert_allclose(out, x_true, atol=1e-3)

    def test_dpmpp_order1_equals_ddim(self):
        """First-order DPM-Solver++ (data prediction) IS DDIM(eta=0):
        alpha_prev*(1 - e^{-h}) == alpha_prev - alpha_t*sigma_prev/sigma_t.
        The implementations must agree step-for-step."""
        d = small_diffusion(steps=40, timestep_respacing="8")

        def model(x, t, c):
            return jnp.tanh(x) * 0.4  # smooth, imperfect x0 predictor

        noise = jax.random.normal(jax.random.PRNGKey(3), SHAPE)
        a = sampling.dpmpp_sample_loop(
            d, model, SHAPE, jax.random.PRNGKey(5), cond=None,
            noise=noise, order=1,
        )
        b = sampling.ddim_sample_loop(
            d, model, SHAPE, jax.random.PRNGKey(5), cond=None, noise=noise
        )
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)

    def test_dpmpp_2m_beats_ddim_at_few_steps(self):
        """The point of the second-order solver: at a low step count it
        tracks the probability-flow ODE (approximated by many-step DDIM)
        closer than DDIM at the same step count."""
        def model(x, t, c):
            return jnp.tanh(x) * 0.4

        noise = jax.random.normal(jax.random.PRNGKey(3), SHAPE)
        truth = sampling.ddim_sample_loop(
            small_diffusion(steps=400), model, SHAPE,
            jax.random.PRNGKey(5), cond=None, noise=noise,
        )
        d_few = small_diffusion(steps=400, timestep_respacing="8")
        ddim_few = sampling.ddim_sample_loop(
            d_few, model, SHAPE, jax.random.PRNGKey(5), cond=None,
            noise=noise,
        )
        dpmpp_few = sampling.dpmpp_sample_loop(
            d_few, model, SHAPE, jax.random.PRNGKey(5), cond=None,
            noise=noise,
        )
        err_ddim = float(jnp.max(jnp.abs(ddim_few - truth)))
        err_dpmpp = float(jnp.max(jnp.abs(dpmpp_few - truth)))
        assert err_dpmpp < err_ddim, (err_dpmpp, err_ddim)

    def test_dpmpp_bf16_model_output(self):
        """A bf16-compute model returns pred_xstart in bf16; the solver
        state must stay f32 (regression: the scan carry dtype mismatched
        on the production bf16 fast path)."""
        d = small_diffusion(steps=8)

        def model(x, t, c):
            return (jnp.tanh(x) * 0.4).astype(jnp.bfloat16)

        out = sampling.dpmpp_sample_loop(d, model, SHAPE, KEY, cond=None)
        assert out.dtype == jnp.float32
        assert np.isfinite(np.asarray(out)).all()

    def test_dpmpp_invalid_order_raises(self):
        d = small_diffusion(steps=8)
        with pytest.raises(ValueError):
            sampling.dpmpp_sample_loop(
                d, lambda x, t, c: x, SHAPE, KEY, cond=None, order=3
            )

    def test_logsnr_spacing_improves_low_step_error(self):
        """logsnr respacing places steps uniform in λ — at 8 steps both
        DDIM and DPM-Solver++ land measurably closer to the many-step
        ODE limit than with the uniform timestep stride."""
        def model(x, t, c):
            return jnp.tanh(x) * 0.4

        noise = jax.random.normal(jax.random.PRNGKey(3), SHAPE)
        truth = sampling.ddim_sample_loop(
            small_diffusion(steps=400), model, SHAPE,
            jax.random.PRNGKey(5), cond=None, noise=noise,
        )

        def err(resp, loop):
            d = small_diffusion(steps=400, timestep_respacing=resp)
            out = loop(d, model, SHAPE, jax.random.PRNGKey(5), cond=None,
                       noise=noise)
            return float(jnp.max(jnp.abs(out - truth)))

        for loop in (sampling.ddim_sample_loop, sampling.dpmpp_sample_loop):
            assert err("logsnr8", loop) < err("8", loop)

    def test_logsnr_spacing_validation(self):
        with pytest.raises(ValueError, match="betas"):
            schedules.space_timesteps(100, "logsnr8")  # no betas passed
        betas = schedules.get_named_beta_schedule("cosine", 100)
        with pytest.raises(ValueError, match="not in"):
            schedules.space_timesteps(100, "logsnr1", betas=betas)
        keep = schedules.space_timesteps(100, "logsnr10", betas=betas)
        assert len(keep) == 10
        assert 0 in keep and 99 in keep  # endpoints always kept

    def test_ddim_eta0_deterministic(self):
        d = small_diffusion(steps=10)
        x_true = jax.random.normal(KEY, SHAPE)
        noise = jax.random.normal(jax.random.PRNGKey(2), SHAPE)
        a = sampling.ddim_sample_loop(
            d, perfect_model(x_true), SHAPE, jax.random.PRNGKey(1), None, noise=noise
        )
        b = sampling.ddim_sample_loop(
            d, perfect_model(x_true), SHAPE, jax.random.PRNGKey(99), None, noise=noise
        )
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_inpainting_imputation(self):
        """Masked regions must be exactly the provided motion in the output."""
        d = small_diffusion(steps=10)
        gt = jax.random.normal(KEY, SHAPE)
        mask = jnp.zeros(SHAPE, bool).at[:, :, :, :4].set(True)

        def noisy_model(x, t, cond):
            return jnp.zeros_like(x)

        out = sampling.p_sample_loop(
            d,
            noisy_model,
            SHAPE,
            jax.random.PRNGKey(3),
            None,
            inpaint=(mask, gt),
        )
        np.testing.assert_allclose(
            jnp.where(mask, out, 0.0), jnp.where(mask, gt, 0.0), atol=1e-5
        )

    @pytest.mark.parametrize(
        "loop",
        [sampling.ddim_sample_loop, sampling.plms_sample_loop,
         sampling.dpmpp_sample_loop],
        ids=["ddim", "plms", "dpmpp"],
    )
    def test_inpainting_imputation_all_samplers(self, loop):
        """The edit surface (sample/edit.py) relies on inpaint flowing
        through p_mean_variance in EVERY sampler, not just DDPM."""
        d = small_diffusion(steps=10)
        gt = jax.random.normal(KEY, SHAPE)
        mask = jnp.zeros(SHAPE, bool).at[:, :, :, :4].set(True)

        out = loop(
            d, lambda x, t, c: jnp.zeros_like(x), SHAPE,
            jax.random.PRNGKey(3), None, inpaint=(mask, gt),
        )
        np.testing.assert_allclose(
            jnp.where(mask, out, 0.0), jnp.where(mask, gt, 0.0), atol=1e-4
        )

    def test_const_noise_gives_identical_samples(self):
        d = small_diffusion(steps=10)

        def zero_model(x, t, cond):
            return jnp.zeros_like(x)

        noise = jnp.broadcast_to(jax.random.normal(KEY, SHAPE[1:]), SHAPE)
        out = sampling.p_sample_loop(
            d, zero_model, SHAPE, jax.random.PRNGKey(4), None,
            noise=noise, const_noise=True,
        )
        for b in range(1, SHAPE[0]):
            np.testing.assert_allclose(out[0], out[b], atol=1e-6)

    def test_skip_timesteps_partial_noising(self):
        d = small_diffusion(steps=20)
        init = jax.random.normal(KEY, SHAPE)
        out = sampling.p_sample_loop(
            d,
            perfect_model(init),
            SHAPE,
            jax.random.PRNGKey(6),
            None,
            skip_timesteps=15,
            init_image=init,
        )
        np.testing.assert_allclose(out, init, atol=1e-4)

    def test_return_intermediates(self):
        d = small_diffusion(steps=10)
        x_true = jax.random.normal(KEY, SHAPE)
        final, inter = sampling.p_sample_loop(
            d, perfect_model(x_true), SHAPE, jax.random.PRNGKey(7), None,
            return_intermediates=True,
        )
        assert inter.shape == (10,) + SHAPE
        np.testing.assert_allclose(inter[-1], final, atol=1e-6)

    def test_sampler_loops_jit(self):
        d = small_diffusion(steps=10)
        x_true = jax.random.normal(KEY, SHAPE)
        f = jax.jit(
            lambda rng: sampling.ddim_sample_loop(
                d, perfect_model(x_true), SHAPE, rng, None
            )
        )
        np.testing.assert_allclose(f(jax.random.PRNGKey(1)), x_true, atol=1e-4)


class TestAutoregressiveScan:
    """On-device chunked AR generation (one outer lax.scan over chunks)."""

    @staticmethod
    def _seeded_model():
        # denoiser whose prediction depends on the seed cond so the AR
        # hand-off is observable
        def model_fn(x, t, cond):
            seed_mean = jnp.mean(cond["seed"], axis=-1, keepdims=True)
            return jnp.broadcast_to(seed_mean, x.shape) + 0.1 * cond[
                "mfcc"
            ].mean(axis=1, keepdims=True)

        return model_fn

    def test_scan_matches_host_loop(self):
        d = small_diffusion(steps=10)
        B, J, T, S, C = 3, 6, 8, 2, 4
        shape = (B, J, 1, T)
        rng = jax.random.PRNGKey(7)
        rs = np.random.RandomState(0)
        chunk_conds = {
            "mfcc": jnp.asarray(rs.randn(C, B, J, 1, T), jnp.float32),
        }
        init_seed = jnp.asarray(rs.randn(B, J, 1, S), jnp.float32)
        model_fn = self._seeded_model()

        scan_out = jax.jit(
            lambda r, cc, s0: sampling.autoregressive_sample_loop(
                d, model_fn, shape, r, cc, s0, S
            )
        )(rng, chunk_conds, init_seed)
        assert scan_out.shape == (C, B, J, 1, T)

        # host-side replication of the same semantics
        seed = init_seed
        for k in range(C):
            chunk_rng = jax.random.fold_in(rng, k)
            cond = {"mfcc": chunk_conds["mfcc"][k], "seed": seed}
            out = sampling.p_sample_loop(
                d, model_fn, shape, chunk_rng, cond, clip_denoised=False
            )
            np.testing.assert_allclose(
                np.asarray(scan_out[k]), np.asarray(out), atol=1e-5
            )
            seed = out[..., -S:]

    def test_seed_handoff_changes_chunks(self):
        d = small_diffusion(steps=10)
        B, J, T, S, C = 2, 4, 8, 2, 3
        shape = (B, J, 1, T)
        rs = np.random.RandomState(1)
        chunk_conds = {
            "mfcc": jnp.asarray(
                np.broadcast_to(
                    rs.randn(1, B, J, 1, T), (C, B, J, 1, T)
                ).copy(),
                jnp.float32,
            ),
        }
        init_seed = jnp.asarray(rs.randn(B, J, 1, S) * 5, jnp.float32)
        out = sampling.autoregressive_sample_loop(
            d, self._seeded_model(), shape, jax.random.PRNGKey(3),
            chunk_conds, init_seed, S,
        )
        # identical per-chunk conditioning, but chunk 1 sees chunk 0's tail
        # as seed — outputs must differ
        assert float(jnp.abs(out[0] - out[1]).max()) > 1e-3


class TestTrainingLosses:
    def test_mse_loss_shape_and_value(self):
        d = small_diffusion(steps=20)
        x0 = jax.random.normal(KEY, SHAPE)
        t = jnp.asarray([0, 5, 10, 19])
        mask = jnp.ones((SHAPE[0], 1, 1, SHAPE[3]), bool)
        noise = jax.random.normal(jax.random.PRNGKey(1), SHAPE)

        terms = d.training_losses(
            perfect_model(x0), x0, t, None, mask=mask, noise=noise
        )
        assert terms["loss"].shape == (SHAPE[0],)
        np.testing.assert_allclose(terms["loss"], 0.0, atol=1e-8)

    def test_vel_loss(self):
        d = small_diffusion(steps=20, lambda_vel=1.0)
        x0 = jax.random.normal(KEY, SHAPE)
        t = jnp.asarray([3, 5, 10, 19])
        mask = jnp.ones((SHAPE[0], 1, 1, SHAPE[3]), bool)
        noise = jax.random.normal(jax.random.PRNGKey(1), SHAPE)

        def biased_model(x, tt, cond):
            # constant output -> zero velocity; loss must be positive
            return jnp.zeros_like(x)

        terms = d.training_losses(biased_model, x0, t, None, mask=mask, noise=noise)
        assert "vel_mse" in terms
        assert bool(jnp.all(terms["loss"] > 0))

    def test_geometric_losses_with_fk(self):
        d = small_diffusion(steps=20, lambda_rcxyz=1.0, lambda_fc=1.0)
        x0 = jax.random.normal(KEY, (4, 24, 6, 8))  # rot6d per joint
        t = jnp.asarray([3, 5, 10, 19])
        mask = jnp.ones((4, 1, 1, 8), bool)
        noise = jax.random.normal(jax.random.PRNGKey(1), (4, 24, 6, 8))

        def fake_fk(sample):
            # stand-in FK: just a fixed linear map to [B, 24, 3, T]
            return sample[:, :, :3, :] * 0.5

        terms = d.training_losses(
            perfect_model(x0), x0, t, None, mask=mask, noise=noise, fk_fn=fake_fk
        )
        assert "rcxyz_mse" in terms and "fc" in terms
        np.testing.assert_allclose(terms["loss"], 0.0, atol=1e-8)


class TestResamplers:
    def test_uniform_sampler(self):
        s = UniformSampler(num_timesteps=100)
        t, w = s.sample(KEY, 512)
        assert t.shape == (512,) and w.shape == (512,)
        assert int(t.min()) >= 0 and int(t.max()) < 100
        np.testing.assert_allclose(w, 1.0)

    def test_loss_aware_starts_uniform(self):
        s = LossSecondMomentState.create(10)
        np.testing.assert_allclose(s.weights(), 0.1)

    def test_loss_aware_update_and_warmup(self):
        s = LossSecondMomentState.create(4, history_per_term=2)
        ts = jnp.asarray([0, 0, 1, 1, 2, 2, 3, 3])
        losses = jnp.asarray([1.0, 1.0, 2.0, 2.0, 3.0, 3.0, 4.0, 4.0])
        s = s.update_with_losses(ts, losses)
        assert bool(s.warmed_up())
        w = s.weights()
        # heavier losses -> larger weights
        assert float(w[3]) > float(w[0])
        np.testing.assert_allclose(w.sum(), 1.0, atol=1e-5)

    def test_loss_aware_ring_shift(self):
        s = LossSecondMomentState.create(2, history_per_term=2)
        s = s.update_with_losses(jnp.asarray([0, 0, 0]), jnp.asarray([1.0, 2.0, 3.0]))
        np.testing.assert_allclose(s.history[0], jnp.asarray([2.0, 3.0]))
        assert int(s.counts[0]) == 2

    def test_loss_aware_inside_jit(self):
        s = LossSecondMomentState.create(8, history_per_term=2)

        @jax.jit
        def step(state, ts, losses):
            return state.update_with_losses(ts, losses)

        s2 = step(s, jnp.asarray([1, 1]), jnp.asarray([0.5, 0.7]))
        assert int(s2.counts[1]) == 2


class TestReviewFixesRound3c:
    """Regressions from the diffusion-package review (round 3)."""

    def test_all_zero_mask_row_is_finite(self):
        """A fully-padded sample (all-zero mask row) must contribute
        loss 0, not 0/0=NaN poisoning the batch mean."""
        d = small_diffusion(steps=20)
        x0 = jax.random.normal(KEY, SHAPE)
        t = jnp.asarray([3, 5, 10, 19])
        mask = jnp.ones((SHAPE[0], 1, 1, SHAPE[3]), bool)
        mask = mask.at[1].set(False)
        noise = jax.random.normal(jax.random.PRNGKey(1), SHAPE)

        def model(x, tt, cond):
            return jnp.zeros_like(x)

        terms = d.training_losses(model, x0, t, None, mask=mask, noise=noise)
        assert np.isfinite(np.asarray(terms["loss"])).all()
        assert float(terms["loss"][1]) == 0.0
        assert float(terms["loss"][0]) > 0.0

    def test_one_step_chain_constructs_and_samples(self):
        """--sample_steps 1 (respacing '1') used to IndexError building
        the posterior tables; a 1-step DDIM must run."""
        d = create_diffusion(
            steps=100, model_mean_type=ModelMeanType.START_X,
            timestep_respacing="1",
        )
        assert d.num_timesteps == 1
        x0 = jax.random.normal(KEY, SHAPE)
        out = sampling.ddim_sample_loop(
            d, perfect_model(x0), SHAPE, KEY, None
        )
        assert np.isfinite(np.asarray(out)).all()

    def test_non_f32_noise_accepted(self):
        """Caller-provided bf16 noise must not type-clash the scan
        carry (every body emits f32)."""
        d = small_diffusion(steps=8)
        x0 = jax.random.normal(KEY, SHAPE)
        noise = jax.random.normal(KEY, SHAPE, jnp.bfloat16)
        for loop in (sampling.p_sample_loop, sampling.ddim_sample_loop,
                     sampling.dpmpp_sample_loop):
            out = loop(d, perfect_model(x0), SHAPE, KEY, None, noise=noise)
            assert out.dtype == jnp.float32
            assert np.isfinite(np.asarray(out)).all()

    def test_inpaint_with_learned_range_variance(self):
        """Imputation must run on the mean channels, i.e. AFTER the
        learned-variance split (used to shape-clash at trace time)."""
        d = create_diffusion(
            steps=10, model_mean_type=ModelMeanType.START_X,
            model_var_type=ModelVarType.LEARNED_RANGE,
        )
        B, J, F, T = SHAPE
        gt = jax.random.normal(KEY, SHAPE)
        inp_mask = jnp.zeros((B, 1, 1, T), bool).at[..., : T // 2].set(True)

        def model2c(x, tt, cond):  # mean + var channels
            return jnp.concatenate([gt, jnp.zeros_like(x)], axis=1)

        out = d.p_mean_variance(
            model2c, jax.random.normal(KEY, SHAPE),
            jnp.zeros((B,), jnp.int32), None, inpaint=(inp_mask, gt),
        )
        np.testing.assert_allclose(
            np.asarray(out["pred_xstart"][..., : T // 2]),
            np.asarray(gt[..., : T // 2]), rtol=1e-6,
        )

    def test_vel_rcxyz_reported_but_not_in_loss(self):
        """Reference parity: gaussian_diffusion.py:1345-1348 omits
        vel_xyz_mse from the loss sum; so do we — pin that."""
        def fk(x):
            return x[:, :3]

        kw = dict(model_mean_type=ModelMeanType.START_X)
        d0 = create_diffusion(steps=20, **kw)
        d1 = create_diffusion(steps=20, lambda_vel_rcxyz=5.0, **kw)
        x0 = jax.random.normal(KEY, SHAPE)
        t = jnp.asarray([3, 5, 10, 19])
        mask = jnp.ones((SHAPE[0], 1, 1, SHAPE[3]), bool)
        noise = jax.random.normal(jax.random.PRNGKey(1), SHAPE)

        def model(x, tt, cond):
            return x * 0.9

        t0 = d0.training_losses(model, x0, t, None, mask=mask, noise=noise)
        t1 = d1.training_losses(
            model, x0, t, None, mask=mask, noise=noise, fk_fn=fk
        )
        assert "vel_xyz_mse" in t1 and "vel_xyz_mse" not in t0
        np.testing.assert_allclose(
            np.asarray(t0["loss"]), np.asarray(t1["loss"]), rtol=1e-6
        )
