"""Parity tests for the MDM sampling fast path (models/mdm_fastpath.py).

The fast path must match `MDM.apply(..., train=False)` exactly (f32):
same math, reassociated — composed input weights, hoisted conditioning.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gesturediffusion_tpu.models.cfg import classifier_free_guidance
from gesturediffusion_tpu.models.mdm import MDM
from gesturediffusion_tpu.models.mdm_fastpath import (
    make_fast_cfg_fn,
    make_fast_model_fn,
)

B, J, F, T, S, A, D = 3, 24, 1, 16, 4, 8, 32


def _build(use_text=False, dtype=jnp.float32):
    model = MDM(
        njoints=J, latent_dim=D, num_layers=2, ff_size=64, num_heads=4,
        seed_poses=S, cond_mask_prob=0.1, mfcc_dim=A, use_text=use_text,
        text_dim=16 if use_text else 64, window_size=5, dtype=dtype,
    )
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(B, J, F, T), jnp.float32)
    cond = {
        "mfcc": jnp.asarray(rs.randn(B, A, 1, T), jnp.float32),
        "seed": jnp.asarray(rs.randn(B, J, F, S), jnp.float32),
    }
    if use_text:
        cond["text_emb"] = jnp.asarray(rs.randn(B, 512), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), x, jnp.zeros((B,), jnp.int32), cond
    )
    t = jnp.asarray([0, 3, 7], jnp.int32)
    return model, params, x, t, cond


class TestFastPathParity:
    @pytest.mark.parametrize("use_text", [False, True])
    def test_matches_standard_forward(self, use_text):
        model, params, x, t, cond = _build(use_text)
        want = model.apply(params, x, t, cond)
        precompute, fast_fn = make_fast_model_fn(model, params)
        got = fast_fn(x, t, precompute(cond))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
        )

    def test_uncond_mask_respected(self):
        model, params, x, t, cond = _build()
        cond_u = dict(cond, uncond=jnp.asarray([0.0, 1.0, 1.0]))
        want = model.apply(params, x, t, cond_u)
        precompute, fast_fn = make_fast_model_fn(model, params)
        got = fast_fn(x, t, precompute(cond_u))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
        )

    def test_cfg_matches_wrapper(self):
        model, params, x, t, cond = _build()
        cond_s = dict(cond, scale=jnp.full((B,), 2.5, jnp.float32))
        want = classifier_free_guidance(
            lambda xx, tt, cc: model.apply(params, xx, tt, cc), 0.1
        )(x, t, cond_s)
        precompute_cfg, guided = make_fast_cfg_fn(model, params, 0.1)
        got = guided(x, t, precompute_cfg(cond_s))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
        )

    def test_fused_local_block_route_matches_standard(self):
        """use_fused_encoder routes the pre-encoder block through the
        fused kernel (interpret on CPU) — must still match MDM.apply."""
        model = MDM(
            njoints=J, latent_dim=D, num_layers=2, ff_size=64, num_heads=4,
            seed_poses=S, cond_mask_prob=0.1, mfcc_dim=A, window_size=5,
            use_fused_encoder=True,
        )
        rs = np.random.RandomState(3)
        x = jnp.asarray(rs.randn(B, J, F, T), jnp.float32)
        cond = {
            "mfcc": jnp.asarray(rs.randn(B, A, 1, T), jnp.float32),
            "seed": jnp.asarray(rs.randn(B, J, F, S), jnp.float32),
        }
        params = model.init(
            jax.random.PRNGKey(0), x, jnp.zeros((B,), jnp.int32), cond
        )
        t = jnp.asarray([0, 3, 7], jnp.int32)
        want = model.apply(params, x, t, cond)
        precompute, fast_fn = make_fast_model_fn(model, params)
        got = fast_fn(x, t, precompute(cond))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
        )

    def test_bf16_close_to_standard_bf16(self):
        model, params, x, t, cond = _build(dtype=jnp.bfloat16)
        want = np.asarray(model.apply(params, x, t, cond), np.float32)
        precompute, fast_fn = make_fast_model_fn(model, params)
        got = np.asarray(fast_fn(x, t, precompute(cond)), np.float32)
        # bf16 reassociation: allow a few ulps relative to activations
        scale = np.maximum(np.abs(want).max(), 1.0)
        assert np.max(np.abs(got - want)) / scale < 0.05

    def test_wav_enc_rejected(self):
        model = MDM(njoints=J, latent_dim=D, num_layers=1, ff_size=64,
                    seed_poses=S, cond_mask_prob=0.1,
                    mfcc_input=False, use_wav_enc=True)
        with pytest.raises(NotImplementedError, match="MFCC"):
            make_fast_model_fn(model, {"params": {}})

    def test_ar_loop_with_precompute_matches_standard(self):
        """autoregressive_sample_loop(cond_precompute=...) + fast guided fn
        must reproduce the standard CFG path bit-for-bit-close in f32."""
        from gesturediffusion_tpu.diffusion import (
            ModelMeanType,
            create_diffusion,
        )
        from gesturediffusion_tpu.diffusion.sampling import (
            autoregressive_sample_loop,
        )

        model, params, x, t, cond = _build()
        diffusion = create_diffusion(
            steps=6, model_mean_type=ModelMeanType.START_X
        )
        C = 2
        rs = np.random.RandomState(1)
        chunk_conds = {
            "mfcc": jnp.asarray(rs.randn(C, B, A, 1, T), jnp.float32),
            "scale": jnp.full((C, B), 2.5, jnp.float32),
        }
        rng = jax.random.PRNGKey(0)

        std_fn = classifier_free_guidance(
            lambda xx, tt, cc: model.apply(params, xx, tt, cc), 0.1
        )
        want = autoregressive_sample_loop(
            diffusion, std_fn, (B, J, F, T), rng, chunk_conds,
            cond["seed"], S,
        )
        precompute_cfg, guided = make_fast_cfg_fn(model, params, 0.1)
        got = autoregressive_sample_loop(
            diffusion, guided, (B, J, F, T), rng, chunk_conds,
            cond["seed"], S, cond_precompute=precompute_cfg,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=5e-4, atol=5e-4
        )

    def test_time_major_layout_matches_standard(self):
        """layout='btj' runs the identical function on [B,T,J*F] state."""
        model, params, x, t, cond = _build()
        want = np.asarray(model.apply(params, x, t, cond))  # [B,J,F,T]
        precompute, fast_fn = make_fast_model_fn(model, params,
                                                 layout="btj")
        x_tm = jnp.asarray(
            np.asarray(x).reshape(B, J * F, T).transpose(0, 2, 1)
        )
        got = np.asarray(fast_fn(x_tm, t, precompute(cond)))  # [B,T,J*F]
        np.testing.assert_allclose(
            got.transpose(0, 2, 1).reshape(B, J, F, T), want,
            rtol=2e-4, atol=2e-5,
        )

    def test_time_major_seed_flattening_matches(self):
        """precompute must flatten a [B,S,J*F] carry exactly like the
        canonical [B,J,F,S] seed (the (j,f,s) weight-row order)."""
        model, params, x, t, cond = _build()
        precompute, _ = make_fast_model_fn(model, params, layout="btj")
        seed_tm = jnp.asarray(
            np.asarray(cond["seed"]).reshape(B, J * F, S).transpose(0, 2, 1)
        )
        pc_canon = precompute(cond)["_fast"]
        pc_tm = precompute({**cond, "seed": seed_tm})["_fast"]
        np.testing.assert_allclose(
            np.asarray(pc_canon["stxt"]), np.asarray(pc_tm["stxt"]),
            rtol=1e-6,
        )

    def test_time_major_ar_loop(self):
        """AR loop with time_axis=1 carries the [B,S,J*F] seed and
        produces finite [C,B,T,J*F] chunks."""
        from gesturediffusion_tpu.diffusion import (
            ModelMeanType,
            create_diffusion,
        )
        from gesturediffusion_tpu.diffusion.sampling import (
            autoregressive_sample_loop,
        )

        model, params, x, t, cond = _build()
        diffusion = create_diffusion(
            steps=4, model_mean_type=ModelMeanType.START_X
        )
        C = 2
        rs = np.random.RandomState(1)
        chunk_conds = {
            "mfcc": jnp.asarray(rs.randn(C, B, A, 1, T), jnp.float32),
            "scale": jnp.full((C, B), 2.5, jnp.float32),
        }
        precompute_cfg, guided = make_fast_cfg_fn(model, params, 0.1,
                                                  layout="btj")
        seed_tm = jnp.asarray(
            np.asarray(cond["seed"]).reshape(B, J * F, S).transpose(0, 2, 1)
        )
        out = autoregressive_sample_loop(
            diffusion, guided, (B, T, J * F), jax.random.PRNGKey(0),
            chunk_conds, seed_tm, S, cond_precompute=precompute_cfg,
            time_axis=1,
        )
        assert out.shape == (C, B, T, J * F)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_time_axis_1_rejects_4d_shape(self):
        """time_axis=1 on a canonical 4D shape would slice the JOINT axis
        for the seed hand-off — must be rejected loudly."""
        from gesturediffusion_tpu.diffusion import (
            ModelMeanType,
            create_diffusion,
        )
        from gesturediffusion_tpu.diffusion.sampling import (
            autoregressive_sample_loop,
        )

        diffusion = create_diffusion(
            steps=2, model_mean_type=ModelMeanType.START_X
        )
        with pytest.raises(ValueError, match="time-major"):
            autoregressive_sample_loop(
                diffusion, lambda x, t, c: x, (B, J, F, T),
                jax.random.PRNGKey(0), {}, jnp.zeros((B, J, F, S)), S,
                time_axis=1,
            )

    def test_enc_block_env_validated(self, monkeypatch):
        from gesturediffusion_tpu.ops.pallas_encoder import _auto_block_b

        monkeypatch.setenv("GDT_ENC_BLOCK", "nope")
        with pytest.raises(ValueError, match="not an integer"):
            _auto_block_b(82, 88, 1024)
        monkeypatch.setenv("GDT_ENC_BLOCK", "0")
        with pytest.raises(ValueError, match=">= 1"):
            _auto_block_b(82, 88, 1024)
        monkeypatch.setenv("GDT_ENC_BLOCK", "16")
        assert _auto_block_b(82, 88, 1024) == 16

    def test_torch_checkpoint_rejects_template(self, tmp_path):
        from gesturediffusion_tpu.utils.checkpoint import load_checkpoint

        p = tmp_path / "model000000001.pt"
        p.write_bytes(b"")
        with pytest.raises(ValueError, match="requires the model"):
            load_checkpoint(str(p))
        with pytest.raises(ValueError, match="ONLY 'params'"):
            load_checkpoint(str(p), template={"x": 1}, model=object())

    def test_select_sampling_model_fn(self):
        """The shared CLI selector: fast path for gesture MDM, module
        fallback otherwise, guidance-0 clamp for uncond editing."""
        from gesturediffusion_tpu.models.mdm_fastpath import (
            select_sampling_model_fn,
        )

        model, params, x, t, cond = _build()
        # fast CFG
        pre, fn = select_sampling_model_fn(model, params, 2.5, 0.1)
        assert pre is not None
        # fast non-CFG
        pre1, fn1 = select_sampling_model_fn(model, params, 1.0, 0.1)
        assert pre1 is not None
        # opt-out -> CFG wrapper, no precompute
        pre2, fn2 = select_sampling_model_fn(model, params, 2.5, 0.1,
                                             no_fast=True)
        assert pre2 is None
        # guidance 0 with a no-dropout model: clamp lets the wrapper
        # build (pure-uncond editing); any other scale keeps the guard
        pre3, fn3 = select_sampling_model_fn(model, params, 0.0, 0.0,
                                             no_fast=True)
        assert pre3 is None and fn3 is not None
        with pytest.raises(AssertionError):
            select_sampling_model_fn(model, params, 2.5, 0.0, no_fast=True)

        # non-MDM model -> module path even without no_fast
        class NotMDM:
            def apply(self, *a):
                return None

        pre4, _ = select_sampling_model_fn(NotMDM(), params, 2.5, 0.1)
        assert pre4 is None

    def test_jit_under_scan(self):
        """fast_fn must be scan-compatible (static shapes, no host ops)."""
        model, params, x, t, cond = _build()
        precompute, fast_fn = make_fast_model_fn(model, params)
        pc = precompute(cond)

        @jax.jit
        def run(x0):
            def body(carry, i):
                tt = jnp.full((B,), i, jnp.int32)
                return fast_fn(carry, tt, pc), None

            out, _ = jax.lax.scan(body, x0, jnp.arange(4))
            return out

        out = run(x)
        assert np.all(np.isfinite(np.asarray(out)))


def _axis_id(v):
    return str(v) if not hasattr(v, "dtype") else v.__name__


class TestFastpathContract:
    """The fastpath/model contract: for EVERY MDM config-flag combination,
    make_fast_model_fn either matches model.apply or raises
    NotImplementedError — no silently-unsupported combination.  Guards
    the duplicated input math (models/mdm.py carries the matching
    cross-reference comment)."""

    AXES = [
        (use_text, audio, fused, dtype, layout)
        for use_text in (False, True)
        for audio in ("mfcc", "wav")
        for fused in (False, True)
        for dtype in ("f32", "bf16")
        for layout in ("bjft", "btj")
    ]

    @pytest.mark.parametrize(
        "use_text,audio,fused,dtype,layout", AXES,
        ids=lambda v: str(v),
    )
    def test_match_or_loud_reject(self, use_text, audio, fused, dtype,
                                  layout):
        dt = jnp.float32 if dtype == "f32" else jnp.bfloat16
        model = MDM(
            njoints=J, latent_dim=D, num_layers=2, ff_size=64, num_heads=4,
            seed_poses=S, cond_mask_prob=0.1, mfcc_dim=A,
            use_text=use_text, text_dim=16 if use_text else 64,
            window_size=5, use_fused_encoder=fused, dtype=dt,
            mfcc_input=audio == "mfcc", use_wav_enc=audio == "wav",
        )
        rs = np.random.RandomState(7)
        x = jnp.asarray(rs.randn(B, J, F, T), jnp.float32)
        cond = {"seed": jnp.asarray(rs.randn(B, J, F, S), jnp.float32)}
        if audio == "mfcc":
            cond["mfcc"] = jnp.asarray(rs.randn(B, A, 1, T), jnp.float32)
        else:
            cond["audio"] = jnp.asarray(rs.randn(B, 1600), jnp.float32)
        if use_text:
            cond["text_emb"] = jnp.asarray(rs.randn(B, 512), jnp.float32)
        t = jnp.asarray([0, 3, 7], jnp.int32)
        params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((B,),
                            jnp.int32), cond)

        try:
            precompute, fast_fn = make_fast_model_fn(model, params,
                                                     layout=layout)
        except NotImplementedError:
            assert audio == "wav", (
                f"fast path rejected a config it claims to support: "
                f"text={use_text} audio={audio} fused={fused} "
                f"dtype={dtype} layout={layout}"
            )
            return
        assert audio == "mfcc", "wav-encoder config must be rejected"

        want = np.asarray(model.apply(params, x, t, cond), np.float32)
        if layout == "btj":
            x_in = jnp.asarray(
                np.asarray(x).reshape(B, J * F, T).transpose(0, 2, 1)
            )
        else:
            x_in = x
        got = np.asarray(fast_fn(x_in, t, precompute(cond)), np.float32)
        if layout == "btj":
            got = got.transpose(0, 2, 1).reshape(B, J, F, T)
        if dtype == "f32":
            np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
        else:
            scale = np.maximum(np.abs(want).max(), 1.0)
            assert np.max(np.abs(got - want)) / scale < 0.05

    def test_single_seed_pose(self):
        """seed_poses axis: the smallest seed window still matches."""
        model = MDM(njoints=J, latent_dim=D, num_layers=1, ff_size=64,
                    num_heads=4, seed_poses=1, cond_mask_prob=0.1,
                    mfcc_dim=A, window_size=5)
        rs = np.random.RandomState(11)
        x = jnp.asarray(rs.randn(B, J, F, T), jnp.float32)
        cond = {
            "mfcc": jnp.asarray(rs.randn(B, A, 1, T), jnp.float32),
            "seed": jnp.asarray(rs.randn(B, J, F, 1), jnp.float32),
        }
        t = jnp.asarray([0, 3, 7], jnp.int32)
        params = model.init(jax.random.PRNGKey(0), x,
                            jnp.zeros((B,), jnp.int32), cond)
        want = model.apply(params, x, t, cond)
        precompute, fast_fn = make_fast_model_fn(model, params)
        got = fast_fn(x, t, precompute(cond))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-5)
