"""Model tests: local attention parity, MDM forward contracts, CFG."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gesturediffusion_tpu.models.cfg import classifier_free_guidance
from gesturediffusion_tpu.models.mdm import MDM
from gesturediffusion_tpu.models.mdm_old import MDMOld
from gesturediffusion_tpu.models.mdm_t2m import MotionMDM
from gesturediffusion_tpu.ops.local_attention import local_attention

KEY = jax.random.PRNGKey(0)


def naive_banded_attention(q, k, v, window, causal=True, look_backward=1):
    """Independent oracle: full T x T attention with the band mask."""
    b, h, t, d = q.shape
    i = np.arange(t)[:, None]
    j = np.arange(t)[None, :]
    wi, wj = i // window, j // window
    allowed = (wi - wj >= 0) & (wi - wj <= look_backward)
    if causal:
        allowed &= j <= i
    sim = jnp.einsum("bhid,bhjd->bhij", q, k) * (d**-0.5)
    sim = jnp.where(jnp.asarray(allowed), sim, -jnp.finfo(jnp.float32).max)
    attn = jax.nn.softmax(sim, axis=-1)
    return jnp.einsum("bhij,bhjd->bhid", attn, v)


class TestLocalAttention:
    def test_matches_naive_band_oracle(self):
        b, h, t, d = 2, 8, 80, 32
        qkv = jax.random.normal(KEY, (3, b, h, t, d))
        q, k, v = qkv[0], qkv[1], qkv[2]
        ours = local_attention(q, k, v, window_size=10)
        oracle = naive_banded_attention(q, k, v, window=10)
        np.testing.assert_allclose(ours, oracle, atol=2e-5)

    def test_respects_padding_mask(self):
        b, h, t, d = 2, 4, 40, 16
        qkv = jax.random.normal(KEY, (3, b, h, t, d))
        q, k, v = qkv[0], qkv[1], qkv[2]
        mask = jnp.ones((b, t), bool).at[:, 30:].set(False)
        out_masked = local_attention(q, k, v, window_size=10, mask=mask)
        # queries before frame 21 never see frames >= 30 (band limit),
        # so their outputs are identical with/without the mask
        out_full = local_attention(q, k, v, window_size=10)
        np.testing.assert_allclose(
            out_masked[:, :, :20], out_full[:, :, :20], atol=1e-6
        )
        assert bool(jnp.all(jnp.isfinite(out_masked)))

    def test_rejects_bad_length(self):
        q = jnp.zeros((1, 1, 37, 8))
        with pytest.raises(ValueError):
            local_attention(q, q, q, window_size=10)

    @pytest.mark.skipif(
        not os.path.exists("/root/reference/model/local_attention.py"),
        reason="reference not mounted",
    )
    def test_golden_vs_reference_torch(self):
        import importlib.util

        import torch

        spec = importlib.util.spec_from_file_location(
            "ref_la", "/root/reference/model/local_attention.py"
        )
        ref = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref)

        b, h, t, d = 2, 8, 80, 32
        rs = np.random.RandomState(0)
        x = rs.randn(b * h, t, d).astype(np.float32)

        mod = ref.LocalAttention(
            window_size=10, causal=True, look_backward=1, look_forward=0,
            dropout=0.0, exact_windowsize=False,
        )
        mod.eval()
        with torch.no_grad():
            tq = torch.from_numpy(x)
            out_ref = mod(
                tq, tq, tq,
                packed_shape=[torch.Size([b, h])],
                mask=torch.ones(b, t).bool(),
            ).numpy()

        xj = jnp.asarray(x.reshape(b, h, t, d))
        out_ours = np.asarray(local_attention(xj, xj, xj, window_size=10))
        np.testing.assert_allclose(out_ours, out_ref, atol=2e-5)


def gesture_cond(bs, t, njoints=48, mfcc_dim=26, seed_poses=4, clip_dim=512,
                 with_text=False):
    cond = {
        "mfcc": jax.random.normal(jax.random.PRNGKey(10), (bs, mfcc_dim, 1, t)),
        "seed": jax.random.normal(jax.random.PRNGKey(11), (bs, njoints, 1, seed_poses)),
    }
    if with_text:
        cond["text_emb"] = jax.random.normal(jax.random.PRNGKey(12), (bs, clip_dim))
    return cond


class TestMDM:
    BS, J, T = 2, 48, 20

    def _model(self, **kw):
        kw.setdefault("njoints", self.J)
        kw.setdefault("latent_dim", 64)
        kw.setdefault("num_layers", 2)
        kw.setdefault("ff_size", 128)
        kw.setdefault("seed_poses", 4)
        kw.setdefault("window_size", 10)
        return MDM(**kw)

    def test_forward_shape(self):
        m = self._model()
        x = jax.random.normal(KEY, (self.BS, self.J, 1, self.T))
        t = jnp.asarray([3, 7])
        cond = gesture_cond(self.BS, self.T, self.J, seed_poses=4)
        params = m.init(jax.random.PRNGKey(0), x, t, cond)
        out = m.apply(params, x, t, cond)
        assert out.shape == x.shape
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_forward_with_text(self):
        m = self._model(use_text=True, text_dim=16)
        x = jax.random.normal(KEY, (self.BS, self.J, 1, self.T))
        t = jnp.asarray([3, 7])
        cond = gesture_cond(self.BS, self.T, self.J, seed_poses=4, with_text=True)
        params = m.init(jax.random.PRNGKey(0), x, t, cond)
        out = m.apply(params, x, t, cond)
        assert out.shape == x.shape

    def test_uncond_equals_zeroed_cond(self):
        """Per-sample uncond flag must equal zeroing the conditioning."""
        m = self._model()
        x = jax.random.normal(KEY, (self.BS, self.J, 1, self.T))
        t = jnp.asarray([3, 7])
        cond = gesture_cond(self.BS, self.T, self.J, seed_poses=4)
        params = m.init(jax.random.PRNGKey(0), x, t, cond)

        out_forced = m.apply(
            params, x, t, {**cond, "uncond": jnp.ones((self.BS,))}
        )
        zeroed = dict(cond)
        zeroed["seed"] = jnp.zeros_like(cond["seed"])
        out_zeroed = m.apply(params, x, t, zeroed)
        np.testing.assert_allclose(out_forced, out_zeroed, atol=1e-5)

    def test_eval_deterministic(self):
        m = self._model()
        x = jax.random.normal(KEY, (self.BS, self.J, 1, self.T))
        t = jnp.asarray([3, 7])
        cond = gesture_cond(self.BS, self.T, self.J, seed_poses=4)
        params = m.init(jax.random.PRNGKey(0), x, t, cond)
        a = m.apply(params, x, t, cond)
        b = m.apply(params, x, t, cond)
        np.testing.assert_allclose(a, b)

    def test_train_mode_cond_dropout_runs(self):
        m = self._model(cond_mask_prob=0.5, dropout=0.1)
        x = jax.random.normal(KEY, (self.BS, self.J, 1, self.T))
        t = jnp.asarray([3, 7])
        cond = gesture_cond(self.BS, self.T, self.J, seed_poses=4)
        params = m.init(jax.random.PRNGKey(0), x, t, cond)
        out = m.apply(
            params, x, t, cond, train=True,
            rngs={"dropout": jax.random.PRNGKey(1),
                  "cond_mask": jax.random.PRNGKey(2)},
        )
        assert out.shape == x.shape

    def test_jit_forward(self):
        m = self._model()
        x = jax.random.normal(KEY, (self.BS, self.J, 1, self.T))
        t = jnp.asarray([3, 7])
        cond = gesture_cond(self.BS, self.T, self.J, seed_poses=4)
        params = m.init(jax.random.PRNGKey(0), x, t, cond)
        f = jax.jit(lambda p, xx, tt, cc: m.apply(p, xx, tt, cc))
        np.testing.assert_allclose(
            f(params, x, t, cond), m.apply(params, x, t, cond), atol=1e-5
        )

    def test_remat_gradients_match(self):
        """remat=True recomputes the encoder layers in the backward pass
        with lifted (replayed) dropout RNGs — outputs AND gradients must
        match the stored-activation path exactly (--remat train knob;
        motivation: the saved activations + u32 dropout-mask bits were
        26% of the production train step's device time in copies)."""
        x = jax.random.normal(KEY, (self.BS, self.J, 1, self.T))
        t = jnp.asarray([3, 7])
        cond = gesture_cond(self.BS, self.T, self.J, seed_poses=4)
        rngs = {"dropout": jax.random.PRNGKey(1),
                "cond_mask": jax.random.PRNGKey(2)}

        grads, outs = {}, {}
        for remat in (False, True):
            m = self._model(cond_mask_prob=0.5, dropout=0.1, remat=remat)
            params = m.init(jax.random.PRNGKey(0), x, t, cond)

            def loss_fn(p, m=m):
                out = m.apply(p, x, t, cond, train=True, rngs=rngs)
                return jnp.mean(out**2), out

            (_, outs[remat]), grads[remat] = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)

        np.testing.assert_allclose(outs[True], outs[False], atol=1e-6)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5),
            grads[True], grads[False],
        )


class TestMDMOld:
    def test_forward_shape(self):
        m = MDMOld(njoints=48, latent_dim=64, num_layers=2, ff_size=128,
                   seed_poses=4)
        x = jax.random.normal(KEY, (2, 48, 1, 20))
        t = jnp.asarray([3, 7])
        cond = gesture_cond(2, 20, 48, seed_poses=4)
        params = m.init(jax.random.PRNGKey(0), x, t, cond)
        out = m.apply(params, x, t, cond)
        assert out.shape == x.shape


class TestMotionMDM:
    def test_text_mode(self):
        m = MotionMDM(njoints=263, latent_dim=64, num_layers=2, ff_size=128)
        x = jax.random.normal(KEY, (2, 263, 1, 24))
        t = jnp.asarray([3, 7])
        cond = {"text_emb": jax.random.normal(KEY, (2, 512))}
        params = m.init(jax.random.PRNGKey(0), x, t, cond)
        out = m.apply(params, x, t, cond)
        assert out.shape == x.shape

    def test_action_mode(self):
        m = MotionMDM(njoints=25, nfeats=6, latent_dim=64, num_layers=2,
                      ff_size=128, cond_mode="action", num_actions=12)
        x = jax.random.normal(KEY, (2, 25, 6, 24))
        t = jnp.asarray([3, 7])
        cond = {"action": jnp.asarray([1, 5])}
        params = m.init(jax.random.PRNGKey(0), x, t, cond)
        out = m.apply(params, x, t, cond)
        assert out.shape == x.shape

    def test_no_cond_mode(self):
        m = MotionMDM(njoints=25, nfeats=6, latent_dim=64, num_layers=2,
                      ff_size=128, cond_mode="no_cond")
        x = jax.random.normal(KEY, (2, 25, 6, 24))
        t = jnp.asarray([3, 7])
        params = m.init(jax.random.PRNGKey(0), x, t, {})
        out = m.apply(params, x, t, {})
        assert out.shape == x.shape


class TestCFG:
    def test_scale_one_returns_cond(self):
        m = MDM(njoints=48, latent_dim=64, num_layers=2, ff_size=128,
                seed_poses=4, cond_mask_prob=0.1)
        x = jax.random.normal(KEY, (2, 48, 1, 20))
        t = jnp.asarray([3, 7])
        cond = gesture_cond(2, 20, 48, seed_poses=4)
        params = m.init(jax.random.PRNGKey(0), x, t, cond)

        def model_fn(xx, tt, cc):
            return m.apply(params, xx, tt, cc)

        guided = classifier_free_guidance(model_fn, cond_mask_prob=0.1)
        out = guided(x, t, {**cond, "scale": jnp.ones((2,))})
        expected = model_fn(x, t, cond)
        np.testing.assert_allclose(out, expected, atol=1e-5)

    def test_guidance_interpolates(self):
        m = MDM(njoints=48, latent_dim=64, num_layers=2, ff_size=128,
                seed_poses=4, cond_mask_prob=0.1)
        x = jax.random.normal(KEY, (2, 48, 1, 20))
        t = jnp.asarray([3, 7])
        cond = gesture_cond(2, 20, 48, seed_poses=4)
        params = m.init(jax.random.PRNGKey(0), x, t, cond)

        def model_fn(xx, tt, cc):
            return m.apply(params, xx, tt, cc)

        out_c = model_fn(x, t, cond)
        out_u = model_fn(x, t, {**cond, "uncond": jnp.ones((2,))})
        guided = classifier_free_guidance(model_fn, cond_mask_prob=0.1)
        out = guided(x, t, {**cond, "scale": jnp.full((2,), 2.5)})
        np.testing.assert_allclose(
            out, out_u + 2.5 * (out_c - out_u), atol=1e-4
        )

    def test_requires_cond_dropout(self):
        with pytest.raises(AssertionError):
            classifier_free_guidance(lambda x, t, c: x, cond_mask_prob=0.0)


class TestReviewFixesRound3e:
    """Regressions from the models-package review (round 3)."""

    def test_action_uncond_is_truly_unconditional(self):
        """CFG uncond branch must be independent of the action id: the
        reference masks AFTER the embedding lookup (model/mdm.py EmbedAction),
        so Dense bias must not leak through."""
        from gesturediffusion_tpu.models.mdm_t2m import MotionMDM

        model = MotionMDM(njoints=8, latent_dim=32, num_layers=1,
                          ff_size=64, cond_mode="action", num_actions=5,
                          cond_mask_prob=0.1)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 1, 6))
        t = jnp.asarray([1, 2])
        uncond = jnp.ones((2,), jnp.float32)
        c0 = {"action": jnp.asarray([0, 0]), "uncond": uncond}
        c3 = {"action": jnp.asarray([3, 4]), "uncond": uncond}
        params = model.init(jax.random.PRNGKey(1), x, t, c0)
        np.testing.assert_allclose(
            np.asarray(model.apply(params, x, t, c0)),
            np.asarray(model.apply(params, x, t, c3)), rtol=1e-6,
        )

    def test_audio_feat_dim_matches_call_precedence(self):
        from gesturediffusion_tpu.models.mdm import MDM

        # both flags set: __call__ runs the MFCC branch, so the property
        # must report the MFCC width (the fastpath splits w_proj with it)
        assert MDM(mfcc_input=True, use_wav_enc=True).audio_feat_dim == 26
        assert MDM(mfcc_input=False, use_wav_enc=True).audio_feat_dim == 32
        assert MDM(mfcc_input=True, use_wav_enc=False).audio_feat_dim == 26

    def test_model_factory_rejects_ambiguous_audio_flags(self):
        from types import SimpleNamespace

        from gesturediffusion_tpu.utils.model_factory import create_model

        args = SimpleNamespace(
            dataset="genea2023", mfcc_input=True, use_wav_enc=True,
            use_text=False, seed_poses=10, latent_dim=64, layers=2,
            num_frames=20, cond_mask_prob=0.1, unconstrained=False,
            arch="trans_enc",
        )
        with pytest.raises(ValueError, match="mutually exclusive"):
            create_model(args, None)

    def test_mdm_old_bf16_runs(self):
        from gesturediffusion_tpu.models.mdm_old import MDMOld

        model = MDMOld(njoints=8, latent_dim=32, num_layers=1, ff_size=64,
                       seed_poses=2, mfcc_dim=4, dtype=jnp.bfloat16)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 1, 6))
        t = jnp.asarray([1, 2])
        cond = {"mfcc": jnp.zeros((2, 4, 1, 6)),
                "seed": jnp.zeros((2, 8, 1, 2))}
        params = model.init(jax.random.PRNGKey(1), x, t, cond)
        out = model.apply(params, x, t, cond)
        assert out.dtype == jnp.float32  # output re-cast like siblings
        assert np.isfinite(np.asarray(out)).all()
        # params stay f32
        k = jax.tree_util.tree_leaves(params)[0]
        assert k.dtype == jnp.float32
