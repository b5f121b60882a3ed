"""Evaluator-stack training (eval/trainers.py): the reference's
DecompTrainerV3 / LengthEstTrainer / TextMotionMatchTrainer *training*
paths, re-built as jitted TPU steps (reference:
data_loaders/humanml/networks/trainers.py:25,748,879)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gesturediffusion_tpu.eval.comp_v6 import (
    MotionLenEstimatorBiGRU,
    MovementConvDecoder,
)
from gesturediffusion_tpu.eval.networks import (
    MotionEncoderBiGRUCo,
    MovementConvEncoder,
    TextEncoderBiGRUCo,
)
from gesturediffusion_tpu.eval.trainers import (
    contrastive_loss,
    fit,
    make_decomp_trainer,
    make_length_est_trainer,
    make_text_motion_match_trainer,
)

B, T, DP = 4, 16, 23  # dim_pose (motions carry 4 trailing foot-contact dims)
RS = np.random.RandomState(0)


class TestContrastiveLoss:
    def test_golden_vs_torch_formula(self):
        import torch
        import torch.nn.functional as F

        e1 = RS.randn(6, 8).astype(np.float32)
        e2 = RS.randn(6, 8).astype(np.float32)
        for label_np in (np.zeros(6), np.ones(6),
                         np.asarray([0, 1, 0, 1, 1, 0])):
            margin = 3.0
            # reference: modules.py:11-24
            d = F.pairwise_distance(
                torch.from_numpy(e1), torch.from_numpy(e2), keepdim=True
            )
            lab = torch.from_numpy(label_np.astype(np.float32))[:, None]
            want = torch.mean(
                (1 - lab) * d.pow(2)
                + lab * torch.clamp(margin - d, min=0.0).pow(2)
            ).item()
            got = float(contrastive_loss(
                jnp.asarray(e1), jnp.asarray(e2),
                jnp.asarray(label_np, jnp.float32), margin,
            ))
            assert got == pytest.approx(want, rel=1e-4)


def _snippet_len(t):
    # MovementConvEncoder downsamples 4x
    return t // 4


class TestDecompTrainer:
    def test_losses_decrease(self):
        enc = MovementConvEncoder(hidden_size=32, output_size=16)
        dec = MovementConvDecoder(hidden_size=32, output_size=DP)
        init, step = make_decomp_trainer(enc, dec, lr=1e-3,
                                         lambda_sparsity=0.001,
                                         lambda_smooth=0.001)
        motions = jnp.asarray(RS.randn(B, T, DP), jnp.float32)
        state = init(jax.random.PRNGKey(0), motions)
        _, m0 = step(state, motions)
        state, _ = step(state, motions)
        for _ in range(20):
            state, m = step(state, motions)
        assert float(m["loss"]) < float(m0["loss"])
        for key in ("loss_rec", "loss_sparsity", "loss_smooth"):
            assert np.isfinite(float(m[key]))

    def test_loss_terms_golden(self):
        """The three decomp loss terms match the reference torch math
        (trainers.py:60-67) on identical tensors."""
        import torch

        # decoder reconstructs the FULL pose (reference trainers.py:61
        # computes l1(recon_motions, motions) with a dim_pose decoder)
        enc = MovementConvEncoder(hidden_size=32, output_size=16)
        dec = MovementConvDecoder(hidden_size=32, output_size=DP)
        init, _ = make_decomp_trainer(enc, dec)
        motions_np = RS.randn(B, T, DP).astype(np.float32)
        motions = jnp.asarray(motions_np)
        state = init(jax.random.PRNGKey(1), motions)
        latents = enc.apply({"params": state.params["enc"]},
                            motions[..., :-4])
        recon = dec.apply({"params": state.params["dec"]}, latents)

        lt = torch.from_numpy(np.asarray(latents))
        rt = torch.from_numpy(np.asarray(recon))
        mt = torch.from_numpy(motions_np)
        want_rec = torch.nn.L1Loss()(rt, mt).item()
        want_sparsity = torch.mean(torch.abs(lt)).item()
        want_smooth = torch.nn.L1Loss()(lt[:, 1:], lt[:, :-1]).item()

        got_rec = float(jnp.mean(jnp.abs(recon - motions)))
        got_sparsity = float(jnp.mean(jnp.abs(latents)))
        got_smooth = float(jnp.mean(jnp.abs(latents[:, 1:] - latents[:, :-1])))
        assert got_rec == pytest.approx(want_rec, rel=1e-5)
        assert got_sparsity == pytest.approx(want_sparsity, rel=1e-5)
        assert got_smooth == pytest.approx(want_smooth, rel=1e-5)


class TestLengthEstTrainer:
    def test_learns_constant_label(self):
        est = MotionLenEstimatorBiGRU(word_size=12, pos_size=5,
                                      hidden_size=16, output_size=8)
        init, step = make_length_est_trainer(est, lr=3e-3, unit_length=4)
        word = jnp.asarray(RS.randn(B, 6, 12), jnp.float32)
        pos = jnp.asarray(RS.randn(B, 6, 5), jnp.float32)
        cap_lens = jnp.full((B,), 6, jnp.int32)
        m_lens = jnp.asarray([8, 12, 8, 12], jnp.int32)  # labels 2, 3
        state = init(jax.random.PRNGKey(0), word, pos, cap_lens)
        _, m0 = step(state, word, pos, cap_lens, m_lens)
        state, _ = step(state, word, pos, cap_lens, m_lens)
        for _ in range(30):
            state, m = step(state, word, pos, cap_lens, m_lens)
        assert float(m["loss"]) < float(m0["loss"])
        assert float(m["acc"]) == 1.0


class TestTextMotionMatchTrainer:
    def _setup(self):
        mov_enc = MovementConvEncoder(hidden_size=16, output_size=12)
        text_enc = TextEncoderBiGRUCo(word_size=12, pos_size=5,
                                      hidden_size=16, output_size=16)
        mot_enc = MotionEncoderBiGRUCo(input_size=12, hidden_size=16,
                                       output_size=16)
        motions = jnp.asarray(RS.randn(B, T, DP), jnp.float32)
        mov_params = mov_enc.init(
            jax.random.PRNGKey(9), motions[..., :-4])["params"]
        word = jnp.asarray(RS.randn(B, 6, 12), jnp.float32)
        pos = jnp.asarray(RS.randn(B, 6, 5), jnp.float32)
        cap_lens = jnp.full((B,), 6, jnp.int32)
        m_lens = jnp.full((B,), T, jnp.int32)
        return (mov_enc, text_enc, mot_enc, mov_params, word, pos,
                cap_lens, motions, m_lens)

    def test_loss_decreases_and_movement_frozen(self):
        (mov_enc, text_enc, mot_enc, mov_params, word, pos, cap_lens,
         motions, m_lens) = self._setup()
        init, step, val = make_text_motion_match_trainer(
            text_enc, mot_enc, mov_enc, mov_params, lr=3e-3,
            negative_margin=10.0,
        )
        state = init(jax.random.PRNGKey(0), word, pos, cap_lens, motions,
                     m_lens)
        mov_before = jax.tree_util.tree_map(np.asarray, mov_params)
        rng = jax.random.PRNGKey(1)
        _, m0 = step(state, rng, word, pos, cap_lens, motions, m_lens)
        for i in range(25):
            rng, srng = jax.random.split(rng)
            state, m = step(state, srng, word, pos, cap_lens, motions,
                            m_lens)
        assert float(m["loss"]) < float(m0["loss"])
        # the movement encoder is frozen (stop_gradient + not in params)
        assert "movement" not in state.params
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
            mov_params, mov_before,
        )
        vm = val(state, word, pos, cap_lens, motions, m_lens)
        assert np.isfinite(float(vm["loss"]))

    def test_retrained_params_drive_evaluator_wrapper(self):
        """Regenerated params slot straight into EvaluatorWrapper
        (the point of porting the training paths)."""
        from gesturediffusion_tpu.eval.evaluator_wrapper import (
            EvaluatorWrapper,
        )

        (mov_enc, text_enc, mot_enc, mov_params, word, pos, cap_lens,
         motions, m_lens) = self._setup()
        init, step, _ = make_text_motion_match_trainer(
            text_enc, mot_enc, mov_enc, mov_params
        )
        state = init(jax.random.PRNGKey(0), word, pos, cap_lens, motions,
                     m_lens)
        state, _ = fit(
            step,
            state,
            [(jax.random.PRNGKey(i), word, pos, cap_lens, motions, m_lens)
             for i in range(3)],
        )
        # wrapper with custom dims matching the tiny trainer setup
        ev = EvaluatorWrapper.__new__(EvaluatorWrapper)
        ev.dataset_name = "tiny"
        ev.dim_pose = DP
        ev.text_encoder, ev.motion_encoder = text_enc, mot_enc
        ev.movement_encoder = mov_enc
        ev.params = {"text": state.params["text"],
                     "motion": state.params["motion"],
                     "movement": mov_params}
        ev._jit_text = jax.jit(
            lambda w, p, l: ev.text_encoder.apply(
                {"params": ev.params["text"]}, w, p, l)
        )
        ev._jit_motion = jax.jit(ev._motion_embed)
        t_emb, m_emb = ev.get_co_embeddings(
            np.asarray(word), np.asarray(pos), np.asarray(cap_lens),
            np.asarray(motions), np.asarray(m_lens),
        )
        assert np.all(np.isfinite(t_emb)) and np.all(np.isfinite(m_emb))
