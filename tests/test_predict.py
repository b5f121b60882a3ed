"""Programmatic Predictor (sample/predict.py).

The reference Cog predictor hardcodes the humanml-encoder-512 config
(reference: sample/predict.py:31-50); ours defaults to the same but the
test overrides with a tiny MotionMDM + short chain to stay hermetic.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp
import pytest

from gesturediffusion_tpu.diffusion import ModelMeanType, create_diffusion
from gesturediffusion_tpu.models.mdm_t2m import MotionMDM
from gesturediffusion_tpu.sample.predict import Predictor

J_SKEL = 5                      # humanml codec: dim = 12*J - 1
DIM = 12 * J_SKEL - 1           # 59
T = 24


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    model = MotionMDM(
        njoints=DIM, nfeats=1, latent_dim=32, ff_size=64, num_layers=1,
        num_heads=4, cond_mode="text", cond_mask_prob=0.1,
    )
    x = jnp.zeros((2, DIM, 1, T))
    params = model.init(
        jax.random.PRNGKey(0), x, jnp.zeros((2,), jnp.int32),
        {"text_emb": jnp.zeros((2, 512))},
    )
    path = str(tmp_path_factory.mktemp("predict") / "model000000001")
    ocp.PyTreeCheckpointer().save(
        os.path.abspath(path),
        {"params": jax.tree_util.tree_map(np.asarray, params)},
    )
    return path, model


class TestPredictor:
    def _build(self, ckpt, **kw):
        path, model = ckpt
        return Predictor(
            path, model=model,
            diffusion=create_diffusion(
                steps=8, noise_schedule="cosine",
                model_mean_type=ModelMeanType.START_X,
            ),
            num_frames=T, **kw,
        )

    def test_predict_shapes_and_length(self, tiny_ckpt):
        p = self._build(tiny_ckpt)
        out = p.predict("a person walks forward", num_repetitions=2,
                        seed=0, motion_length=1.0)
        n_frames = int(1.0 * 20)  # fps-20 length rule (reference :106)
        assert out["length"] == n_frames
        assert out["motion_xyz"].shape == (2, J_SKEL, 3, n_frames)
        assert out["features"].shape == (2, n_frames, DIM)
        assert np.isfinite(out["motion_xyz"]).all()
        assert out["prompt"] == "a person walks forward"

    def test_deterministic_per_seed_and_prompt_sensitivity(self, tiny_ckpt):
        p = self._build(tiny_ckpt)
        a = p.predict("wave", num_repetitions=1, seed=3)
        b = p.predict("wave", num_repetitions=1, seed=3)
        np.testing.assert_array_equal(a["features"], b["features"])
        c = p.predict("wave", num_repetitions=1, seed=4)
        assert np.abs(a["features"] - c["features"]).max() > 1e-6

    def test_repetition_shape_cache(self, tiny_ckpt):
        """Changing num_repetitions must not reuse the first call's
        jitted shape (per-shape sampler cache)."""
        p = self._build(tiny_ckpt)
        a = p.predict("jump", num_repetitions=1, seed=0)
        b = p.predict("jump", num_repetitions=3, seed=0)
        assert a["motion_xyz"].shape[0] == 1
        assert b["motion_xyz"].shape[0] == 3

    def test_guidance_1_skips_cfg(self, tiny_ckpt):
        p = self._build(tiny_ckpt, guidance_param=1.0)
        out = p.predict("turn around", num_repetitions=1, seed=0)
        assert np.isfinite(out["motion_xyz"]).all()


class TestPredictCLI:
    def test_cli_main_writes_results(self, tiny_ckpt, tmp_path):
        """The cog-equivalent CLI surface (predict.main): results.npy +
        results.txt with the right shapes and naming."""
        from gesturediffusion_tpu.sample.predict import main

        path, model = tiny_ckpt
        out_dir = str(tmp_path / "out")
        got = main([
            "--model_path", path, "--text", "a person waves",
            "--num_repetitions", "2", "--motion_length", "1.0",
            "--seed", "3", "--output_dir", out_dir,
            "--latent_dim", "32", "--layers", "1", "--ff_size", "64",
            "--njoints", str(DIM), "--diffusion_steps", "8",
        ])
        assert got == out_dir
        results = np.load(os.path.join(out_dir, "results.npy"),
                          allow_pickle=True).item()
        assert results["motion"].shape[0] == 2          # repetitions
        assert results["motion"].shape[1] == J_SKEL      # joints
        assert np.isfinite(results["motion"]).all()
        assert results["text"] == ["a person waves"] * 2
        txt = open(os.path.join(out_dir, "results.txt")).read()
        assert txt.count("a person waves") == 2

    def test_cli_default_output_dir(self, tiny_ckpt):
        from gesturediffusion_tpu.sample.predict import main

        path, _ = tiny_ckpt
        got = main([
            "--model_path", path, "--text", "x", "--num_repetitions", "1",
            "--motion_length", "0.5", "--latent_dim", "32", "--layers",
            "1", "--ff_size", "64", "--njoints", str(DIM),
            "--diffusion_steps", "8",
        ])
        assert os.path.basename(got) == "predict_predict0_000000001_seed0"
