"""In-training benchmark eval hook (reference: training_loop.py:165-202)."""

import argparse
import os

import numpy as np
import pytest

from gesturediffusion_tpu.data.humanml import make_synthetic_humanml


@pytest.fixture(scope="module")
def hml_root(tmp_path_factory):
    # test split is ~1/3 of clips; 120 clips -> ~39 >= the protocol's
    # batch_size=32, so one eval batch exists
    return make_synthetic_humanml(
        str(tmp_path_factory.mktemp("hml")), n_clips=120, dim=67
    )


def _args(root):
    return argparse.Namespace(
        dataset="humanml", data_dir=root, eval_split="test",
        eval_num_samples=32, eval_rep_times=1, save_dir=None,
        latent_dim=32, layers=1, cond_mask_prob=0.1, unconstrained=False,
        arch="trans_enc", noise_schedule="cosine", diffusion_steps=8,
        sigma_small=True, lambda_rcxyz=0.0, lambda_vel=0.0, lambda_fc=0.0,
    )


class TestTrainingEvalHook:
    def test_full_protocol_runs_and_returns_metrics(self, hml_root,
                                                    tmp_path):
        import jax

        from gesturediffusion_tpu.eval.eval_humanml import (
            make_training_eval_fn,
        )
        from gesturediffusion_tpu.utils.model_factory import (
            create_model_and_diffusion,
        )

        args = _args(hml_root)
        args.save_dir = str(tmp_path)
        # synthetic humanml fixture uses dim 67 -> model must match
        from gesturediffusion_tpu.data.humanml import Text2MotionDatasetV2
        from gesturediffusion_tpu.data.humanml import HashVectorizer

        ds = Text2MotionDatasetV2(
            hml_root, split="test", dataset_name="t2m",
            w_vectorizer=HashVectorizer(),
        )
        from gesturediffusion_tpu.models.mdm_t2m import MotionMDM
        from gesturediffusion_tpu.utils.model_factory import (
            create_gaussian_diffusion,
        )

        model = MotionMDM(
            njoints=ds.pose_dim, latent_dim=32, num_layers=1, ff_size=64,
            cond_mode="text", cond_mask_prob=0.1,
        )
        diffusion = create_gaussian_diffusion(args)

        def text_encoder(texts):
            rs = np.random.RandomState(0)
            return rs.randn(len(texts), 512).astype(np.float32)

        eval_fn = make_training_eval_fn(
            args, model, diffusion, text_encoder=text_encoder
        )

        import jax.numpy as jnp

        x0 = jnp.zeros((2, ds.pose_dim, 1, 196))
        params = model.init(
            jax.random.PRNGKey(0), x0, jnp.zeros((2,), jnp.int32),
            {"text_emb": jnp.zeros((2, 512))},
        )

        class State:
            pass

        state = State()
        state.params = params
        state.ema_params = {}
        metrics = eval_fn(state, step=2)
        # full metric set, flattened R-precision
        assert any(k.startswith("FID") for k in metrics)
        assert any("R_precision" in k and k.endswith("top3")
                   for k in metrics)
        assert any(k.startswith("Diversity") for k in metrics)
        for k, v in metrics.items():
            assert isinstance(v, float), (k, type(v))
        assert os.path.exists(
            os.path.join(args.save_dir, "eval_humanml_000000002.log")
        )
