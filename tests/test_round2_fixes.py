"""Round-2 verdict fixes: arch rejection, OPENAI_LOG_FORMAT sinks."""

import argparse
import os

import pytest

from gesturediffusion_tpu.utils import logger as log_lib
from gesturediffusion_tpu.utils.model_factory import create_model


def _args(**kw):
    base = dict(
        dataset="humanml", arch="trans_enc", layers=2, latent_dim=32,
        cond_mask_prob=0.1, unconstrained=False, use_text=True,
        use_audio=False, mfcc_input=False, use_wav_enc=False, seed_poses=10,
    )
    base.update(kw)
    return argparse.Namespace(**base)


class TestArchRejection:
    def test_trans_dec_rejected_loudly(self):
        with pytest.raises(NotImplementedError, match="trans_dec"):
            create_model(_args(arch="trans_dec"))

    def test_gru_rejected_loudly(self):
        with pytest.raises(NotImplementedError, match="gru"):
            create_model(_args(arch="gru"))

    def test_trans_enc_builds(self):
        assert create_model(_args()) is not None


class TestLogFormatEnv:
    def test_openai_log_format_selects_sinks(self, tmp_path, monkeypatch):
        monkeypatch.setenv("OPENAI_LOG_FORMAT", "json,csv")
        monkeypatch.setenv("OPENAI_LOGDIR", str(tmp_path))
        logger = log_lib.configure()
        logger.logkv("a", 1.5)
        logger.dumpkvs()
        assert os.path.exists(tmp_path / "progress.json")
        assert os.path.exists(tmp_path / "progress.csv")
        # no stdout sink requested
        assert len(logger.output_formats) == 2

    def test_log_format_file_sink(self, tmp_path, monkeypatch):
        monkeypatch.delenv("OPENAI_LOG_FORMAT", raising=False)
        monkeypatch.delenv("OPENAI_LOGDIR", raising=False)
        logger = log_lib.configure(str(tmp_path), format_strs=["log"])
        logger.logkv("metric", 2.0)
        logger.dumpkvs()
        text = open(tmp_path / "log.txt").read()
        assert "metric" in text

    def test_default_configure_unchanged(self, tmp_path, monkeypatch):
        monkeypatch.delenv("OPENAI_LOG_FORMAT", raising=False)
        monkeypatch.delenv("OPENAI_LOGDIR", raising=False)
        logger = log_lib.configure(str(tmp_path))
        logger.logkv("x", 1.0)
        logger.dumpkvs()
        assert os.path.exists(tmp_path / "progress.json")
        assert os.path.exists(tmp_path / "progress.csv")

    def test_unknown_format_raises(self, tmp_path):
        with pytest.raises(ValueError):
            log_lib.make_output_format("bogus", str(tmp_path))


class TestReviewFixesRound2:
    def test_device_cond_keeps_numeric_lists(self):
        from gesturediffusion_tpu.data.collate import device_cond

        cond = {
            "lengths": [80, 80, 60],
            "text": ["a", "b"],
            "action_text": ["x"],
            "mask": [[True]],
        }
        out = device_cond(cond)
        assert "lengths" in out and "mask" in out
        assert "text" not in out and "action_text" not in out

    def test_loader_rejects_process_sharding_without_drop_last(self):
        from gesturediffusion_tpu.data.collate import collate_gesture
        from gesturediffusion_tpu.data.loader import DataLoader
        from gesturediffusion_tpu.data.synthetic import SyntheticGesture

        ds = SyntheticGesture(n_items=10, window=12, pose_dim=8,
                              n_seed_poses=2)
        with pytest.raises(ValueError, match="drop_last"):
            DataLoader(ds, batch_size=8, collate_fn=collate_gesture,
                       drop_last=False, process_count=2)

    def test_logger_empty_dir_file_sink_raises_clearly(self):
        with pytest.raises(ValueError, match="log dir"):
            log_lib.make_output_format("json", "")

    def test_configure_env_format_without_dir_falls_back(self, monkeypatch):
        monkeypatch.setenv("OPENAI_LOG_FORMAT", "json")
        monkeypatch.delenv("OPENAI_LOGDIR", raising=False)
        logger = log_lib.configure()  # no dir -> temp dir fallback
        logger.logkv("a", 1.0)
        logger.dumpkvs()
        assert logger.dir and os.path.isdir(logger.dir)

    def test_gmm_prior_constants_are_host_numpy(self):
        import numpy as np

        from gesturediffusion_tpu.viz import prior as prior_mod
        from gesturediffusion_tpu.viz.prior import (
            MaxMixturePrior,
            make_synthetic_gmm,
        )

        assert isinstance(prior_mod.ANGLE_PRIOR_IDX, np.ndarray)
        gmm = make_synthetic_gmm(n_gaussians=2, dim=6)
        p = MaxMixturePrior(gmm["means"], gmm["covars"], gmm["weights"])
        assert isinstance(p.means, np.ndarray)
        assert isinstance(p.precisions, np.ndarray)


class TestReviewFixesRound2b:
    def test_eval_a2m_rejects_unknown_mode(self, tmp_path):
        from gesturediffusion_tpu.eval import eval_a2m

        # minimal args.json so the parser's checkpoint override works
        import json

        ckpt = tmp_path / "model000000001"
        ckpt.mkdir()
        (tmp_path / "args.json").write_text(json.dumps(
            {"dataset": "humanact12", "cond_mask_prob": 0.1}
        ))
        with pytest.raises(ValueError, match="eval_mode"):
            eval_a2m.main([
                "--model_path", str(ckpt), "--eval_mode", "wo_mm",
            ])

    def test_in_between_mask_keeps_gt_in_padding(self):
        import numpy as np

        from gesturediffusion_tpu.sample.edit import build_edit_masks

        motion = np.zeros((2, 8, 1, 20), np.float32)
        lengths = np.asarray([16, 10])
        mask = build_edit_masks("in_between", motion, lengths,
                                prefix_end=0.25, suffix_start=0.75)
        # sample 0: generate [4, 12), keep GT elsewhere INCLUDING padding
        assert mask[0, 0, 0, :4].all()
        assert not mask[0, 0, 0, 4:12].any()
        assert mask[0, 0, 0, 12:].all()   # suffix + padding region
        # sample 1 (length 10): padding frames [10, 20) keep GT
        assert mask[1, 0, 0, 10:].all()

    def test_explicit_dir_beats_openai_logdir(self, tmp_path, monkeypatch):
        """An explicitly passed dir must win over $OPENAI_LOGDIR so
        --save_dir monitoring keeps working (the env var only fills in
        when no dir was given, matching reference logger.py:442-447)."""
        env_dir = tmp_path / "env"
        arg_dir = tmp_path / "arg"
        monkeypatch.setenv("OPENAI_LOGDIR", str(env_dir))
        monkeypatch.delenv("OPENAI_LOG_FORMAT", raising=False)
        logger = log_lib.configure(str(arg_dir))
        assert logger.dir == str(arg_dir)

    def test_load_eval_renorm_is_per_dataset(self, tmp_path, monkeypatch):
        """kit eval must load kit_{mean,std}.npy (251-dim), and must NOT
        fall back to t2m stats (263-dim) — mixing them broadcasts-errors
        mid-training (reference: humanml/data/dataset.py:756)."""
        import numpy as np

        from gesturediffusion_tpu.eval.eval_humanml import load_eval_renorm

        monkeypatch.chdir(tmp_path)
        d = tmp_path / "dataset"
        d.mkdir()
        np.save(d / "kit_mean.npy", np.zeros(251, np.float32))
        np.save(d / "kit_std.npy", np.ones(251, np.float32))

        class DS:
            mean = np.zeros(251, np.float32)
            std = np.ones(251, np.float32)

        got = load_eval_renorm(DS(), dataset_name="kit")
        assert got is not None and got[2].shape == (251,)
        # humanml needs t2m_* — absent in cwd, so it must come from the
        # repo-shipped dataset/t2m_{mean,std}.npy (263-dim T2M stats)
        class DS263:
            mean = np.zeros(263, np.float32)
            std = np.ones(263, np.float32)

        got_t2m = load_eval_renorm(DS263(), dataset_name="humanml")
        assert got_t2m is not None and got_t2m[2].shape == (263,)
        # reduced-dim (synthetic) datasets must NOT renorm with the
        # real 263-dim stats — that would broadcast-error downstream
        assert load_eval_renorm(DS(), dataset_name="humanml") is None

    def test_joints2smpl_autoloads_gmm_prior(self, tmp_path, monkeypatch):
        """With gmm_08.pkl present at $GMM_PRIOR_PATH, joints2smpl must
        pick up the reference GMM prior without an explicit pose_prior
        argument (no L2-fallback warning)."""
        import pickle

        import jax.numpy as jnp
        import numpy as np

        from gesturediffusion_tpu.models.smpl import make_synthetic_smpl
        from gesturediffusion_tpu.viz import prior as prior_mod
        from gesturediffusion_tpu.viz.joints2smpl import (
            _fk_joints,
            joints2smpl,
        )

        gmm = prior_mod.make_synthetic_gmm(n_gaussians=2, dim=69, seed=7)
        path = tmp_path / "gmm_08.pkl"
        with open(path, "wb") as f:
            pickle.dump(gmm, f)
        monkeypatch.setenv("GMM_PRIOR_PATH", str(path))

        messages = []
        monkeypatch.setattr(log_lib, "log",
                            lambda *a, **k: messages.append(" ".join(
                                str(x) for x in a)))

        smpl = make_synthetic_smpl(n_vertices=96)
        rs = np.random.RandomState(0)
        target = np.asarray(_fk_joints(
            smpl,
            jnp.asarray(rs.randn(2, 24, 3) * 0.1, jnp.float32),
            jnp.asarray(rs.randn(2, 3) * 0.1, jnp.float32),
        ))
        joints2smpl(smpl, target, num_smplify_iters=2, lr=0.05)
        assert not any("WITHOUT the GMM pose prior" in m for m in messages)

        # and with the asset absent, the fallback warns loudly
        monkeypatch.setenv("GMM_PRIOR_PATH", str(tmp_path / "missing.pkl"))
        joints2smpl(smpl, target, num_smplify_iters=2, lr=0.05)
        assert any("WITHOUT the GMM pose prior" in m for m in messages)

    def test_plot_renders_many_chains(self, tmp_path):
        import numpy as np

        from gesturediffusion_tpu.viz.plot import plot_3d_motion

        t, j = 4, 12
        motion = np.cumsum(
            np.random.RandomState(0).randn(t, j, 3) * 0.01, 0
        )
        chains = [[i, i + 1] for i in range(j - 1)]  # 11 chains > 5 colors
        out = str(tmp_path / "anim.mp4")
        plot_3d_motion(out, chains, motion, dataset="humanml", title="x",
                       fps=4)
        import os

        assert any(
            os.path.exists(out.replace(".mp4", ext)) or os.path.exists(out)
            for ext in (".gif", ".mp4")
        )
