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
