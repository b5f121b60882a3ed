"""Round-3 robustness fixes: no silent-garbage metric paths.

Missing-asset a2m evaluation must WARN loudly in debug mode and REFUSE
in the full protocol (the reference protocol assumes the downloaded
classifier tars, reference: eval/a2m/stgcn/evaluate.py:22,
eval/a2m/gru_eval.py:60-68).
"""

import os

import numpy as np
import pytest

from gesturediffusion_tpu.eval.eval_a2m import (
    A2MEvaluation,
    STGCNA2MEvaluation,
    make_a2m_evaluation,
)


@pytest.fixture(autouse=True)
def _no_assets(monkeypatch, tmp_path):
    missing = str(tmp_path / "definitely-not-there.tar")
    monkeypatch.setenv("A2M_CLASSIFIER_PATH", missing)
    monkeypatch.setenv("UESTC_STGCN_PATH", missing)
    monkeypatch.setenv("MODI_STGCN_PATH", missing)


class TestRandomInitWarns:
    def test_gru_ctor_warns(self, capsys):
        A2MEvaluation(input_size_raw=72, num_classes=12)
        assert "RANDOM frozen" in capsys.readouterr().out

    def test_stgcn_ctor_warns(self, capsys):
        STGCNA2MEvaluation()
        assert "RANDOM frozen" in capsys.readouterr().out

    def test_unconstrained_ctor_warns(self, capsys):
        from gesturediffusion_tpu.eval.eval_unconstrained import (
            UnconstrainedEvaluator,
        )

        UnconstrainedEvaluator()
        assert "RANDOM frozen" in capsys.readouterr().out

    def test_no_warning_with_explicit_params(self, capsys):
        ev = A2MEvaluation(input_size_raw=72, num_classes=12)
        capsys.readouterr()
        A2MEvaluation(input_size_raw=72, num_classes=12,
                      classifier_params=ev.params)
        assert "RANDOM" not in capsys.readouterr().out


class TestFullModeRefuses:
    def test_humanact12_full_raises(self):
        with pytest.raises(FileNotFoundError, match="full-protocol"):
            make_a2m_evaluation("humanact12", eval_mode="full")

    def test_uestc_full_raises(self):
        with pytest.raises(FileNotFoundError, match="UESTC_STGCN_PATH"):
            make_a2m_evaluation("uestc", eval_mode="full")

    def test_debug_mode_warns_and_proceeds(self, capsys):
        ev = make_a2m_evaluation("humanact12", eval_mode="debug")
        assert ev is not None
        assert "RANDOM frozen" in capsys.readouterr().out

    def test_no_mode_warns_and_proceeds(self, capsys):
        # the in-training eval hook passes no mode: warn, don't kill
        # a training run
        ev = make_a2m_evaluation("uestc")
        assert ev is not None
        assert "RANDOM frozen" in capsys.readouterr().out


class TestTakeLayout:
    """take_layout must return DATASET-LOCAL indices even for splits
    that window an offset slice of the corpus (Genea2022's 70/30
    split adds dataset.begin inside __getitem__)."""

    class _Corpus:
        """3 takes of 4/2/6 windows; the split sees local [0, len)."""

        samples_cumulative = np.array([4, 6, 12])

        def __init__(self, begin=0, end=12):
            self.begin, self._len = begin, end - begin

        def __len__(self):
            return self._len

    def test_no_offset(self):
        from gesturediffusion_tpu.sample.generate import take_layout

        counts, starts, ids = take_layout(self._Corpus())
        assert counts.tolist() == [4, 2, 6]
        assert starts.tolist() == [0, 4, 6]
        assert ids.tolist() == [0, 1, 2]

    def test_val_offset_drops_leading_takes(self):
        from gesturediffusion_tpu.sample.generate import take_layout

        # val split = last 30% of 12 windows -> begin=8 (inside take 2)
        counts, starts, ids = take_layout(self._Corpus(begin=8))
        assert counts.tolist() == [4]
        assert starts.tolist() == [0]
        assert ids.tolist() == [2]

    def test_train_end_clips_trailing_take(self):
        from gesturediffusion_tpu.sample.generate import take_layout

        # train split = first 70% -> end=8 (take 2 half-covered)
        counts, starts, ids = take_layout(self._Corpus(end=8))
        assert counts.tolist() == [4, 2, 2]
        assert starts.tolist() == [0, 4, 6]
        assert ids.tolist() == [0, 1, 2]

    def test_straddling_offset(self):
        from gesturediffusion_tpu.sample.generate import take_layout

        # begin=5 lands inside take 1: its 1 remaining window leads
        counts, starts, ids = take_layout(self._Corpus(begin=5))
        assert counts.tolist() == [1, 6]
        assert starts.tolist() == [0, 1]
        assert ids.tolist() == [1, 2]

    def test_no_take_structure(self):
        from gesturediffusion_tpu.sample.generate import take_layout

        assert take_layout(object()) is None


class TestWavFeeder:
    def _write_wav(self, tmp_path, data):
        from scipy.io import wavfile

        p = str(tmp_path / "in.wav")
        wavfile.write(p, 22050, data)
        return p

    class _Stats:
        pose_dim = 6

    def test_stereo_int16_is_normalized(self, tmp_path):
        """Regression: the downmix promoted int16 to float64 BEFORE the
        integer check, feeding +-32767-range samples to the MFCC."""
        from gesturediffusion_tpu.serve.demo import _wav_chunk_feeder

        n = 22050 * 2
        mono = (np.sin(np.linspace(0, 800, n)) * 20000).astype(np.int16)
        stereo = np.stack([mono, mono], axis=1)
        wav = self._write_wav(tmp_path, stereo)
        windows, _, _ = _wav_chunk_feeder(wav, self._Stats(), 1, 30, 10)
        w = next(windows)
        assert np.abs(w).max() <= 1.0
        assert np.abs(w).max() > 0.1  # not silently zeroed either

    def test_mono_float_passthrough(self, tmp_path):
        from gesturediffusion_tpu.serve.demo import _wav_chunk_feeder

        data = (np.random.RandomState(0).randn(22050) * 0.1).astype(
            np.float32
        )
        wav = self._write_wav(tmp_path, data)
        windows, n, seed = _wav_chunk_feeder(wav, self._Stats(), 2, 30, 7)
        assert seed.shape == (2, 6, 1, 7)
        np.testing.assert_allclose(next(windows), data[: 22050 * 30 // 30])


class TestRespacingString:
    def test_logsnr_without_steps_raises(self):
        from gesturediffusion_tpu.diffusion.schedules import (
            respacing_string,
        )

        with pytest.raises(ValueError, match="requires sample_steps"):
            respacing_string(None, "ddim", "logsnr")

    def test_uniform_without_steps_is_full_chain(self):
        from gesturediffusion_tpu.diffusion.schedules import (
            respacing_string,
        )

        assert respacing_string(None, "ddpm", "uniform") is None


class TestUtilsVizReviewFixes:
    """Round-3 utils/viz review regressions."""

    def test_str2bool_parses_false(self):
        from gesturediffusion_tpu.utils.parser import str2bool

        assert str2bool("False") is False
        assert str2bool("true") is True
        assert str2bool("0") is False
        with pytest.raises(Exception):
            str2bool("maybe")

    def test_default_output_dir_trailing_slash_and_pt(self):
        from gesturediffusion_tpu.utils.parser import default_output_dir

        # orbax checkpoint dirs tab-complete with a trailing slash
        assert default_output_dir(
            "save/run/model000600000/", "samples", "seed10"
        ) == "save/run/samples_run_000600000_seed10"
        # torch checkpoints strip the extension (reference convention)
        assert default_output_dir(
            "save/run/model000400000.pt", "edit", "seed3"
        ) == "save/run/edit_run_000400000_seed3"

    def test_csv_logger_survives_resume_with_narrower_kvs(self, tmp_path):
        """Resume regression: the first dump after restart may lack
        eval/* columns the existing progress.csv already has."""
        from gesturediffusion_tpu.utils.logger import CSVOutputFormat

        p = str(tmp_path / "progress.csv")
        w1 = CSVOutputFormat(p)
        w1.writekvs({"loss": 1.0, "eval/fid": 5.0})
        # new process: narrower first dump
        w2 = CSVOutputFormat(p)
        w2.writekvs({"loss": 0.5})
        import csv as _csv

        rows = list(_csv.DictReader(open(p)))
        assert rows[0]["eval/fid"] == "5.0"
        assert rows[1]["loss"] == "0.5"

    def test_hash_text_embedder_is_process_stable(self):
        import hashlib
        import subprocess
        import sys

        from gesturediffusion_tpu.utils.text_embedder import (
            HashTextEmbedder,
        )

        emb = HashTextEmbedder(dim=16)
        v = emb(["a person walks"])
        out = subprocess.run(
            [sys.executable, "-c",
             "from gesturediffusion_tpu.utils.text_embedder import "
             "HashTextEmbedder;"
             "print(float(HashTextEmbedder(dim=16)(['a person walks'])"
             ".sum()))"],
            capture_output=True, text=True,
            env=dict(os.environ, PYTHONHASHSEED="999",
                     JAX_PLATFORMS="cpu"),
        )
        assert abs(float(out.stdout.strip()) - float(v.sum())) < 1e-5

    def test_stage_runner_is_cached(self):
        from gesturediffusion_tpu.viz.joints2smpl import _make_stage_runner

        assert _make_stage_runner(0.02, 150, None) is _make_stage_runner(
            0.02, 150, None
        )


class TestRematFlagWiring:
    """--remat reaches the model through the factory for every family
    (utils/parser.py add_tpu_options -> utils/model_factory.py)."""

    def test_factory_passes_remat(self):
        import argparse

        from gesturediffusion_tpu.utils.model_factory import create_model

        base = dict(
            latent_dim=32, layers=1, cond_mask_prob=0.1, arch="trans_enc",
            unconstrained=False, remat=True,
        )
        gesture = create_model(argparse.Namespace(
            dataset="genea2023", use_text=False, use_audio=True,
            mfcc_input=True, use_wav_enc=False, seed_poses=4, **base))
        t2m = create_model(argparse.Namespace(
            dataset="humanml", **base))
        a2m = create_model(argparse.Namespace(
            dataset="humanact12", num_actions=12, **base))
        assert gesture.remat and t2m.remat and a2m.remat

    def test_parser_default_off(self):
        from gesturediffusion_tpu.utils.parser import train_args

        args = train_args(["--save_dir", "/tmp/x", "--dataset", "genea2023"])
        assert args.remat is False
