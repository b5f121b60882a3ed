"""CLI end-to-end: train -> generate -> edit as real subprocess invocations.

These exercise the public command surface (the reference's README flows)
on the synthetic dataset with tiny configs.  The persistent XLA compile
cache keeps re-runs fast.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ENV = dict(
    os.environ,
    JAX_PLATFORMS="cpu",
    DIFFUSION_TRAINING_TEST="1",
    PYTHONPATH=REPO,
)


def run_cli(args, timeout=540):
    proc = subprocess.run(
        [sys.executable, "-m"] + args,
        cwd=REPO, env=ENV, capture_output=True, text=True, timeout=timeout,
    )
    assert proc.returncode == 0, (
        f"CLI failed: {' '.join(args)}\n--- stdout ---\n{proc.stdout[-3000:]}"
        f"\n--- stderr ---\n{proc.stderr[-3000:]}"
    )
    return proc


@pytest.fixture(scope="module")
def trained_ckpt(tmp_path_factory):
    save_dir = str(tmp_path_factory.mktemp("e2e") / "run")
    run_cli([
        "gesturediffusion_tpu.train.train_mdm",
        "--dataset", "synthetic", "--save_dir", save_dir,
        "--batch_size", "8", "--num_frames", "20", "--latent_dim", "32",
        "--layers", "1", "--num_steps", "4", "--log_interval", "2",
        "--save_interval", "2", "--seed_poses", "4",
        "--diffusion_steps", "8",
    ])
    ckpt = os.path.join(save_dir, "model000000003")
    assert os.path.isdir(ckpt)
    assert os.path.isfile(os.path.join(save_dir, "args.json"))
    return ckpt


class TestCLIChain:
    def test_train_writes_args_and_checkpoint(self, trained_ckpt):
        args = json.load(
            open(os.path.join(os.path.dirname(trained_ckpt), "args.json"))
        )
        assert args["dataset"] == "synthetic"

    def test_generate_from_checkpoint(self, trained_ckpt):
        run_cli([
            "gesturediffusion_tpu.sample.generate",
            "--model_path", trained_ckpt, "--num_samples", "2",
            "--sampler", "ddim", "--timestep_respacing", "",
            "--seed", "3",
        ])
        out_dir = os.path.join(
            os.path.dirname(trained_ckpt), "samples_run_000000003_seed3"
        )
        results = np.load(
            os.path.join(out_dir, "results.npy"), allow_pickle=True
        ).item()
        assert results["motion"].shape[0] == 2
        assert np.isfinite(results["motion"]).all()
        assert os.path.getsize(
            os.path.join(out_dir, os.listdir(out_dir)[0])
        ) > 0

    def test_serve_demo_from_checkpoint(self, trained_ckpt):
        run_cli([
            "gesturediffusion_tpu.serve.demo",
            "--model_path", trained_ckpt, "--streams", "2",
            "--num_chunks", "2", "--sampler", "ddim",
            "--sample_steps", "4", "--seed", "5",
        ])
        out_dir = os.path.join(
            os.path.dirname(trained_ckpt), "serve_run_000000003_seed5"
        )
        results = np.load(
            os.path.join(out_dir, "results.npy"), allow_pickle=True
        ).item()
        assert results["motion"].shape[0] == 2
        assert results["num_chunks"] == 2
        assert np.isfinite(results["motion"]).all()
        report = json.load(
            open(os.path.join(out_dir, "serving_report.json"))
        )
        assert report["chunks_served"] == 2
        assert report["steady_mean_latency_s"] > 0
        assert os.path.isfile(os.path.join(out_dir, "stream_0.bvh"))
        assert os.path.isfile(os.path.join(out_dir, "stream_1.bvh"))

    def test_serve_demo_from_wav(self, trained_ckpt, tmp_path):
        # a raw mono wav (two chunks worth) through the MFCC front end
        from scipy.io import wavfile

        rs = np.random.RandomState(0)
        sr, frames = 22050, 20
        wav = (rs.randn(2 * int(frames * sr / 30)) * 0.1).astype(np.float32)
        wav_path = str(tmp_path / "in.wav")
        wavfile.write(wav_path, sr, (wav * 32767).astype(np.int16))
        run_cli([
            "gesturediffusion_tpu.serve.demo",
            "--model_path", trained_ckpt, "--wav", wav_path,
            "--sampler", "ddpm", "--sample_steps", "4", "--seed", "6",
            "--output_dir", str(tmp_path / "out"),
        ])
        results = np.load(
            str(tmp_path / "out" / "results.npy"), allow_pickle=True
        ).item()
        assert results["num_chunks"] == 2
        assert np.isfinite(results["motion"]).all()

    def test_edit_from_checkpoint(self, trained_ckpt):
        run_cli([
            "gesturediffusion_tpu.sample.edit",
            "--model_path", trained_ckpt, "--num_samples", "2",
            "--num_repetitions", "1", "--edit_mode", "in_between",
            "--seed", "4",
        ])
        out_dir = os.path.join(
            os.path.dirname(trained_ckpt), "edit_run_000000003_in_between_seed4"
        )
        results = np.load(
            os.path.join(out_dir, "results.npy"), allow_pickle=True
        ).item()
        assert results["motion"].shape[0] == 2
