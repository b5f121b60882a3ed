"""UESTC dataset + STGCN a2m evaluation + unconstrained metrics wiring.

Hermetic end-to-end coverage for the two capability configs the round-1
verdict flagged as unwired: UESTC evaluation (reference:
eval/eval_humanact12_uestc.py:30-35 dispatch + eval/a2m/stgcn_eval.py)
and the unconstrained MoDi metrics branch (reference:
eval/a2m/gru_eval.py:106-121).
"""

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gesturediffusion_tpu.data.uestc import (
    TRAIN_SUBJECTS,
    UESTC,
    make_synthetic_uestc,
)
from gesturediffusion_tpu.eval.eval_a2m import (
    STGCNA2MEvaluation,
    UNCONSTRAINED_15_JOINTS,
    evaluate_unconstrained_branch,
    evaluate_uestc,
)


@pytest.fixture(scope="module")
def uestc_root(tmp_path_factory):
    return make_synthetic_uestc(str(tmp_path_factory.mktemp("uestc")))


class TestUESTCLoader:
    def test_split_and_item_contract(self, uestc_root):
        tr = UESTC(uestc_root, num_frames=60, pose_rep="rot6d", split="train")
        te = UESTC(uestc_root, num_frames=60, pose_rep="rot6d", split="test")
        assert len(tr) > 0 and len(te) > 0
        item = tr[0]
        # 24 rot6d joints + 1 translation row
        assert item["pose"].shape == (25, 6, 60)
        assert 0 <= item["action"] < 40
        assert item["action_text"].startswith("action_")

    def test_subject_split_is_disjoint(self, uestc_root):
        ds = UESTC(uestc_root, num_frames=60, split="train")
        train_subj = {ds.video_info[i]["subject"] for i in ds._train}
        test_subj = {ds.video_info[i]["subject"] for i in ds._test}
        assert train_subj.issubset(set(TRAIN_SUBJECTS))
        assert not (test_subj & set(TRAIN_SUBJECTS))

    def test_view_correction_is_rigid(self, uestc_root):
        """The side-2 front-view correction is a yaw rotation + global
        translation: per-frame pairwise joint distances must match the raw
        VIBE joints (reference: data_loaders/a2m/uestc.py:122-152)."""
        with open(os.path.join(uestc_root, "vibe_cache_refined.pkl"),
                  "rb") as f:
            raw = pickle.load(f)
        ds = UESTC(uestc_root, num_frames=60, split="train")

        def pdist(x):  # [J,3] -> [J,J]
            return np.linalg.norm(x[None] - x[:, None], axis=-1)

        checked_rotated = False
        for idx, info in enumerate(ds.video_info):
            a = np.asarray(ds._joints[idx][0])
            b = np.asarray(raw["joints3d"][idx][0])
            np.testing.assert_allclose(pdist(a), pdist(b), atol=1e-4)
            if info["side"] != 1 and info["view"] not in (0, 8):
                # rotation actually applied (not identity)
                offset = a - b
                assert float(np.ptp(offset, axis=0).max()) > 1e-6
                checked_rotated = True
        assert checked_rotated

    def test_globtrans_cache_roundtrip(self, uestc_root):
        ds1 = UESTC(uestc_root, num_frames=60, split="train")
        assert os.path.exists(os.path.join(uestc_root, "globtrans_usez.pkl"))
        ds2 = UESTC(uestc_root, num_frames=60, split="train")
        np.testing.assert_allclose(
            np.asarray(ds1._joints[0]), np.asarray(ds2._joints[0]), atol=1e-5
        )

    def test_globtrans_cache_corruption_recovers(self, tmp_path):
        """A truncated cache pickle (crashed/racing writer) must be
        recomputed, not crash dataset construction (round-3 review)."""
        root = make_synthetic_uestc(str(tmp_path / "u"))
        ds1 = UESTC(root, num_frames=60, split="train")
        cache = os.path.join(root, "globtrans_usez.pkl")
        with open(cache, "rb") as f:
            good = f.read()
        with open(cache, "wb") as f:
            f.write(good[: len(good) // 2])  # truncate mid-stream
        ds2 = UESTC(root, num_frames=60, split="train")
        np.testing.assert_allclose(
            np.asarray(ds1._joints[0]), np.asarray(ds2._joints[0]),
            atol=1e-5,
        )

    def test_registry_entry(self, uestc_root):
        from gesturediffusion_tpu.data.registry import get_dataset_loader

        loader = get_dataset_loader(
            "uestc", batch_size=2, num_frames=60, split="train",
            datapath=uestc_root, num_workers=1,
        )
        motion, cond = next(iter(loader))
        assert motion.shape == (2, 25, 6, 60)
        assert cond["action"].shape == (2,)


def _dummy_sample_fn(rng, shape, cond):
    return jax.random.normal(rng, shape) * 0.05


def _dummy_fk_fn(sample):
    # [B, 25, 6, T] -> [B, 24, 3, T]: drop the translation row, take the
    # first three rot6d channels as fake coordinates
    return sample[:, :24, :3, :]


class TestUESTCEvaluation:
    def test_evaluate_uestc_end_to_end(self, uestc_root):
        dataset = UESTC(uestc_root, num_frames=60, pose_rep="rot6d",
                        split="test")
        evaluation = STGCNA2MEvaluation()  # random-init classifier
        summary = evaluate_uestc(
            _dummy_sample_fn, _dummy_fk_fn, dataset, evaluation,
            num_seeds=1, num_samples=6, batch_size=3, num_frames=60,
            log=lambda *a: None,
        )
        for split in ("train", "test"):
            for key in ("gt", "gen"):
                assert f"fid_{key}_{split}" in summary
                assert f"accuracy_{key}_{split}" in summary
                assert f"diversity_{key}_{split}" in summary
                assert np.isfinite(summary[f"fid_{key}_{split}"])
        # gt-vs-gt FID is ~0 by construction
        assert summary["fid_gt_train"] < 1e-3
        assert summary["fid_gt_test"] < 1e-3


class TestUnconstrainedBranch:
    def test_branch_produces_reference_metric_set(self, tmp_path):
        from gesturediffusion_tpu.data.a2m import (
            HumanAct12Poses,
            make_synthetic_humanact12,
        )

        root = make_synthetic_humanact12(str(tmp_path / "ha12"), n_clips=12)
        dataset = HumanAct12Poses(root, num_frames=16, pose_rep="rot6d",
                                  split="test")

        metrics = evaluate_unconstrained_branch(
            _dummy_sample_fn,
            lambda s: s[:, :24, :3, :],
            dataset,
            num_samples=8,
            batch_size=4,
            num_frames=16,
            dataset_npy_path=None,  # exercises the FK-derived GT fallback
            log=lambda *a: None,
        )
        for key in ("fid", "kid_mean", "kid_std", "diversity_gen",
                    "diversity_gt"):
            assert f"{key}_unconstrained" in metrics
            assert np.isfinite(metrics[f"{key}_unconstrained"])

    def test_branch_uses_precomputed_npy_when_present(self, tmp_path):
        from gesturediffusion_tpu.data.a2m import (
            HumanAct12Poses,
            make_synthetic_humanact12,
        )

        root = make_synthetic_humanact12(str(tmp_path / "ha12"), n_clips=12)
        dataset = HumanAct12Poses(root, num_frames=16, pose_rep="rot6d",
                                  split="test")
        # modi-struct layout: [M, 16, 3, T] (16 joints for back-compat)
        gt = np.random.RandomState(0).randn(10, 16, 3, 16).astype(np.float32)
        npy = str(tmp_path / "humanact12_unconstrained_modi_struct.npy")
        np.save(npy, gt)
        metrics = evaluate_unconstrained_branch(
            _dummy_sample_fn,
            lambda s: s[:, :24, :3, :],
            dataset,
            num_samples=8,
            batch_size=4,
            num_frames=16,
            dataset_npy_path=npy,
            log=lambda *a: None,
        )
        assert np.isfinite(metrics["fid_unconstrained"])

    def test_15_joint_subset_matches_reference(self):
        assert UNCONSTRAINED_15_JOINTS == [
            15, 12, 16, 18, 20, 17, 19, 21, 0, 1, 4, 7, 2, 5, 8
        ]


class TestUESTCCLIChain:
    """train -> eval_a2m --dataset uestc as real subprocesses (the round-1
    verdict's done-bar: debug-mode UESTC eval runs green on synthetic
    data)."""

    def test_train_and_eval_uestc(self, uestc_root, tmp_path):
        import subprocess
        import sys

        from gesturediffusion_tpu.models.smpl import (
            save_synthetic_smpl_pickle,
        )

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        smpl_pkl = save_synthetic_smpl_pickle(str(tmp_path / "smpl.pkl"))
        env = dict(
            os.environ, JAX_PLATFORMS="cpu", DIFFUSION_TRAINING_TEST="1",
            PYTHONPATH=repo, SMPL_MODEL_PATH=smpl_pkl,
        )
        save_dir = str(tmp_path / "run")

        def run(mod_args, timeout=540):
            proc = subprocess.run(
                [sys.executable, "-m"] + mod_args,
                cwd=repo, env=env, capture_output=True, text=True,
                timeout=timeout,
            )
            assert proc.returncode == 0, (
                f"CLI failed: {' '.join(mod_args)}\n--- stdout ---\n"
                f"{proc.stdout[-3000:]}\n--- stderr ---\n"
                f"{proc.stderr[-3000:]}"
            )
            return proc

        run([
            "gesturediffusion_tpu.train.train_mdm",
            "--dataset", "uestc", "--data_dir", uestc_root,
            "--save_dir", save_dir, "--batch_size", "4",
            "--num_frames", "60", "--latent_dim", "32", "--layers", "1",
            "--num_steps", "4", "--log_interval", "2",
            "--save_interval", "2", "--diffusion_steps", "8",
        ])
        ckpt = os.path.join(save_dir, "model000000003")
        assert os.path.isdir(ckpt)
        run([
            "gesturediffusion_tpu.eval.eval_a2m",
            "--dataset", "uestc", "--data_dir", uestc_root,
            "--model_path", ckpt, "--eval_mode", "debug",
            "--batch_size", "4", "--guidance_param", "1",
        ])
        out = os.path.join(save_dir, "eval_uestc_debug.yaml")
        assert os.path.exists(out)
        import yaml

        metrics = yaml.safe_load(open(out))
        for key in ("fid_gen_train", "fid_gen_test", "accuracy_gen_train",
                    "diversity_gt_test"):
            assert key in metrics


class TestPartialBatches:
    def test_last_partial_batch_is_truncated_not_dropped(self, uestc_root):
        from gesturediffusion_tpu.eval.eval_a2m import make_gt_batches

        dataset = UESTC(uestc_root, num_frames=60, pose_rep="rot6d",
                        split="test")
        n = min(7, len(dataset))
        batches = make_gt_batches(_dummy_fk_fn, dataset, n, 4, 60)
        total = sum(b["output_xyz"].shape[0] for b in batches)
        assert total == n
