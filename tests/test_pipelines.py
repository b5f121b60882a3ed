"""End-to-end pipeline tests: a2m data, humanml data/codec, edit masks,
eval driver smoke, BVH roundtrip."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gesturediffusion_tpu.data.a2m import (
    HumanAct12Poses,
    collate_a2m,
    make_synthetic_humanact12,
)
from gesturediffusion_tpu.data.humanml import (
    HashVectorizer,
    Text2MotionDatasetV2,
    TextOnlyDataset,
    make_synthetic_humanml,
)
from gesturediffusion_tpu.ops.motion_process import (
    recover_from_ric,
    recover_root_rot_pos,
)
from gesturediffusion_tpu.sample.edit import build_edit_masks
from gesturediffusion_tpu.viz.bvh import (
    export_gesture_bvh,
    make_default_skeleton,
    read_bvh,
    write_bvh,
)


@pytest.fixture(scope="module")
def act12_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("act12")
    return make_synthetic_humanact12(str(root), n_clips=24)


@pytest.fixture(scope="module")
def hml_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("hml")
    return make_synthetic_humanml(str(root), n_clips=9, dim=67)


class TestA2MData:
    def test_rot6d_with_translation(self, act12_root):
        ds = HumanAct12Poses(act12_root, num_frames=60, pose_rep="rot6d")
        item = ds[0]
        # 24 joints + translation row, 6 features, 60 frames
        assert item["pose"].shape == (25, 6, 60)
        assert 0 <= item["action"] < 12
        assert isinstance(item["action_text"], str)

    def test_xyz_rep(self, act12_root):
        ds = HumanAct12Poses(act12_root, num_frames=60, pose_rep="xyz",
                             translation=False)
        item = ds[0]
        assert item["pose"].shape == (24, 3, 60)

    def test_frame_padding_short_clip(self, act12_root):
        ds = HumanAct12Poses(act12_root, num_frames=200)
        item = ds[0]
        assert item["pose"].shape[-1] == 200  # padded by repeating last frame

    def test_shuffle_reset(self, act12_root):
        ds = HumanAct12Poses(act12_root, num_frames=60, split="test")
        before = list(ds._test)
        ds.reset_shuffle()
        ds.shuffle()
        ds.reset_shuffle()
        assert list(ds._test) == before

    def test_collate(self, act12_root):
        ds = HumanAct12Poses(act12_root, num_frames=60)
        motion, cond = collate_a2m([ds[i] for i in range(4)])
        assert motion.shape == (4, 25, 6, 60)
        assert cond["action"].shape == (4,)
        assert cond["mask"].shape == (4, 1, 1, 60)


class TestHumanMLData:
    def test_dataset_loads(self, hml_root):
        ds = Text2MotionDatasetV2(hml_root, split="train")
        assert len(ds) > 0
        item = ds[0]
        assert item["motion"].shape == (196, 67)
        assert item["length"] % 4 == 0  # unit-length crop
        assert isinstance(item["text"], str)

    def test_with_vectorizer(self, hml_root):
        ds = Text2MotionDatasetV2(
            hml_root, split="train", w_vectorizer=HashVectorizer()
        )
        item = ds[0]
        assert item["word_embeddings"].shape == (22, 300)
        assert item["pos_one_hots"].shape == (22, 15)
        assert item["sent_len"] > 0

    def test_text_only(self, hml_root):
        ds = TextOnlyDataset(hml_root, split="test")
        assert len(ds) > 0
        assert ds[0]["text"] != ""


class TestMotionProcessCodec:
    def test_root_recovery_straight_line(self):
        """Constant +x velocity, no rotation -> straight x path."""
        t, d = 10, 67
        data = np.zeros((t, d), np.float32)
        data[:, 1] = 0.1  # x velocity
        data[:, 3] = 1.0  # height
        quat, pos = recover_root_rot_pos(jnp.asarray(data))
        np.testing.assert_allclose(pos[:, 1], 1.0, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(pos[1:, 0]), 0.1 * np.arange(1, t), atol=1e-5
        )
        np.testing.assert_allclose(quat[:, 0], 1.0, atol=1e-6)

    def test_recover_from_ric_shape(self):
        data = jnp.asarray(np.random.RandomState(0).randn(2, 30, 263),
                           jnp.float32)
        pos = recover_from_ric(data, 22)
        assert pos.shape == (2, 30, 22, 3)

    def test_yaw_rotation_integrates(self):
        t = 5
        data = np.zeros((t, 263), np.float32)
        data[:, 0] = 0.1  # yaw velocity
        quat, _ = recover_root_rot_pos(jnp.asarray(data))
        # cumulative angle 0, .1, .2, ...
        expected = np.cos(0.1 * np.arange(t))
        np.testing.assert_allclose(np.asarray(quat[:, 0]), expected, atol=1e-5)


class TestEditMasks:
    def test_in_between(self):
        motion = np.zeros((2, 8, 1, 20))
        mask = build_edit_masks("in_between", motion, np.asarray([20, 10]),
                                prefix_end=0.25, suffix_start=0.75)
        assert mask[0, 0, 0, :5].all() and not mask[0, 0, 0, 5:15].any()
        assert mask[0, 0, 0, 15:20].all()
        # second sample's ranges scale with its length 10
        assert mask[1, 0, 0, :2].all() and not mask[1, 0, 0, 3:7].any()

    def test_upper_body_uses_feature_mask(self):
        motion = np.zeros((1, 263, 1, 8))
        mask = build_edit_masks("upper_body", motion, np.asarray([8]))
        from gesturediffusion_tpu.data.humanml_utils import (
            HML_LOWER_BODY_MASK,
        )

        np.testing.assert_array_equal(mask[0, :, 0, 0], HML_LOWER_BODY_MASK)

    def test_inpainting_preserves_gt_through_sampler(self):
        """End-to-end edit semantics with a toy model."""
        from gesturediffusion_tpu.diffusion import (
            ModelMeanType,
            create_diffusion,
        )
        from gesturediffusion_tpu.diffusion.sampling import p_sample_loop

        d = create_diffusion(steps=8, model_mean_type=ModelMeanType.START_X)
        motion = np.random.RandomState(0).randn(2, 8, 1, 20).astype(np.float32)
        mask = build_edit_masks("in_between", motion, np.asarray([20, 20]))
        out = p_sample_loop(
            d, lambda x, t, c: jnp.zeros_like(x), motion.shape,
            jax.random.PRNGKey(0), None,
            inpaint=(jnp.asarray(mask), jnp.asarray(motion)),
        )
        np.testing.assert_allclose(
            np.where(mask, np.asarray(out), 0), np.where(mask, motion, 0),
            atol=1e-5,
        )


class TestEvalDriverSmoke:
    def test_evaluation_pipeline_tiny(self, hml_root, tmp_path):
        """Full metric pipeline with a perfect 'generator' (returns GT)."""
        from gesturediffusion_tpu.eval.eval_humanml import (
            GroundTruthMotionSet,
            evaluation,
        )
        from gesturediffusion_tpu.eval.evaluator_wrapper import (
            EvaluatorWrapper,
        )

        ds = Text2MotionDatasetV2(
            hml_root, split="train", w_vectorizer=HashVectorizer()
        )
        bs = min(4, len(ds))
        gt_loader = GroundTruthMotionSet(ds, batch_size=bs, cache=True)
        wrapper = EvaluatorWrapper("humanml", dim_pose=67)

        def make_gt_as_gen(replication):
            return gt_loader, []

        out = evaluation(
            wrapper,
            gt_loader,
            {"vald": make_gt_as_gen},
            str(tmp_path / "eval.log"),
            replication_times=2,
            diversity_times=2,
            run_mm=False,
        )
        # generator == GT  =>  FID 0 up to sqrtm numerical noise (scale
        # depends on the random evaluator init)
        assert abs(out["FID_vald"]) < 1e-3
        assert np.allclose(
            out["Matching Score_vald"], out["Matching Score_ground truth"]
        )


class TestBVH:
    def test_write_read_roundtrip(self, tmp_path):
        t, j = 12, 5
        rot = np.random.RandomState(0).randn(t, j, 3).astype(np.float64) * 30
        root = np.random.RandomState(1).randn(t, 3)
        path = str(tmp_path / "test.bvh")
        export_gesture_bvh(path, rot, root, fps=30)
        sk = read_bvh(path)
        assert sk.frames == t
        lj = sk.list_of_joints()
        assert len(lj) == j
        np.testing.assert_allclose(lj[0].translation, root, atol=1e-4)
        np.testing.assert_allclose(lj[2].rotation, rot[:, 2], atol=1e-4)

    def test_default_skeleton_channels(self):
        sk = make_default_skeleton(4)
        assert len(sk.joints[0].channels) == 6
        assert all(len(jnt.channels) == 3 for jnt in sk.joints[1:])


class TestHumanMLVariants:
    def test_motion_dataset_v2(self, hml_root):
        from gesturediffusion_tpu.data.humanml import MotionDatasetV2

        ds = MotionDatasetV2(hml_root, split="train", window_size=32)
        assert len(ds) > 0
        item = ds[0]
        assert item["motion"].shape == (32, 67)

    def test_baseline_dataset(self, hml_root):
        from gesturediffusion_tpu.data.humanml import (
            Text2MotionDatasetBaseline,
        )

        ds = Text2MotionDatasetBaseline(hml_root, split="train")
        item = ds[0]
        assert "src_motion" in item
        assert item["src_motion"].shape[0] == ds.max_length

    def test_raw_text_dataset(self, hml_root, tmp_path):
        from gesturediffusion_tpu.data.humanml import (
            HashVectorizer,
            RawTextDataset,
        )

        tf = tmp_path / "prompts.txt"
        tf.write_text("a person walks forward\na person waves both hands\n")
        ds = RawTextDataset(str(tf), w_vectorizer=HashVectorizer())
        assert len(ds) == 2
        item = ds[0]
        assert item["word_embeddings"].shape == (22, 300)
        assert item["text"] == "a person walks forward"
