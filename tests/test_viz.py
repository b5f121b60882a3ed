"""Visualization/export tests: SMPLify fit, OBJ export, HumanIK JSON."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gesturediffusion_tpu.models.smpl import make_synthetic_smpl
from gesturediffusion_tpu.ops import rotations as R
from gesturediffusion_tpu.viz.joints2smpl import (
    FIX_FOOT_JOINTS,
    _fk_joints,
    joints2smpl,
)
from gesturediffusion_tpu.viz.joints2smpl import main as npy2smpl_main
from gesturediffusion_tpu.viz.joints2smpl import motion_to_rot, npy2smpl
from gesturediffusion_tpu.viz.motions2hik import HIK_JOINT_MAP, motions2hik
from gesturediffusion_tpu.viz.vis_utils import Npy2Obj, write_obj


@pytest.fixture(scope="module")
def smpl():
    return make_synthetic_smpl(n_vertices=96)


class TestJoints2SMPL:
    def test_fit_reduces_keypoint_error(self, smpl):
        t = 4
        rs = np.random.RandomState(0)
        true_pose = jnp.asarray(rs.randn(t, 24, 3) * 0.2, jnp.float32)
        true_transl = jnp.asarray(rs.randn(t, 3) * 0.3, jnp.float32)
        target = np.asarray(_fk_joints(smpl, true_pose, true_transl))

        fit = joints2smpl(smpl, target, num_smplify_iters=120, lr=0.05)
        fitted = np.asarray(
            _fk_joints(
                smpl,
                jnp.asarray(fit["thetas"]),
                jnp.asarray(fit["root_translation"]),
            )
        )
        init_err = float(np.mean(np.sum(target**2, -1)))
        final_err = float(np.mean(np.sum((fitted - target) ** 2, -1)))
        assert final_err < 0.1 * init_err
        assert fit["loss"][1] < fit["loss"][0]  # stage 2 improves on stage 1

    def test_fix_foot_upweights_foot_error(self, smpl):
        # with fix_foot the ankle/foot joints must end closer to target
        # than the default fit leaves them (reference conf_3d semantics)
        t = 3
        rs = np.random.RandomState(3)
        true_pose = jnp.asarray(rs.randn(t, 24, 3) * 0.3, jnp.float32)
        target = np.asarray(_fk_joints(smpl, true_pose, jnp.zeros((t, 3))))

        feet = np.asarray(FIX_FOOT_JOINTS)

        def foot_err(fit):
            fitted = np.asarray(_fk_joints(
                smpl, jnp.asarray(fit["thetas"]),
                jnp.asarray(fit["root_translation"]),
            ))
            return float(np.mean(np.sum(
                (fitted[:, feet] - target[:, feet]) ** 2, -1
            )))

        base = joints2smpl(smpl, target, num_smplify_iters=60, lr=0.05)
        fixed = joints2smpl(smpl, target, num_smplify_iters=60, lr=0.05,
                            fix_foot=True)
        # loose margin: at 60 iters the fit is noise-dominated; the
        # invariant is "upweighting feet never makes feet clearly worse"
        assert foot_err(fixed) <= foot_err(base) * 1.05

    def test_joint_confidence_validated(self, smpl):
        target = np.zeros((2, 24, 3), np.float32)
        with pytest.raises(ValueError, match="joint_confidence"):
            joints2smpl(smpl, target, num_smplify_iters=1,
                        joint_confidence=np.ones(5, np.float32))

    def test_joint_confidence_fix_foot_exclusive(self, smpl):
        # fix_foot used to be silently ignored when joint_confidence was
        # also supplied — now loudly rejected
        target = np.zeros((2, 24, 3), np.float32)
        with pytest.raises(ValueError, match="mutually exclusive"):
            joints2smpl(smpl, target, num_smplify_iters=1, fix_foot=True,
                        joint_confidence=np.ones(22, np.float32))

    def test_npy2smpl_rejects_non_npy(self, smpl, tmp_path):
        # reference gate: simplify_loc2rot.py:126
        bogus = tmp_path / "results.txt"
        bogus.write_text("not npy")
        with pytest.raises(ValueError, match=r"\.npy"):
            npy2smpl(str(bogus), smpl)

    def test_mean_pose_init(self, smpl, tmp_path, monkeypatch):
        # when neutral_smpl_mean_params.h5 is present the fit starts
        # from its mean pose (reference simplify_loc2rot.py:28-33)
        import h5py

        from gesturediffusion_tpu.viz.joints2smpl import load_smpl_mean_pose

        path = str(tmp_path / "neutral_smpl_mean_params.h5")
        mean = np.random.RandomState(6).randn(72).astype(np.float32) * 0.1
        with h5py.File(path, "w") as f:
            f["pose"] = mean
            f["shape"] = np.zeros(10, np.float32)
        monkeypatch.setenv("SMPL_MEAN_PATH", path)
        assert load_smpl_mean_pose().shape == (24, 3)

        # 0-iteration fit: thetas must BE the tiled mean pose
        target = np.zeros((3, 24, 3), np.float32)
        fit = joints2smpl(smpl, target, num_smplify_iters=0)
        np.testing.assert_allclose(
            fit["thetas"], np.broadcast_to(mean.reshape(24, 3), (3, 24, 3)),
            rtol=1e-6,
        )

        monkeypatch.setenv("SMPL_MEAN_PATH", str(tmp_path / "absent.h5"))
        assert load_smpl_mean_pose() is None


class TestVisUtils:
    def test_write_obj(self, tmp_path):
        verts = np.random.RandomState(0).randn(10, 3)
        faces = np.asarray([[0, 1, 2], [3, 4, 5]])
        path = str(tmp_path / "mesh.obj")
        write_obj(path, verts, faces)
        lines = open(path).read().splitlines()
        assert sum(1 for l in lines if l.startswith("v ")) == 10
        assert "f 1 2 3" in lines

    def test_npy2obj_xyz_pipeline(self, smpl, tmp_path):
        # results.npy in the generate-CLI contract with xyz motion
        t = 3
        rs = np.random.RandomState(1)
        pose = jnp.asarray(rs.randn(t, 24, 3) * 0.1, jnp.float32)
        transl = jnp.zeros((t, 3))
        joints = np.asarray(_fk_joints(smpl, pose, transl))  # [T, 24, 3]
        motion = joints.transpose(1, 2, 0)[None]  # [1, 24, 3, T]
        npy_path = str(tmp_path / "results.npy")
        np.save(npy_path, {"motion": motion, "num_samples": 1})

        conv = Npy2Obj(npy_path, 0, 0, smpl, num_smplify_iters=40)
        assert conv.vertices.shape == (t, 96, 3)
        obj_path = conv.save_obj(str(tmp_path / "f0.obj"), 0)
        assert os.path.getsize(obj_path) > 0
        conv.save_npy(str(tmp_path / "smpl_params.npy"))
        params = np.load(
            str(tmp_path / "smpl_params.npy"), allow_pickle=True
        ).item()
        assert params["thetas"].shape == (t, 24, 3)


class TestNpy2SMPL:
    def _save_results(self, smpl, tmp_path, n_samples=2, t=3):
        rs = np.random.RandomState(4)
        motions = []
        for _ in range(n_samples):
            pose = jnp.asarray(rs.randn(t, 24, 3) * 0.1, jnp.float32)
            joints = np.asarray(_fk_joints(smpl, pose, jnp.zeros((t, 3))))
            motions.append(joints.transpose(1, 2, 0))  # [24, 3, T]
        npy_path = str(tmp_path / "results.npy")
        np.save(npy_path, {
            "motion": np.stack(motions), "text": ["a", "b"],
            "lengths": np.full(n_samples, t), "num_samples": n_samples,
        })
        return npy_path

    def test_motion_to_rot_layout(self, smpl):
        # row 24 carries the root xyz; rows 0-23 are valid rotation-6d
        t = 3
        rs = np.random.RandomState(5)
        pose = jnp.asarray(rs.randn(t, 24, 3) * 0.1, jnp.float32)
        joints = np.asarray(_fk_joints(smpl, pose, jnp.zeros((t, 3))))
        out = motion_to_rot(smpl, joints.transpose(1, 2, 0),
                            num_smplify_iters=20)
        assert out.shape == (25, 6, t)
        np.testing.assert_allclose(
            out[24, :3], joints[:, 0].T, rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(out[24, 3:], 0.0)
        # the rot6d rows decode to orthonormal rotation matrices
        mats = np.asarray(
            R.rotation_6d_to_matrix(jnp.asarray(out[:24].transpose(2, 0, 1)))
        )
        eye = np.broadcast_to(np.eye(3), mats.shape)
        np.testing.assert_allclose(
            mats @ mats.transpose(0, 1, 3, 2), eye, atol=1e-5
        )

    def test_npy2smpl_roundtrip(self, smpl, tmp_path):
        npy_path = self._save_results(smpl, tmp_path)
        out_path = npy2smpl(npy_path, smpl, num_smplify_iters=10)
        assert out_path.endswith("_rot.npy")
        data = np.load(out_path, allow_pickle=True).item()
        assert data["motion"].shape == (2, 25, 6, 3)
        # non-motion keys pass through unchanged
        assert data["text"] == ["a", "b"]
        assert data["num_samples"] == 2

    def test_npy2smpl_rejects_rot_input(self, smpl, tmp_path):
        npy_path = str(tmp_path / "results.npy")
        np.save(npy_path, {"motion": np.zeros((1, 25, 6, 4), np.float32)})
        with pytest.raises(ValueError, match="xyz motions"):
            npy2smpl(npy_path, smpl)

    def test_cli_directory_mode(self, smpl, tmp_path, monkeypatch):
        self._save_results(smpl, tmp_path)
        # the CLI falls back to a synthetic SMPL when the pkl is absent;
        # pin its vertex count to the fixture's for determinism
        monkeypatch.setenv("SMPL_MODEL_PATH", str(tmp_path / "missing.pkl"))
        npy2smpl_main([
            "--input_path", str(tmp_path), "--num_smplify_iters", "5",
            "--fix_foot",
        ])
        out = np.load(str(tmp_path / "results_rot.npy"),
                      allow_pickle=True).item()
        assert out["motion"].shape[1:3] == (25, 6)
        # _rot outputs must not be re-consumed on a second pass
        npy2smpl_main([
            "--input_path", str(tmp_path), "--num_smplify_iters", "5",
        ])
        assert not os.path.exists(str(tmp_path / "results_rot_rot.npy"))


class TestMotions2HIK:
    def test_json_structure(self, smpl):
        t = 2
        rs = np.random.RandomState(2)
        pose = jnp.asarray(rs.randn(t, 24, 3) * 0.1, jnp.float32)
        joints = np.asarray(_fk_joints(smpl, pose, jnp.zeros((t, 3))))
        motions = joints.transpose(1, 2, 0)[None]  # [1, 24, 3, T]
        out = motions2hik(motions, smpl, num_smplify_iters=20)
        assert out["num_frames"] == t
        assert out["joint_map"] == HIK_JOINT_MAP
        frame0 = out["frames"][0][0]
        assert "Hips" in frame0 and "HipsTranslation" in frame0
        json.dumps(out)  # JSON-serializable
