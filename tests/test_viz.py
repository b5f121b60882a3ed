"""Visualization/export tests: SMPLify fit, OBJ export, HumanIK JSON."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gesturediffusion_tpu.models.smpl import make_synthetic_smpl
from gesturediffusion_tpu.ops import rotations as R
from gesturediffusion_tpu.viz.joints2smpl import _fk_joints, joints2smpl
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
