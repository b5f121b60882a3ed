"""SMPL LBS, rotation2xyz, and a2m-eval smoke tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gesturediffusion_tpu.eval.eval_a2m import A2MEvaluation
from gesturediffusion_tpu.models.rotation2xyz import rotation2xyz
from gesturediffusion_tpu.models.smpl import make_synthetic_smpl
from gesturediffusion_tpu.ops import rotations as R


@pytest.fixture(scope="module")
def smpl():
    return make_synthetic_smpl(n_vertices=96)


class TestLBS:
    def test_identity_pose_is_rest(self, smpl):
        b = 2
        eye = jnp.broadcast_to(jnp.eye(3), (b, 24, 3, 3))
        betas = jnp.zeros((b, smpl.num_betas))
        verts, joints = smpl.lbs(betas, eye)
        np.testing.assert_allclose(
            verts[0], smpl.v_template, atol=1e-5
        )
        rest_joints = jnp.einsum("jv,vd->jd", smpl.j_regressor,
                                 smpl.v_template)
        np.testing.assert_allclose(joints[0], rest_joints, atol=1e-5)

    def test_global_rotation_rotates_everything(self, smpl):
        """Root rotation (others identity) rotates all verts rigidly
        (zero pose blendshapes for exactness)."""
        smpl0 = smpl.replace(posedirs=jnp.zeros_like(smpl.posedirs))
        b = 1
        rot = R.random_rotations(jax.random.PRNGKey(3), 1)[0]
        mats = jnp.broadcast_to(jnp.eye(3), (b, 24, 3, 3))
        mats = mats.at[:, 0].set(rot)
        betas = jnp.zeros((b, smpl0.num_betas))
        verts_rot, joints_rot = smpl0.lbs(betas, mats)
        verts_id, joints_id = smpl0.lbs(
            betas, jnp.broadcast_to(jnp.eye(3), (b, 24, 3, 3))
        )
        root = joints_id[0, 0]
        expected = (verts_id[0] - root) @ rot.T + root
        np.testing.assert_allclose(verts_rot[0], expected, atol=1e-4)

    def test_betas_change_shape(self, smpl):
        b = 1
        eye = jnp.broadcast_to(jnp.eye(3), (b, 24, 3, 3))
        v0, _ = smpl.lbs(jnp.zeros((b, smpl.num_betas)), eye)
        v1, _ = smpl.lbs(jnp.ones((b, smpl.num_betas)), eye)
        assert float(jnp.abs(v0 - v1).max()) > 1e-4

    def test_forward_dict_contract(self, smpl):
        b = 3
        body = jnp.broadcast_to(jnp.eye(3), (b, 23, 3, 3))
        glob = jnp.broadcast_to(jnp.eye(3), (b, 3, 3))
        out = smpl(body_pose=body, global_orient=glob)
        assert out["vertices"].shape == (b, 96, 3)
        assert out["smpl"].shape == (b, 24, 3)
        assert "a2m" in out  # 45-joint set covers a2m indices

    def test_translation(self, smpl):
        b = 1
        eye = jnp.broadcast_to(jnp.eye(3), (b, 24, 3, 3))
        tr = jnp.asarray([[1.0, 2.0, 3.0]])
        v0, j0 = smpl.lbs(jnp.zeros((b, smpl.num_betas)), eye)
        v1, j1 = smpl.lbs(jnp.zeros((b, smpl.num_betas)), eye, transl=tr)
        np.testing.assert_allclose(v1 - v0, jnp.broadcast_to(tr, v0.shape),
                                   atol=1e-6)


class TestRotation2XYZ:
    def test_xyz_passthrough(self, smpl):
        x = jnp.zeros((2, 24, 3, 8))
        out = rotation2xyz(smpl, x, pose_rep="xyz")
        assert out is x

    def test_rot6d_shapes_and_root_centering(self, smpl):
        b, t = 2, 6
        rs = np.random.RandomState(0)
        aa = rs.randn(b, 24, 3, t).astype(np.float32) * 0.2
        x6 = np.asarray(
            R.matrix_to_rotation_6d(
                R.axis_angle_to_matrix(
                    jnp.asarray(aa.transpose(0, 3, 1, 2))
                )
            )
        ).transpose(0, 2, 3, 1)  # [B, 24, 6, T]
        trans_row = rs.randn(b, 1, 6, t).astype(np.float32)
        x = jnp.asarray(np.concatenate([x6, trans_row], axis=1))
        out = rotation2xyz(
            smpl, x, pose_rep="rot6d", translation=True, glob=True,
            jointstype="smpl", vertstrans=False,
        )
        assert out.shape == (b, 24, 3, t)
        # root centered at origin
        np.testing.assert_allclose(np.asarray(out[:, 0]), 0.0, atol=1e-5)

    def test_vertstrans_adds_translation(self, smpl):
        b, t = 1, 4
        x = np.zeros((b, 25, 6, t), np.float32)
        x[:, :24, 0] = 1.0  # identity-ish 6d [1,0,0,0,1,0]
        x[:, :24, 4] = 1.0
        x[:, 24, 0] = np.arange(t)  # x translation ramp
        out = rotation2xyz(
            smpl, jnp.asarray(x), pose_rep="rot6d", translation=True,
            glob=True, jointstype="smpl", vertstrans=True,
        )
        # root x position follows translation (first frame at origin)
        np.testing.assert_allclose(
            np.asarray(out[0, 0, 0]), np.arange(t), atol=1e-5
        )

    def test_jit(self, smpl):
        x = jnp.zeros((1, 25, 6, 4)).at[:, :24, 0].set(1.0).at[:, :24, 4].set(1.0)
        f = jax.jit(
            lambda xx: rotation2xyz(smpl, xx, pose_rep="rot6d",
                                    translation=True, glob=True,
                                    jointstype="smpl", vertstrans=False)
        )
        out = f(x)
        assert bool(jnp.all(jnp.isfinite(out)))


class TestA2MEvalSmoke:
    def test_gen_equals_gt_gives_zero_fid(self):
        ev = A2MEvaluation(input_size_raw=72, num_classes=12)
        rs = np.random.RandomState(0)
        batches = [
            {
                "output_xyz": rs.randn(8, 24, 3, 20).astype(np.float32),
                "lengths": np.full((8,), 20, np.int64),
                "y": rs.randint(0, 12, 8),
            }
            for _ in range(3)
        ]
        metrics = ev.evaluate({"gt": batches, "gen": batches})
        assert abs(metrics["fid_gen"]) < 1e-4
        assert metrics["accuracy_gt"] == metrics["accuracy_gen"]
        assert metrics["diversity_gt"] > 0
        assert np.isfinite(metrics["multimodality_gt"])


class TestSyntheticPickleRoundTrip:
    def test_vertex_ids_and_extra_regressor_survive(self, tmp_path):
        """The synthetic pkl persists its surface-joint ids + vibe
        regressor; without them the loader's constant 6890-vertex id
        table would be silently CLAMPED by JAX gathers on a 96-vertex
        mesh (21 joints all reading vertex 95)."""
        from gesturediffusion_tpu.models.smpl import (
            load_smpl_pickle,
            make_synthetic_smpl,
            save_synthetic_smpl_pickle,
        )

        p = str(tmp_path / "smpl.pkl")
        save_synthetic_smpl_pickle(p, n_vertices=96, seed=3)
        ref = make_synthetic_smpl(n_vertices=96, seed=3)
        got = load_smpl_pickle(p)
        assert got.vertex_joint_ids == ref.vertex_joint_ids
        assert max(got.vertex_joint_ids) < 96
        np.testing.assert_allclose(
            np.asarray(got.j_regressor_extra),
            np.asarray(ref.j_regressor_extra), rtol=1e-6,
        )

    def test_small_official_layout_remaps_ids_in_range(self, tmp_path):
        """An official-layout pkl (no vertex_joint_ids key) smaller than
        the real mesh must get deterministic in-range ids, not clamped
        gathers."""
        import pickle

        from gesturediffusion_tpu.models.smpl import (
            load_smpl_pickle,
            save_synthetic_smpl_pickle,
        )

        p = str(tmp_path / "smpl.pkl")
        save_synthetic_smpl_pickle(p, n_vertices=96, seed=0)
        with open(p, "rb") as f:
            data = pickle.load(f)
        del data["vertex_joint_ids"], data["J_regressor_extra"]
        with open(p, "wb") as f:
            pickle.dump(data, f)
        got = load_smpl_pickle(p)
        assert max(got.vertex_joint_ids) < 96
        assert len(set(got.vertex_joint_ids)) > 1  # not one clamped vertex
