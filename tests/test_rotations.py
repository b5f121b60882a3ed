"""Geometry kernel tests: round-trips, group identities, FK sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gesturediffusion_tpu.ops import quaternion as Q
from gesturediffusion_tpu.ops import rotations as R
from gesturediffusion_tpu.ops.skeleton import Skeleton


KEY = jax.random.PRNGKey(0)


def _random_rotmats(n=64):
    return R.random_rotations(jax.random.PRNGKey(7), n)


class TestRotations:
    def test_quaternion_matrix_roundtrip(self):
        q = R.random_quaternions(KEY, 128)
        q = R.standardize_quaternion(q)
        m = R.quaternion_to_matrix(q)
        q2 = R.standardize_quaternion(R.matrix_to_quaternion(m))
        np.testing.assert_allclose(q, q2, atol=1e-4)

    def test_matrix_is_rotation(self):
        m = _random_rotmats()
        eye = jnp.broadcast_to(jnp.eye(3), m.shape)
        np.testing.assert_allclose(m @ jnp.swapaxes(m, -1, -2), eye, atol=1e-5)
        np.testing.assert_allclose(jnp.linalg.det(m), 1.0, atol=1e-5)

    def test_rotation_6d_roundtrip(self):
        m = _random_rotmats()
        d6 = R.matrix_to_rotation_6d(m)
        m2 = R.rotation_6d_to_matrix(d6)
        np.testing.assert_allclose(m, m2, atol=1e-5)

    def test_axis_angle_roundtrip(self):
        aa = jax.random.normal(KEY, (64, 3)) * 0.8
        m = R.axis_angle_to_matrix(aa)
        aa2 = R.matrix_to_axis_angle(m)
        # the recovered vector may be a 2π-equivalent representation;
        # compare as rotations
        m2 = R.axis_angle_to_matrix(aa2)
        np.testing.assert_allclose(m, m2, atol=1e-4)

    def test_axis_angle_small_angle_stable(self):
        aa = jnp.asarray([[1e-8, 0.0, 0.0], [0.0, 0.0, 0.0]])
        q = R.axis_angle_to_quaternion(aa)
        assert bool(jnp.all(jnp.isfinite(q)))
        np.testing.assert_allclose(q[1], jnp.asarray([1.0, 0, 0, 0]), atol=1e-7)

    def test_euler_roundtrip(self):
        e = jax.random.uniform(KEY, (64, 3), minval=-1.0, maxval=1.0)
        for conv in ["XYZ", "ZYX", "XZY"]:
            m = R.euler_angles_to_matrix(e, conv)
            e2 = R.matrix_to_euler_angles(m, conv)
            m2 = R.euler_angles_to_matrix(e2, conv)
            np.testing.assert_allclose(m, m2, atol=1e-5)

    def test_quaternion_apply_matches_matrix(self):
        q = R.random_quaternions(KEY, 32)
        p = jax.random.normal(jax.random.PRNGKey(1), (32, 3))
        via_q = R.quaternion_apply(q, p)
        via_m = jnp.einsum("bij,bj->bi", R.quaternion_to_matrix(q), p)
        np.testing.assert_allclose(via_q, via_m, atol=1e-5)

    @pytest.mark.skipif(
        not __import__("os").path.exists("/root/reference/utils/rotation_conversions.py"),
        reason="reference not mounted",
    )
    def test_golden_vs_reference_torch(self):
        """Cross-check 6D/quaternion conversions against the reference impl."""
        import importlib.util

        import torch

        spec = importlib.util.spec_from_file_location(
            "ref_rot", "/root/reference/utils/rotation_conversions.py"
        )
        ref = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref)

        q = np.asarray(R.random_quaternions(KEY, 64))
        ours_m = np.asarray(R.quaternion_to_matrix(jnp.asarray(q)))
        ref_m = ref.quaternion_to_matrix(torch.from_numpy(q)).numpy()
        np.testing.assert_allclose(ours_m, ref_m, atol=1e-5)

        d6 = np.random.RandomState(0).randn(64, 6).astype(np.float32)
        ours = np.asarray(R.rotation_6d_to_matrix(jnp.asarray(d6)))
        refm = ref.rotation_6d_to_matrix(torch.from_numpy(d6)).numpy()
        np.testing.assert_allclose(ours, refm, atol=1e-5)

        m = ref_m
        ours_q = np.asarray(R.matrix_to_quaternion(jnp.asarray(m)))
        ref_q = ref.matrix_to_quaternion(torch.from_numpy(m)).numpy()
        np.testing.assert_allclose(ours_q, ref_q, atol=1e-4)

        aa = np.random.RandomState(1).randn(64, 3).astype(np.float32)
        ours_aa = np.asarray(R.axis_angle_to_matrix(jnp.asarray(aa)))
        ref_aa = ref.axis_angle_to_matrix(torch.from_numpy(aa)).numpy()
        np.testing.assert_allclose(ours_aa, ref_aa, atol=1e-5)


class TestNumpyTwins:
    def test_matrix_to_axis_angle_np_matches_jax(self):
        """Host-side loaders (data/uestc.py view correction) must get the
        same conversion as the device path — pure numpy, no round-trip."""
        from gesturediffusion_tpu.ops.rotations_np import (
            matrix_to_axis_angle_np,
        )

        m = np.asarray(_random_rotmats(96), np.float64)
        got = matrix_to_axis_angle_np(m)
        want = np.asarray(R.matrix_to_axis_angle(jnp.asarray(m)))
        np.testing.assert_allclose(got, want, atol=1e-5)
        # identity edge case (zero angle)
        eye = np.broadcast_to(np.eye(3), (4, 3, 3))
        np.testing.assert_allclose(
            matrix_to_axis_angle_np(eye), np.zeros((4, 3)), atol=1e-7
        )


class TestQuaternionToolbox:
    def test_qmul_matches_matrix_composition(self):
        q1 = R.random_quaternions(KEY, 32)
        q2 = R.random_quaternions(jax.random.PRNGKey(3), 32)
        m = R.quaternion_to_matrix(Q.qmul(q1, q2))
        m2 = R.quaternion_to_matrix(q1) @ R.quaternion_to_matrix(q2)
        np.testing.assert_allclose(m, m2, atol=1e-5)

    def test_qrot_matches_matrix(self):
        q = R.random_quaternions(KEY, 32)
        v = jax.random.normal(jax.random.PRNGKey(5), (32, 3))
        np.testing.assert_allclose(
            Q.qrot(q, v),
            jnp.einsum("bij,bj->bi", R.quaternion_to_matrix(q), v),
            atol=1e-5,
        )

    def test_qfix_continuity(self):
        q = R.random_quaternions(KEY, 20).reshape(20, 1, 4)
        # introduce sign flips
        q = q.at[5::3].multiply(-1)
        fixed = Q.qfix(q)
        dots = jnp.sum(fixed[1:] * fixed[:-1], axis=-1)
        assert bool(jnp.all(dots >= -1e-6))

    def test_cont6d_roundtrip(self):
        q = R.random_quaternions(KEY, 64)
        c6 = Q.quaternion_to_cont6d(q)
        m = Q.cont6d_to_matrix(c6)
        np.testing.assert_allclose(m, R.quaternion_to_matrix(q), atol=1e-5)

    def test_qbetween(self):
        v0 = jax.random.normal(KEY, (32, 3))
        v1 = jax.random.normal(jax.random.PRNGKey(9), (32, 3))
        q = Q.qbetween(v0, v1)
        rotated = Q.qrot(q, v0)
        # directions should match after rotation
        d1 = rotated / jnp.linalg.norm(rotated, axis=-1, keepdims=True)
        d2 = v1 / jnp.linalg.norm(v1, axis=-1, keepdims=True)
        np.testing.assert_allclose(d1, d2, atol=1e-4)

    def test_qslerp_endpoints(self):
        q0 = R.random_quaternions(KEY, 8)
        q1 = R.random_quaternions(jax.random.PRNGKey(11), 8)
        out = Q.qslerp(q0, q1, jnp.asarray([0.0, 1.0]))
        m_out0 = R.quaternion_to_matrix(out[0])
        m_out1 = R.quaternion_to_matrix(out[1])
        np.testing.assert_allclose(m_out0, R.quaternion_to_matrix(q0), atol=1e-4)
        np.testing.assert_allclose(m_out1, R.quaternion_to_matrix(q1), atol=1e-4)


# 5-joint toy chain: root -> spine -> head; root -> l_leg; root -> r_leg
TOY_OFFSETS = np.array(
    [
        [0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0],
        [0.0, 1.0, 0.0],
        [1.0, 0.0, 0.0],
        [-1.0, 0.0, 0.0],
    ],
    np.float32,
)
TOY_CHAINS = ((0, 1, 2), (0, 3), (0, 4))


class TestSkeleton:
    def test_fk_identity_rotations(self):
        sk = Skeleton(TOY_OFFSETS, TOY_CHAINS)
        quats = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (2, 5, 1))
        root = jnp.zeros((2, 3))
        joints = sk.forward_kinematics(quats, root, jnp.asarray(TOY_OFFSETS))
        expected = np.array(
            [[0, 0, 0], [0, 1, 0], [0, 2, 0], [1, 0, 0], [-1, 0, 0]], np.float32
        )
        np.testing.assert_allclose(joints[0], expected, atol=1e-6)

    def test_fk_quat_cont6d_agree(self):
        sk = Skeleton(TOY_OFFSETS, TOY_CHAINS)
        q = R.random_quaternions(KEY, 2 * 5).reshape(2, 5, 4)
        root = jax.random.normal(jax.random.PRNGKey(2), (2, 3))
        c6 = Q.quaternion_to_cont6d(q)
        j_q = sk.forward_kinematics(q, root, jnp.asarray(TOY_OFFSETS))
        j_6 = sk.forward_kinematics_cont6d(c6, root, jnp.asarray(TOY_OFFSETS))
        np.testing.assert_allclose(j_q, j_6, atol=1e-4)

    def test_ik_fk_roundtrip(self):
        sk = Skeleton(TOY_OFFSETS, TOY_CHAINS)
        # build a posed skeleton via FK from moderate random rotations
        aa = np.asarray(
            jax.random.normal(jax.random.PRNGKey(21), (3, 5, 3))
        ) * 0.3
        q = R.axis_angle_to_quaternion(jnp.asarray(aa))
        root = np.zeros((3, 3), np.float32)
        joints = np.asarray(
            sk.forward_kinematics(q, jnp.asarray(root), jnp.asarray(TOY_OFFSETS))
        )
        # IK needs 4 face joints (l_hip, r_hip, sdr_r, sdr_l); reuse the two
        # legs for both pairs, oriented so `across` is nonzero
        quat_params = sk.inverse_kinematics_np(joints, (3, 4, 4, 3))
        j2 = np.asarray(
            sk.forward_kinematics(
                jnp.asarray(quat_params, jnp.float32),
                jnp.asarray(joints[:, 0]),
                jnp.asarray(TOY_OFFSETS),
            )
        )
        # frame 0's root quaternion is forced to identity by IK, so only
        # frames >= 1 round-trip exactly
        np.testing.assert_allclose(j2[1:], joints[1:], atol=1e-3)

    def test_fk_jit_and_vmap(self):
        sk = Skeleton(TOY_OFFSETS, TOY_CHAINS)
        q = R.random_quaternions(KEY, 4 * 5).reshape(4, 5, 4)
        root = jnp.zeros((4, 3))
        fk = jax.jit(lambda qq, rr: sk.forward_kinematics(qq, rr, jnp.asarray(TOY_OFFSETS)))
        np.testing.assert_allclose(
            fk(q, root), sk.forward_kinematics(q, root, jnp.asarray(TOY_OFFSETS)), atol=1e-6
        )
