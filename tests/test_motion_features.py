"""HumanML feature codec: forward extraction vs inverse recovery."""

import jax.numpy as jnp
import numpy as np
import pytest

from gesturediffusion_tpu.ops.motion_features import process_file
from gesturediffusion_tpu.ops.motion_process import recover_from_ric
from gesturediffusion_tpu.ops.quaternion_np import qrot_np
from gesturediffusion_tpu.ops.rotations_np import axis_angle_to_quaternion_np
from gesturediffusion_tpu.ops.skeleton import Skeleton
from gesturediffusion_tpu.utils import paramutil


def synthetic_t2m_joints(t=24, seed=0):
    """Plausible 22-joint motion via FK of the t2m skeleton."""
    rs = np.random.RandomState(seed)
    skel = Skeleton(
        paramutil.t2m_raw_offsets,
        tuple(tuple(c) for c in paramutil.t2m_kinematic_chain),
    )
    # bone lengths ~0.3, slight per-frame wiggle around a neutral pose
    offsets = paramutil.t2m_raw_offsets.astype(np.float64) * 0.3
    aa = rs.randn(t, 22, 3) * 0.08
    aa[:, 0] = 0  # small root rotation only
    quats = axis_angle_to_quaternion_np(aa)
    root_pos = np.cumsum(rs.randn(t, 3) * 0.01, axis=0)
    root_pos[:, 1] += 0.9  # hip height
    joints = np.zeros((t, 22, 3))
    joints[:, 0] = root_pos
    for chain in skel.kinematic_tree:
        R = quats[:, 0]
        from gesturediffusion_tpu.ops.quaternion_np import qmul_np

        for i in range(1, len(chain)):
            R = qmul_np(R, quats[:, chain[i]])
            joints[:, chain[i]] = (
                qrot_np(R, np.tile(offsets[chain[i]], (t, 1)))
                + joints[:, chain[i - 1]]
            )
    return joints, offsets


class TestProcessFile:
    def test_feature_dims(self):
        joints, offsets = synthetic_t2m_joints()
        data, glob, local, lvel = process_file(joints, 0.002, offsets)
        # 263 = 4 + 21*3 + 21*6 + 22*3 + 4
        assert data.shape == (23, 263)
        assert np.all(np.isfinite(data))
        assert glob.shape == (24, 22, 3)

    def test_roundtrip_with_recover_from_ric(self):
        """RIC features must decode back to the aligned global positions."""
        joints, offsets = synthetic_t2m_joints(t=30, seed=3)
        data, global_positions, _, _ = process_file(joints, 0.002, offsets)
        recovered = np.asarray(
            recover_from_ric(jnp.asarray(data, jnp.float32), 22)
        )
        # frames 0..T-2 recoverable (velocities consume one frame)
        err = np.abs(recovered[:-1] - global_positions[:-2]).max()
        assert err < 2e-2, f"roundtrip error {err}"

    def test_foot_contact_labels_binary(self):
        joints, offsets = synthetic_t2m_joints(t=16, seed=5)
        data, *_ = process_file(joints, 0.002, offsets)
        fc = data[:, -4:]
        assert set(np.unique(fc)).issubset({0.0, 1.0})
