"""Kinematic-chain skeleton with forward/inverse kinematics, in JAX.

Functional parity surface with the reference Skeleton class
(reference: data_loaders/humanml/common/skeleton.py — get_offsets_joints:43,
inverse_kinematics_np:55, forward_kinematics*:104-194).

TPU design: kinematic chains are static metadata, so the per-chain
accumulation unrolls at trace time into a short sequence of batched
(B, 3, 3) matmuls/quaternion products — static shapes, no host loop at run
time, fully jit/vmap-able.  Inverse kinematics is a host-side preprocessing
step and is provided in numpy.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from gesturediffusion_tpu.ops import quaternion as quat_ops
from gesturediffusion_tpu.ops.quaternion_np import (
    qbetween_np as _qbetween_np,
    qinv_np as _qinv_np,
    qmul_np as _qmul_np,
)


def parents_from_chains(num_joints: int, chains: Sequence[Sequence[int]]) -> list[int]:
    parents = [0] * num_joints
    parents[0] = -1
    for chain in chains:
        for j in range(1, len(chain)):
            parents[chain[j]] = chain[j - 1]
    return parents


@dataclasses.dataclass(frozen=True)
class Skeleton:
    """Static skeleton topology + per-joint raw offset directions.

    ``raw_offsets``: (J, 3) unit offset directions (static, numpy).
    ``kinematic_tree``: tuple of chains; each chain starts at (or hangs off)
    the root and lists joint indices along one limb.
    """

    raw_offsets: np.ndarray
    kinematic_tree: tuple[tuple[int, ...], ...]

    def __post_init__(self):
        object.__setattr__(self, "raw_offsets", np.asarray(self.raw_offsets, np.float32))
        object.__setattr__(
            self, "kinematic_tree", tuple(tuple(c) for c in self.kinematic_tree)
        )

    @property
    def njoints(self) -> int:
        return self.raw_offsets.shape[0]

    @property
    def parents(self) -> list[int]:
        return parents_from_chains(self.njoints, self.kinematic_tree)

    # ------------------------------------------------------------------ #
    # Offsets
    # ------------------------------------------------------------------ #
    def get_offsets_joints(self, joints: np.ndarray) -> np.ndarray:
        """Scale raw offset directions by the bone lengths of one pose (J, 3)."""
        joints = np.asarray(joints)
        offsets = self.raw_offsets.astype(np.float64).copy()
        parents = self.parents
        for i in range(1, self.njoints):
            offsets[i] = (
                np.linalg.norm(joints[i] - joints[parents[i]]) * offsets[i]
            )
        return offsets.astype(np.float32)

    # ------------------------------------------------------------------ #
    # Forward kinematics (JAX, jit/vmap friendly)
    # ------------------------------------------------------------------ #
    def forward_kinematics(
        self,
        quat_params: jax.Array,
        root_pos: jax.Array,
        offsets: jax.Array,
        do_root_R: bool = True,
    ) -> jax.Array:
        """FK from local joint quaternions.

        quat_params: (B, J, 4); root_pos: (B, 3); offsets: (J, 3) or (B, J, 3).
        Returns joint positions (B, J, 3).
        """
        if offsets.ndim == 2:
            offsets = jnp.broadcast_to(offsets, quat_params.shape[:-2] + offsets.shape)
        joints = [None] * self.njoints
        joints[0] = root_pos
        for chain in self.kinematic_tree:
            if do_root_R:
                R = quat_params[:, 0]
            else:
                R = jnp.broadcast_to(
                    jnp.asarray([1.0, 0.0, 0.0, 0.0], quat_params.dtype),
                    quat_params[:, 0].shape,
                )
            for i in range(1, len(chain)):
                R = quat_ops.qmul(R, quat_params[:, chain[i]])
                joints[chain[i]] = (
                    quat_ops.qrot(R, offsets[:, chain[i]]) + joints[chain[i - 1]]
                )
        return jnp.stack(joints, axis=1)

    def forward_kinematics_cont6d(
        self,
        cont6d_params: jax.Array,
        root_pos: jax.Array,
        offsets: jax.Array,
        do_root_R: bool = True,
    ) -> jax.Array:
        """FK from column-convention 6D local rotations.

        cont6d_params: (B, J, 6); root_pos: (B, 3); offsets: (J, 3) or (B, J, 3).
        Returns joint positions (B, J, 3).  The per-chain rotation
        accumulation is an unrolled sequence of batched 3x3 matmuls.
        """
        if offsets.ndim == 2:
            offsets = jnp.broadcast_to(
                offsets, cont6d_params.shape[:-2] + offsets.shape
            )
        mats = quat_ops.cont6d_to_matrix(cont6d_params)  # (B, J, 3, 3)
        joints = [None] * self.njoints
        joints[0] = root_pos
        eye = jnp.broadcast_to(
            jnp.eye(3, dtype=cont6d_params.dtype), mats[:, 0].shape
        )
        # 3x3 chains accumulate error fast in reduced precision — pin HIGHEST.
        mm = lambda a, b: jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)
        for chain in self.kinematic_tree:
            matR = mats[:, 0] if do_root_R else eye
            for i in range(1, len(chain)):
                matR = mm(matR, mats[:, chain[i]])
                offset_vec = offsets[:, chain[i]][..., None]
                joints[chain[i]] = mm(matR, offset_vec)[..., 0] + joints[chain[i - 1]]
        return jnp.stack(joints, axis=1)

    # ------------------------------------------------------------------ #
    # Inverse kinematics (host-side preprocessing, numpy)
    # ------------------------------------------------------------------ #
    def inverse_kinematics_np(
        self,
        joints: np.ndarray,
        face_joint_idx: Sequence[int],
        smooth_forward: bool = False,
    ) -> np.ndarray:
        """Joint positions (T, J, 3) -> local quaternions (T, J, 4).

        face_joint_idx order: (r_hip, l_hip, r_shoulder, l_shoulder) — used to
        derive the root facing direction.
        """
        assert len(face_joint_idx) == 4
        l_hip, r_hip, sdr_r, sdr_l = face_joint_idx
        across = (joints[:, r_hip] - joints[:, l_hip]) + (
            joints[:, sdr_r] - joints[:, sdr_l]
        )
        across = across / np.linalg.norm(across, axis=-1, keepdims=True)

        forward = np.cross(np.array([[0.0, 1.0, 0.0]]), across, axis=-1)
        if smooth_forward:
            import scipy.ndimage

            forward = scipy.ndimage.gaussian_filter1d(
                forward, 20, axis=0, mode="nearest"
            )
        forward = forward / np.linalg.norm(forward, axis=-1, keepdims=True)

        target = np.tile(np.array([[0.0, 0.0, 1.0]]), (len(forward), 1))
        root_quat = _qbetween_np(forward, target)

        quat_params = np.zeros(joints.shape[:-1] + (4,))
        root_quat[0] = np.array([1.0, 0.0, 0.0, 0.0])
        quat_params[:, 0] = root_quat
        for chain in self.kinematic_tree:
            R = root_quat
            for j in range(len(chain) - 1):
                u = np.tile(self.raw_offsets[chain[j + 1]][None], (len(joints), 1))
                v = joints[:, chain[j + 1]] - joints[:, chain[j]]
                v = v / np.linalg.norm(v, axis=-1, keepdims=True)
                rot_u_v = _qbetween_np(u, v)
                R_loc = _qmul_np(_qinv_np(R), rot_u_v)
                quat_params[:, chain[j + 1]] = R_loc
                R = _qmul_np(R, R_loc)
        return quat_params

