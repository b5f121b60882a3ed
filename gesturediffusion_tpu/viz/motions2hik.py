"""Model output -> HumanIK joint rotations JSON (Maya / MotionBuilder).

Functional parity surface with the reference converter
(reference: visualize/motions2hik.py:13-103 — SMPL->HIK joint name map,
SMPLify fit for xyz inputs, rotation-matrix -> euler degrees).
"""

from __future__ import annotations

import numpy as np

from gesturediffusion_tpu.models.smpl import SMPLModel
from gesturediffusion_tpu.ops import rotations as R

# SMPL joint index -> HumanIK joint name (first 22 SMPL joints)
HIK_JOINT_MAP = [
    "Hips", "LeftUpLeg", "RightUpLeg", "Spine", "LeftLeg", "RightLeg",
    "Spine1", "LeftFoot", "RightFoot", "Spine2", "LeftToeBase",
    "RightToeBase", "Neck", "LeftShoulder", "RightShoulder", "Head",
    "LeftArm", "RightArm", "LeftForeArm", "RightForeArm", "LeftHand",
    "RightHand",
]


def motions2hik(
    motions: np.ndarray,  # [num_reps, num_joints, 3, num_frames] xyz
    smpl: SMPLModel,
    num_smplify_iters: int = 150,
) -> dict:
    """xyz motions -> JSON-serializable dict of per-joint euler rotations."""
    import jax.numpy as jnp

    from gesturediffusion_tpu.viz.joints2smpl import joints2smpl

    nreps, njoints, nfeats, nframes = motions.shape
    thetas, root_translation = [], []
    for rep_idx in range(nreps):
        rep = motions[rep_idx].transpose(2, 0, 1)  # [T, J, 3]
        fit = joints2smpl(smpl, rep, num_smplify_iters=num_smplify_iters)
        aa = jnp.asarray(fit["thetas"])  # [T, 24, 3]
        mats = R.axis_angle_to_matrix(aa)
        eulers = np.degrees(
            np.asarray(R.matrix_to_euler_angles(mats, "XYZ"))
        )  # [T, 24, 3]
        thetas.append(eulers[:, : len(HIK_JOINT_MAP)])
        root_translation.append(fit["root_translation"])

    thetas = np.stack(thetas)  # [R, T, 22, 3]
    root_translation = np.stack(root_translation)

    frames = []
    for rep_idx in range(nreps):
        rep_frames = []
        for f in range(nframes):
            joints = {
                name: thetas[rep_idx, f, j].tolist()
                for j, name in enumerate(HIK_JOINT_MAP)
            }
            joints["HipsTranslation"] = root_translation[rep_idx, f].tolist()
            rep_frames.append(joints)
        frames.append(rep_frames)

    return {
        "joint_map": HIK_JOINT_MAP,
        "num_repetitions": nreps,
        "num_frames": nframes,
        "frames": frames,
    }
