"""Rotation representation -> XYZ joints via SMPL forward kinematics.

Functional parity surface with the reference adapter — whose body is
gutted to a passthrough in the fork but survives as comments and is still
called by a2m eval and geometric losses (reference:
model/rotation2xyz.py:20-94, call sites eval/a2m/gru_eval.py:39-41 and
diffusion/gaussian_diffusion.py:1244-1248).  This restores the full
ACTOR-derived path: pose-rep -> rotation matrices -> SMPL LBS -> joint-set
selection -> root centering -> optional translation.

TPU design: the frame mask is handled by computing all frames and zeroing
masked ones (static shapes; the reference gathers masked frames, which is
dynamic-shape-hostile), numerically identical downstream because consumers
mask too.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from gesturediffusion_tpu.models.smpl import JOINTSTYPE_ROOT, SMPLModel
from gesturediffusion_tpu.ops import rotations as geometry

JOINTSTYPES = ("a2m", "a2mpl", "smpl", "vibe", "vertices")


def rotation2xyz(
    smpl: SMPLModel,
    x: jax.Array,  # [B, J(+1 translation row), F, T]
    mask: Optional[jax.Array] = None,  # [B, T] bool
    pose_rep: str = "rot6d",
    translation: bool = True,
    glob: bool = True,
    jointstype: str = "smpl",
    vertstrans: bool = False,
    betas: Optional[jax.Array] = None,
    beta: float = 0.0,
    glob_rot: Optional[tuple] = None,
    get_rotations_back: bool = False,
):
    """x rotations -> xyz joints [B, J', 3, T]."""
    if pose_rep == "xyz":
        return x
    if jointstype not in JOINTSTYPES:
        raise NotImplementedError("This jointstype is not implemented.")
    if not glob and glob_rot is None:
        raise TypeError("You must specify global rotation if glob is False")

    if translation:
        x_translations = x[:, -1, :3]  # [B, 3, T]
        x_rotations = x[:, :-1]
    else:
        x_translations = None
        x_rotations = x

    x_rotations = x_rotations.transpose(0, 3, 1, 2)  # [B, T, J, F]
    nsamples, time, njoints, feats = x_rotations.shape
    flat = x_rotations.reshape(nsamples * time, njoints, feats)

    if pose_rep == "rotvec":
        rotations = geometry.axis_angle_to_matrix(flat)
    elif pose_rep == "rotmat":
        rotations = flat.reshape(-1, njoints, 3, 3)
    elif pose_rep == "rotquat":
        rotations = geometry.quaternion_to_matrix(flat)
    elif pose_rep == "rot6d":
        rotations = geometry.rotation_6d_to_matrix(flat)
    else:
        raise NotImplementedError("No geometry for this one.")

    if not glob:
        global_orient = geometry.axis_angle_to_matrix(
            jnp.asarray(glob_rot, rotations.dtype)
        )
        global_orient = jnp.broadcast_to(
            global_orient, (rotations.shape[0], 3, 3)
        )
    else:
        global_orient = rotations[:, 0]
        rotations = rotations[:, 1:]

    if betas is None:
        betas = jnp.zeros(
            (rotations.shape[0], smpl.num_betas), rotations.dtype
        )
        betas = betas.at[:, 1].set(beta)

    out = smpl(
        body_pose=rotations, global_orient=global_orient, betas=betas
    )
    joints = out[jointstype]  # [B*T, J', 3]

    x_xyz = joints.reshape(nsamples, time, joints.shape[1], 3)
    if mask is not None:
        x_xyz = jnp.where(mask[:, :, None, None], x_xyz, 0.0)
    x_xyz = x_xyz.transpose(0, 2, 3, 1)  # [B, J', 3, T]

    # root at origin for the prediction
    if jointstype != "vertices":
        rootindex = JOINTSTYPE_ROOT[jointstype]
        x_xyz = x_xyz - x_xyz[:, rootindex : rootindex + 1]

    if translation and vertstrans:
        x_translations = x_translations - x_translations[:, :, 0:1]
        x_xyz = x_xyz + x_translations[:, None]

    if get_rotations_back:
        return x_xyz, rotations, global_orient
    return x_xyz


class Rotation2xyz:
    """Object wrapper matching the reference call signature."""

    def __init__(self, smpl: SMPLModel, dataset: str = "amass"):
        self.smpl_model = smpl
        self.dataset = dataset

    def __call__(self, x, mask=None, **kwargs):
        return rotation2xyz(self.smpl_model, x, mask, **kwargs)
