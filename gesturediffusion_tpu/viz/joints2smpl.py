"""SMPLify: fit SMPL pose parameters to 3D joint positions, in JAX.

Functional parity surface with the reference fitting stack
(reference: visualize/simplify_loc2rot.py:13-59 joints2smpl (150 iters,
22-joint xyz -> SMPL thetas), visualize/joints2smpl/src/smplify.py:44
SMPLify3D two-stage optimization — camera/global stage then body stage;
visualize/joints2smpl/src/customloss.py:128 body_fitting_loss_3d with
gmof robust joint loss, GMM pose prior (prior.py:99 over gmm_08.pkl),
knee/elbow angle prior).

TPU design: the reference's LBFGS loops become a jitted optax adam loop
(value_and_grad through the LBS); the whole fit runs on device with all
frames batched.  When gmm_08.pkl is absent a plain L2 body-pose prior
stands in (loudly logged).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gesturediffusion_tpu.models.smpl import SMPLModel
from gesturediffusion_tpu.ops import rotations as R
from gesturediffusion_tpu.viz.prior import (
    MaxMixturePrior,
    angle_prior,
    load_gmm_prior,
)

# default gmm_08.pkl location (prepare/README.md asset table); override
# with the GMM_PRIOR_PATH env var
DEFAULT_GMM_PRIOR_PATH = "body_models/joints2smpl/gmm_08.pkl"

# reference: customloss.py:132-134
POSE_PRIOR_WEIGHT = 4.78 * 1.5
ANGLE_PRIOR_WEIGHT = 15.2
JOINT_LOSS_WEIGHT = 500.0
GMOF_SIGMA = 100.0


def gmof(x: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Geman–McClure robust error (reference: customloss.py:12-19)."""
    x2 = x**2
    s2 = sigma**2
    return (s2 * x2) / (s2 + x2)


def _fk_joints(smpl: SMPLModel, pose_aa: jax.Array, transl: jax.Array):
    """axis-angle pose [B, 24, 3] + transl [B, 3] -> 24 SMPL joints."""
    mats = R.axis_angle_to_matrix(pose_aa)
    _, joints = smpl.lbs(
        jnp.zeros((pose_aa.shape[0], smpl.num_betas)), mats, transl
    )
    return joints


@functools.lru_cache(maxsize=8)
def _make_stage_runner(lr: float, num_iters: int, pose_prior):
    """Build the jitted two-stage SMPLify runner ONCE per
    (lr, num_iters, prior) — defining it inside joints2smpl created a
    fresh closure per call, so jit's cache never hit and the 150-step
    optimization scan recompiled on every repetition/clip."""
    tx = optax.adam(lr)

    @functools.partial(jax.jit, static_argnames=("fit_pose",))
    def run_stage(smpl, target, subset, params, *, fit_pose: bool):
        def keypoint_err(params):
            pose, transl = params
            pred = _fk_joints(smpl, pose, transl)
            err = pred[:, subset] - target[:, subset]
            return jnp.mean(jnp.sum(err**2, -1))

        def objective(params):
            pose, transl = params
            pred = _fk_joints(smpl, pose, transl)
            err = pred[:, subset] - target[:, subset]
            if not fit_pose:
                # stage 1 (camera/global): plain squared 3D keypoint error
                # (reference: smplify.py:168, customloss.py:191-222)
                return jnp.mean(jnp.sum(err**2, -1))
            # stage 2 (body): reference body_fitting_loss_3d form
            joint_loss = (JOINT_LOSS_WEIGHT**2) * jnp.sum(
                gmof(err, GMOF_SIGMA), axis=(-1, -2)
            )
            body = pose[:, 1:].reshape(pose.shape[0], -1)
            ang = (ANGLE_PRIOR_WEIGHT**2) * jnp.sum(angle_prior(body), -1)
            if pose_prior is not None:
                pp = (POSE_PRIOR_WEIGHT**2) * pose_prior(body)
            else:
                pp = (POSE_PRIOR_WEIGHT**2) * jnp.sum(body**2, -1)
            return jnp.sum(joint_loss + ang + pp)

        opt_state = tx.init(params)

        def step(carry, _):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(objective)(params)
            if not fit_pose:
                # stage 1: only global orient + translation move
                gp, gt = grads
                gp = gp.at[:, 1:].set(0.0)
                grads = (gp, gt)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, _), _ = jax.lax.scan(
            step, (params, opt_state), None, length=num_iters
        )
        return params, keypoint_err(params)

    return run_stage


def joints2smpl(
    smpl: SMPLModel,
    joints: np.ndarray,  # [T, J>=22, 3] target joint positions
    num_smplify_iters: int = 150,
    lr: float = 0.02,
    init_pose: Optional[np.ndarray] = None,
    joint_subset: Optional[np.ndarray] = None,
    pose_prior: Optional[MaxMixturePrior] = None,
) -> dict:
    """Fit per-frame SMPL axis-angle poses + root translation to joints.

    Stage 2 uses the reference's body-fitting objective
    (customloss.py:128-188): gmof robust joint loss + GMM pose prior +
    knee/elbow angle prior.  When `pose_prior` is not given, gmm_08.pkl
    is loaded automatically from $GMM_PRIOR_PATH (default
    body_models/joints2smpl/gmm_08.pkl); only if that asset is absent
    does an L2 body-pose prior substitute (logged loudly).

    Returns {'thetas': [T, 24, 3] axis-angle, 'root_translation': [T, 3],
    'loss': keypoint mean-squared error after each stage}.
    """
    if pose_prior is None:
        # wire the reference prior automatically when the asset is present
        pose_prior = load_gmm_prior(
            os.environ.get("GMM_PRIOR_PATH", DEFAULT_GMM_PRIOR_PATH)
        )
    if pose_prior is None:
        from gesturediffusion_tpu.utils import logger as log_lib

        log_lib.log(
            "WARNING: joints2smpl running WITHOUT the GMM pose prior "
            "(gmm_08.pkl not found at $GMM_PRIOR_PATH or "
            f"{DEFAULT_GMM_PRIOR_PATH}) — using an L2 body-pose prior; "
            "fits will differ from the reference objective."
        )
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

    run_stage = _make_stage_runner(lr, num_smplify_iters, pose_prior)

    # stage 1: camera/global (reference: smplify.py:168)
    params, loss1 = run_stage(smpl, target, subset, (pose0, transl0),
                              fit_pose=False)
    # stage 2: full body (reference: smplify.py:218)
    params, loss2 = run_stage(smpl, target, subset, params, fit_pose=True)
    pose, transl = params
    return {
        "thetas": np.asarray(pose),
        "root_translation": np.asarray(transl),
        "loss": (float(loss1), float(loss2)),
    }
