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

# neutral mean-pose asset the reference initializes its fits from
# (simplify_loc2rot.py:28-33, fit_seq.py:52-55); override with
# SMPL_MEAN_PATH
DEFAULT_SMPL_MEAN_PATH = (
    "body_models/joints2smpl/neutral_smpl_mean_params.h5"
)


def load_smpl_mean_pose(path: Optional[str] = None) -> Optional[np.ndarray]:
    """SMPL mean pose from neutral_smpl_mean_params.h5 as [24, 3]
    axis-angle, or None when the asset is absent (the fit then starts
    from the zero pose — a benign init; the asset is the reference's)."""
    path = path or os.environ.get("SMPL_MEAN_PATH", DEFAULT_SMPL_MEAN_PATH)
    if not os.path.isfile(path):
        return None
    try:
        import h5py
    except ImportError:
        from gesturediffusion_tpu.utils import logger as log_lib

        log_lib.log(
            f"WARNING: {path} exists but h5py is not installed — "
            "falling back to the zero-pose init (pip install h5py, or "
            "the 'viz' extra, to use the reference mean-pose init)."
        )
        return None

    with h5py.File(path, "r") as f:
        pose = np.asarray(f["pose"][:], np.float32).reshape(-1)
    if pose.shape != (72,):
        raise ValueError(
            f"mean-params 'pose' has {pose.shape[0]} values, expected 72"
        )
    return pose.reshape(24, 3)

# reference: customloss.py:132-134; the body-stage calls override the
# customloss default 500.0 with 600.0 (smplify.py:229,251,270)
POSE_PRIOR_WEIGHT = 4.78 * 1.5
ANGLE_PRIOR_WEIGHT = 15.2
JOINT_LOSS_WEIGHT = 600.0
GMOF_SIGMA = 100.0

# ankles (7, 8) and feet (10, 11) in the SMPL joint order; upweighted to
# 1.5 by the reference's fix_foot option (simplify_loc2rot.py:90-96)
FIX_FOOT_JOINTS = (7, 8, 10, 11)
FIX_FOOT_CONFIDENCE = 1.5


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
    def run_stage(smpl, target, subset, conf, params, *, fit_pose: bool):
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
            # stage 2 (body): reference body_fitting_loss_3d form; the
            # per-joint confidence enters squared against the summed-xyz
            # gmof error (customloss.py:147-151)
            joint_loss = (JOINT_LOSS_WEIGHT**2) * jnp.sum(
                (conf**2)[None, :] * jnp.sum(gmof(err, GMOF_SIGMA), -1),
                -1,
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
    joint_confidence: Optional[np.ndarray] = None,
    fix_foot: bool = False,
) -> dict:
    """Fit per-frame SMPL axis-angle poses + root translation to joints.

    Stage 2 uses the reference's body-fitting objective
    (customloss.py:128-188): gmof robust joint loss + GMM pose prior +
    knee/elbow angle prior.  When `pose_prior` is not given, gmm_08.pkl
    is loaded automatically from $GMM_PRIOR_PATH (default
    body_models/joints2smpl/gmm_08.pkl); only if that asset is absent
    does an L2 body-pose prior substitute (logged loudly).

    `joint_confidence` weights each FITTED joint's error in stage 2
    (reference conf_3d, customloss.py:147-151), indexed like
    `joint_subset`; `fix_foot=True` is the reference's shorthand that
    upweights ankles+feet to 1.5 (simplify_loc2rot.py:90-96).

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
    if joint_confidence is not None:
        if fix_foot:
            raise ValueError(
                "joint_confidence and fix_foot are mutually exclusive — "
                "fix_foot is shorthand for a confidence vector with "
                "ankles/feet at 1.5; fold the upweight into "
                "joint_confidence instead"
            )
        conf = jnp.asarray(joint_confidence, jnp.float32)
        if conf.shape != subset.shape:
            raise ValueError(
                f"joint_confidence has shape {conf.shape}, expected "
                f"{subset.shape} (one weight per fitted joint)"
            )
    else:
        conf = np.ones(subset.shape, np.float32)
        if fix_foot:
            for j in FIX_FOOT_JOINTS:
                conf[np.asarray(subset) == j] = FIX_FOOT_CONFIDENCE
        conf = jnp.asarray(conf)

    if init_pose is not None:
        pose0 = jnp.asarray(init_pose, jnp.float32)
    else:
        # start from the reference's neutral mean pose when the asset is
        # present (simplify_loc2rot.py:28-33); zero pose otherwise
        mean = load_smpl_mean_pose()
        pose0 = (
            jnp.broadcast_to(jnp.asarray(mean), (t, 24, 3))
            if mean is not None
            else jnp.zeros((t, 24, 3), jnp.float32)
        )
    transl0 = target[:, 0] - _fk_joints(smpl, pose0, jnp.zeros((t, 3)))[:, 0]

    run_stage = _make_stage_runner(lr, num_smplify_iters, pose_prior)

    # stage 1: camera/global (reference: smplify.py:168)
    params, loss1 = run_stage(smpl, target, subset, conf, (pose0, transl0),
                              fit_pose=False)
    # stage 2: full body (reference: smplify.py:218)
    params, loss2 = run_stage(smpl, target, subset, conf, params,
                              fit_pose=True)
    pose, transl = params
    return {
        "thetas": np.asarray(pose),
        "root_translation": np.asarray(transl),
        "loss": (float(loss1), float(loss2)),
    }


def motion_to_rot(smpl: SMPLModel, motion: np.ndarray, **fit_kw) -> np.ndarray:
    """One xyz stick-figure sample [J>=22, 3, T] -> [25, 6, T] SMPL rot6d.

    The output layout is the reference's Blender-import convention
    (simplify_loc2rot.py:106-111): rows 0-23 are per-joint rotation-6d,
    row 24 packs the root xyz location in its first three channels.
    """
    fit = joints2smpl(smpl, motion.transpose(2, 0, 1), **fit_kw)
    mats = R.axis_angle_to_matrix(jnp.asarray(fit["thetas"]))
    rot6d = np.asarray(R.matrix_to_rotation_6d(mats))  # [T, 24, 6]
    root = motion.transpose(2, 0, 1)[:, 0]  # [T, 3]
    root_row = np.concatenate([root, np.zeros_like(root)], -1)[:, None]
    return np.concatenate([rot6d, root_row], 1).transpose(1, 2, 0)


def npy2smpl(
    npy_path: str,
    smpl: SMPLModel,
    num_smplify_iters: int = 150,
    fix_foot: bool = False,
    out_path: Optional[str] = None,
) -> str:
    """Convert a generated results.npy (xyz joints) to SMPL rotations.

    Mirrors the reference batch CLI (simplify_loc2rot.py:45-59): every
    sample's [J, 3, T] motion is SMPLify-fitted and replaced by the
    [25, 6, T] rot6d layout; all other keys (text, lengths, ...) pass
    through unchanged.  Writes `<input>_rot.npy` and returns its path.
    """
    if not npy_path.endswith(".npy"):
        raise ValueError(
            f"npy2smpl expects a .npy results file, got {npy_path!r} "
            "(reference gate: simplify_loc2rot.py:126)"
        )
    data = np.load(npy_path, allow_pickle=True).item()
    motions = data["motion"]
    if motions.ndim != 4 or motions.shape[2] != 3:
        raise ValueError(
            f"expected xyz motions [N, J, 3, T], got {motions.shape} — "
            "npy2smpl consumes stick-figure results.npy files"
        )
    data["motion"] = np.stack(
        [
            motion_to_rot(smpl, m, num_smplify_iters=num_smplify_iters,
                          fix_foot=fix_foot)
            for m in motions
        ],
        0,
    )
    if out_path is None:
        out_path = npy_path[: -len(".npy")] + "_rot.npy"
    np.save(out_path, data)
    return out_path


def main(argv=None):
    """CLI mirroring visualize/simplify_loc2rot.py __main__ (:116-132)."""
    import argparse

    from gesturediffusion_tpu.models.smpl import (
        load_smpl_pickle,
        make_synthetic_smpl,
    )

    parser = argparse.ArgumentParser()
    parser.add_argument("--input_path", required=True,
                        help="results.npy file, or a directory of them")
    parser.add_argument("--num_smplify_iters", type=int, default=150)
    parser.add_argument("--fix_foot", action="store_true",
                        help="upweight ankle/foot joints to 1.5 in the fit")
    parser.add_argument("--smpl_model", default=os.environ.get(
        "SMPL_MODEL_PATH", "body_models/smpl/SMPL_NEUTRAL.pkl"))
    args = parser.parse_args(argv)

    smpl = (
        load_smpl_pickle(args.smpl_model)
        if os.path.isfile(args.smpl_model)
        else make_synthetic_smpl()
    )
    if os.path.isfile(args.input_path):
        paths = [args.input_path]
    else:
        paths = sorted(
            os.path.join(args.input_path, f)
            for f in os.listdir(args.input_path)
            if f.endswith(".npy") and not f.endswith("_rot.npy")
        )
    for path in paths:
        out = npy2smpl(path, smpl, num_smplify_iters=args.num_smplify_iters,
                       fix_foot=args.fix_foot)
        print(f"saved [{out}]")


if __name__ == "__main__":
    main()
