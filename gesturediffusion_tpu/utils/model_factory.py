"""Model + diffusion factory.

Functional parity surface with the reference factory
(reference: utils/model_util.py — create_model_and_diffusion:12,
get_model_args:18 with genea⇒498 joints/genea_vec, create_gaussian_diffusion
:37 with 1000 steps / predict x_start / FIXED_SMALL / MSE).
"""

from __future__ import annotations

from gesturediffusion_tpu.diffusion import (
    LossType,
    ModelMeanType,
    ModelVarType,
    create_diffusion,
)
from gesturediffusion_tpu.models.mdm import MDM
from gesturediffusion_tpu.models.mdm_t2m import MotionMDM

GESTURE_DATASETS = ("genea2022", "genea2023", "synthetic")


def get_model_args(args, data=None) -> dict:
    """Model kwargs from flags (reference: utils/model_util.py:18-35)."""
    dataset = args.dataset
    if dataset in GESTURE_DATASETS:
        data_rep = "genea_vec"
        njoints = getattr(data, "pose_dim", None) or 498
        nfeats = 1
    elif dataset in ("humanml", "kit"):
        data_rep = "hml_vec"
        njoints = 263 if dataset == "humanml" else 251
        nfeats = 1
    else:  # a2m datasets: rot6d + translation row
        data_rep = "rot6d"
        njoints = 25
        nfeats = 6
    return {
        "njoints": njoints,
        "nfeats": nfeats,
        "data_rep": data_rep,
        "latent_dim": args.latent_dim,
        "ff_size": 1024,
        "num_layers": args.layers,
        "num_heads": 4,
        "dropout": 0.1,
        "activation": "gelu",
        "cond_mask_prob": args.cond_mask_prob,
        "clip_dim": 512,
    }


def create_model(args, data=None):
    """Pick the denoiser family per dataset/flags."""
    arch = getattr(args, "arch", "trans_enc")
    if arch != "trans_enc":
        # The reference parser accepts trans_dec/gru (parser_util.py:72-74)
        # but its model code never builds them in this fork and all released
        # checkpoints are trans_enc — fail loudly instead of silently
        # building the wrong architecture.
        raise NotImplementedError(
            f"--arch {arch!r} is accepted for flag parity with the "
            "reference, but only 'trans_enc' can be built (the reference "
            "fork's trans_dec/gru choices are vestigial)."
        )
    kw = get_model_args(args, data)
    dataset = args.dataset
    if dataset in GESTURE_DATASETS:
        use_wav_enc = getattr(args, "use_wav_enc", False)
        if getattr(args, "mfcc_input", False) and use_wav_enc:
            # ambiguous: __call__ would run the MFCC branch and leave the
            # wav encoder inert — refuse rather than silently pick
            raise ValueError(
                "--mfcc_input and --use_wav_enc are mutually exclusive "
                "(the model consumes ONE audio representation)"
            )
        # audio features are required: MFCCs unless the wav encoder
        # was explicitly requested
        mfcc_input = getattr(args, "mfcc_input", False) or not use_wav_enc
        return MDM(
            use_text=args.use_text,
            seed_poses=args.seed_poses,
            mfcc_input=mfcc_input,
            use_wav_enc=use_wav_enc,
            use_fused_encoder=getattr(args, "use_fused_encoder", False),
            use_fused_train_encoder=getattr(
                args, "use_fused_train_encoder", False),
            remat=getattr(args, "remat", False),
            **kw,
        )
    if dataset in ("humanml", "kit"):
        cond_mode = "no_cond" if args.unconstrained else "text"
        return MotionMDM(
            cond_mode=cond_mode,
            use_fused_encoder=getattr(args, "use_fused_encoder", False),
            use_fused_train_encoder=getattr(
                args, "use_fused_train_encoder", False),
            remat=getattr(args, "remat", False),
            **kw,
        )
    # action-to-motion / unconstrained
    cond_mode = "no_cond" if args.unconstrained else "action"
    num_actions = {"humanact12": 12, "uestc": 40}.get(dataset, 12)
    return MotionMDM(
        cond_mode=cond_mode, num_actions=num_actions,
        use_fused_encoder=getattr(args, "use_fused_encoder", False),
        use_fused_train_encoder=getattr(
            args, "use_fused_train_encoder", False),
        remat=getattr(args, "remat", False),
        **kw,
    )


def create_gaussian_diffusion(args, timestep_respacing: str | None = None):
    """Diffusion pytree from flags (reference: utils/model_util.py:37-71)."""
    predict_xstart = True
    learn_sigma = False
    steps = args.diffusion_steps
    return create_diffusion(
        noise_schedule=args.noise_schedule,
        steps=steps,
        timestep_respacing=timestep_respacing
        or getattr(args, "timestep_respacing", None)
        or None,
        model_mean_type=(
            ModelMeanType.START_X if predict_xstart else ModelMeanType.EPSILON
        ),
        model_var_type=(
            (ModelVarType.FIXED_LARGE if not args.sigma_small
             else ModelVarType.FIXED_SMALL)
            if not learn_sigma
            else ModelVarType.LEARNED_RANGE
        ),
        loss_type=LossType.MSE,
        rescale_timesteps=False,
        lambda_vel=args.lambda_vel,
        lambda_rcxyz=args.lambda_rcxyz,
        lambda_fc=args.lambda_fc,
        data_rep="rot6d" if args.dataset in ("humanact12", "uestc") else "vec",
    )


def create_model_and_diffusion(args, data=None):
    return create_model(args, data), create_gaussian_diffusion(args)
