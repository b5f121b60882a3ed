"""Motion editing CLI: `python -m gesturediffusion_tpu.sample.edit`.

Functional parity surface with the reference editor
(reference: sample/edit.py:22-199): loads the test split with motions,
builds the inpainting spec — in_between: per-sample prefix/suffix frame
ranges kept :76-83; upper_body: lower-body features kept via
HML_LOWER_BODY_MASK :84-88 — optional text conditioning (empty prompt ⇒
guidance 0 :69-70), runs the sampler with per-step imputation
(gaussian_diffusion.py:307-311), recovers xyz joints and renders videos
with the ground-truth frames tinted.

TPU design: the imputation happens inside the jitted sampling scan (a
masked `where` per step); all repetitions run as one batched call.
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from gesturediffusion_tpu.data.collate import collate_gesture, device_cond
from gesturediffusion_tpu.data.humanml_utils import HML_LOWER_BODY_MASK
from gesturediffusion_tpu.diffusion import sampling
from gesturediffusion_tpu.ops.motion_process import recover_from_ric
from gesturediffusion_tpu.utils import logger as log_lib
from gesturediffusion_tpu.utils import paramutil
from gesturediffusion_tpu.utils.cache import enable_compilation_cache
from gesturediffusion_tpu.utils.checkpoint import load_checkpoint
from gesturediffusion_tpu.utils.fixseed import fixseed
from gesturediffusion_tpu.utils.model_factory import create_model_and_diffusion
from gesturediffusion_tpu.utils.parser import default_output_dir, edit_args


def build_edit_masks(
    edit_mode: str,
    motion: np.ndarray,  # [B, D, 1, T]
    lengths: np.ndarray,
    prefix_end: float = 0.25,
    suffix_start: float = 0.75,
    feature_mask: np.ndarray | None = None,
) -> np.ndarray:
    """Boolean inpainting mask [B, D, 1, T]; True = keep ground truth."""
    b, d, _, t = motion.shape
    if edit_mode == "in_between":
        # reference semantics (sample/edit.py:76-83): mask starts all-True
        # (GT kept everywhere INCLUDING the padding frames after `length`)
        # and only [prefix_end*length, suffix_start*length) is generated
        mask = np.ones((b, d, 1, t), bool)
        for i, length in enumerate(np.asarray(lengths)):
            start = int(float(length) * prefix_end)
            end = int(float(length) * suffix_start)
            mask[i, :, :, start:end] = False
        return mask
    if edit_mode == "upper_body":
        if feature_mask is None and d != HML_LOWER_BODY_MASK.shape[0]:
            raise ValueError(
                f"upper_body editing needs a per-feature mask: the "
                f"built-in lower-body mask covers the HumanML3D "
                f"{HML_LOWER_BODY_MASK.shape[0]}-dim codec, not this "
                f"{d}-dim representation — pass feature_mask explicitly"
            )
        feat = (
            feature_mask if feature_mask is not None else HML_LOWER_BODY_MASK
        )
        return np.broadcast_to(
            np.asarray(feat, bool)[None, :, None, None], (b, d, 1, t)
        ).copy()
    raise ValueError(f"unknown edit_mode {edit_mode}")


def load_edit_dataset(args):
    """Test-split dataset with motions for the configured dataset."""
    if args.dataset in ("humanml", "kit"):
        from gesturediffusion_tpu.data.humanml import Text2MotionDatasetV2

        return Text2MotionDatasetV2(
            args.data_dir or f"./dataset/{args.dataset}",
            split="test",
            dataset_name="t2m" if args.dataset == "humanml" else "kit",
        )
    from gesturediffusion_tpu.data.registry import get_dataset

    split = "val" if args.dataset in ("genea2022", "genea2023") else "train"
    return get_dataset(
        args.dataset,
        args.num_frames,
        split=split if args.dataset != "synthetic" else "train",
        datapath=args.data_dir or None,
        n_seed_poses=getattr(args, "seed_poses", 10),
    )


def main(argv=None):
    args = edit_args(argv)
    fixseed(args.seed)
    from gesturediffusion_tpu.utils.fixseed import set_prng_impl

    set_prng_impl(getattr(args, "prng", "rbg"))
    enable_compilation_cache()

    max_frames = (
        196 if args.dataset in ("kit", "humanml") else args.num_frames
    )
    fps = 12.5 if args.dataset == "kit" else (
        30 if args.dataset in ("genea2022", "genea2023", "synthetic") else 20
    )

    out_path = args.output_dir or default_output_dir(
        args.model_path, "edit", args.edit_mode, f"seed{args.seed}"
    )

    log_lib.log("Loading dataset...")
    dataset = load_edit_dataset(args)
    n = min(args.num_samples, len(dataset))
    items = [dataset[i] for i in range(n)]
    motion, cond = collate_gesture(items, max_frames=max_frames)

    log_lib.log("Creating model and diffusion...")
    model, diffusion = create_model_and_diffusion(args, dataset)
    params = load_checkpoint(args.model_path, model=model)["params"]

    # empty text condition => unconditioned editing (guidance 0) — but
    # ONLY for text-conditioned models (reference edit.py:66-70 targets
    # humanml). Gesture models condition on audio+seed: forcing
    # guidance 0 there would run the CFG branch that MASKS the seed-pose
    # conditioning and silently discard --guidance_param.  Derived from
    # the MODEL (cond_mode), not a dataset-name list.
    text_conditioned = getattr(model, "cond_mode", None) == "text"
    has_text = args.text_condition != ""
    guidance = (
        0.0 if (text_conditioned and not has_text) else args.guidance_param
    )

    # MDM sampling fast path (models/mdm_fastpath.py), as in generate.py
    from gesturediffusion_tpu.models.mdm_fastpath import (
        select_sampling_model_fn,
    )

    cond_precompute, model_fn = select_sampling_model_fn(
        model, params, guidance, args.cond_mask_prob,
        no_fast=getattr(args, "no_fast_sampler", False),
    )

    inpainting_mask = build_edit_masks(
        args.edit_mode, motion, cond["lengths"],
        args.prefix_end, args.suffix_start,
    )

    dcond = {k: jnp.asarray(v) for k, v in device_cond(cond).items()}
    if guidance != 1:
        dcond["scale"] = jnp.full((n,), guidance, jnp.float32)
    if args.dataset in ("humanml", "kit") and not args.unconstrained:
        # text-conditioned editing: the prompt (possibly empty, with
        # guidance 0) conditions every sample (reference: edit.py:66-70)
        from gesturediffusion_tpu.utils.text_embedder import get_text_encoder

        text_encoder = get_text_encoder()
        dcond["text_emb"] = jnp.asarray(
            text_encoder([args.text_condition] * n)
        )

    shape = motion.shape

    @jax.jit
    def run(rng, c):
        if cond_precompute is not None:
            c = cond_precompute(c)
        return sampling.p_sample_loop(
            diffusion,
            model_fn,
            shape,
            rng,
            c,
            clip_denoised=False,
            inpaint=(jnp.asarray(inpainting_mask), jnp.asarray(motion)),
        )

    all_motions, all_lengths, all_text = [], [], []
    rng = jax.random.PRNGKey(args.seed)
    for rep_i in range(args.num_repetitions):
        log_lib.log(f"### Start sampling [repetitions #{rep_i}]")
        rng, step_rng = jax.random.split(rng)
        sample = np.asarray(run(step_rng, dcond))

        if args.dataset in ("humanml", "kit"):
            n_joints = 22 if sample.shape[1] == 263 else 21
            feats = dataset.inv_transform(
                sample[:, :, 0, :].transpose(0, 2, 1)
            )
            xyz = np.asarray(
                recover_from_ric(jnp.asarray(feats, jnp.float32), n_joints)
            )  # [B, T, J, 3]
            all_motions.append(xyz.transpose(0, 2, 3, 1))
        else:
            all_motions.append(sample)
        all_lengths.append(np.asarray(cond["lengths"]))
        all_text += cond.get("text", [""] * n)

    os.makedirs(out_path, exist_ok=True)
    npy_path = os.path.join(out_path, "results.npy")
    log_lib.log(f"saving results file to [{npy_path}]")
    np.save(
        npy_path,
        {
            "motion": np.concatenate(all_motions, axis=0),
            "text": all_text,
            "lengths": np.concatenate(all_lengths, axis=0),
            "num_samples": n,
            "num_repetitions": args.num_repetitions,
        },
    )
    with open(npy_path.replace(".npy", ".txt"), "w") as fw:
        fw.write("\n".join(all_text))

    # videos with GT frames tinted (humanml path only — gesture editing
    # renders through sample.generate's BVH path instead)
    if args.dataset in ("humanml", "kit"):
        from gesturediffusion_tpu.viz.plot import plot_3d_motion

        chains = (
            paramutil.t2m_kinematic_chain
            if args.dataset == "humanml"
            else paramutil.kit_kinematic_chain
        )
        motions = np.concatenate(all_motions, axis=0)
        for rep_i in range(args.num_repetitions):
            for i in range(n):
                length = int(np.asarray(cond["lengths"])[i])
                m = motions[rep_i * n + i, :, :, :length].transpose(2, 0, 1)
                gt_frames = (
                    list(range(int(length * args.prefix_end)))
                    + list(range(int(length * args.suffix_start), length))
                    if args.edit_mode == "in_between"
                    else []
                )
                save_file = f"sample{i:02d}_rep{rep_i:02d}.mp4"
                try:
                    plot_3d_motion(
                        os.path.join(out_path, save_file), chains, m,
                        dataset=args.dataset, title=all_text[rep_i * n + i],
                        fps=fps, vis_mode=args.edit_mode,
                        gt_frames=gt_frames,
                    )
                except Exception as e:
                    log_lib.log(f"  (video skipped: {e})")

    log_lib.log(f"[Done] Results are at [{os.path.abspath(out_path)}]")
    return out_path


if __name__ == "__main__":
    main(sys.argv[1:])
