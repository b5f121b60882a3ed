"""CLI flag system with argparse groups and the checkpoint-args override.

Functional parity surface with the reference flag system
(reference: utils/parser_util.py — groups base:53 / diffusion:61 /
model:70 / dataset:99 / training:109 / sampling:141 / generate:157 /
edit:174 / eval:191; the parse_and_load_from_model trick :7-33 that
re-reads dataset/model/diffusion args from the checkpoint's args.json;
the `cond_mask_prob==0 ⇒ guidance_param=1` rule :31-32).

Flag names and defaults match the reference for drop-in parity; TPU-only
additions are grouped under 'tpu'.
"""

from __future__ import annotations

import argparse
import json
import os
from argparse import ArgumentParser


def str2bool(v) -> bool:
    """argparse bool that actually parses 'False' (type=bool treats ANY
    non-empty string — including 'False' — as True, silently inverting
    explicit user input; the reference shares that footgun)."""
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "1"):
        return True
    if v.lower() in ("no", "false", "f", "0", ""):
        return False
    raise argparse.ArgumentTypeError(f"expected a boolean, got {v!r}")


def parse_and_load_from_model(parser: ArgumentParser, argv=None):
    """Re-load dataset/model/diffusion args from the checkpoint's args.json."""
    add_data_options(parser)
    add_model_options(parser)
    add_diffusion_options(parser)
    args = parser.parse_args(argv)
    args_to_overwrite = []
    for group_name in ["dataset", "model", "diffusion"]:
        args_to_overwrite += get_args_per_group_name(parser, args, group_name)

    model_path = get_model_path_from_args(argv)
    args_path = os.path.join(os.path.dirname(model_path), "args.json")
    assert os.path.exists(args_path), "Arguments json file was not found!"
    with open(args_path) as fr:
        model_args = json.load(fr)

    for a in args_to_overwrite:
        if a in model_args:
            setattr(args, a, model_args[a])
        else:
            print(
                f"Warning: was not able to load [{a}], "
                f"using default value [{getattr(args, a)}] instead."
            )

    if args.cond_mask_prob == 0:
        args.guidance_param = 1
    # normalize once for every downstream consumer (dirname-based run
    # names, log files, output dirs)
    args.model_path = os.path.normpath(args.model_path)
    return args


def get_args_per_group_name(parser, args, group_name):
    for group in parser._action_groups:
        if group.title == group_name:
            return [a.dest for a in group._group_actions]
    raise ValueError(f"group_name {group_name} was not found")


def default_output_dir(model_path: str, prefix: str, *parts: str) -> str:
    """The CLIs' shared default output-dir naming (reference:
    sample/generate.py:48-52): <ckpt dir>/<prefix>_<run>_<iter>[_parts...],
    e.g. samples_run_000600000_seed10."""
    # normpath FIRST: orbax checkpoints are directories, so a
    # tab-completed trailing slash would otherwise lose the run name and
    # nest the output inside the checkpoint itself
    model_path = os.path.normpath(model_path)
    name = os.path.basename(os.path.dirname(model_path))
    niter = os.path.basename(model_path).replace("model", "")
    for suffix in (".pt", ".pth", ".safetensors"):  # reference strips .pt
        niter = niter.removesuffix(suffix)
    return os.path.join(
        os.path.dirname(model_path),
        "_".join([f"{prefix}_{name}_{niter}", *parts]),
    )


def get_model_path_from_args(argv=None):
    dummy = ArgumentParser()
    dummy.add_argument("--model_path", required=True)
    dummy_args, _ = dummy.parse_known_args(argv)
    # normpath: orbax checkpoints are directories, so a tab-completed
    # trailing slash would make dirname() point INSIDE the checkpoint
    # and the args.json lookup fail
    return os.path.normpath(dummy_args.model_path)


def add_base_options(parser: ArgumentParser):
    group = parser.add_argument_group("base")
    group.add_argument("--device", default=0, type=int,
                       help="Device id to use.")
    group.add_argument("--seed", default=10, type=int,
                       help="For fixing random seed.")
    group.add_argument("--batch_size", default=256, type=int,
                       help="Batch size during training.")
    group.add_argument("--prng", default="rbg",
                       choices=["rbg", "threefry2x32"], type=str,
                       help="JAX PRNG impl; rbg measured ~1.7x faster "
                            "train steps / +4%% sampling on v5e.")


def add_diffusion_options(parser: ArgumentParser):
    group = parser.add_argument_group("diffusion")
    group.add_argument("--noise_schedule", default="cosine",
                       choices=["linear", "cosine"], type=str)
    group.add_argument("--diffusion_steps", default=1000, type=int,
                       help="Number of diffusion steps (T).")
    group.add_argument("--sigma_small", default=True, type=str2bool,
                       help="Use smaller sigma values.")


def add_model_options(parser: ArgumentParser):
    group = parser.add_argument_group("model")
    group.add_argument("--arch", default="trans_enc",
                       choices=["trans_enc", "trans_dec", "gru"], type=str)
    group.add_argument("--emb_trans_dec", default=False, type=str2bool)
    group.add_argument("--layers", default=8, type=int)
    group.add_argument("--latent_dim", default=256, type=int)
    group.add_argument("--cond_mask_prob", default=0.1, type=float,
                       help="Conditioning dropout for CFG training.")
    group.add_argument("--lambda_rcxyz", default=0.0, type=float)
    group.add_argument("--lambda_vel", default=0.0, type=float)
    group.add_argument("--lambda_fc", default=0.0, type=float)
    group.add_argument("--unconstrained", action="store_true")
    group.add_argument("--use_text", action="store_true")
    group.add_argument("--use_audio", action="store_true")
    group.add_argument("--mfcc_input", action="store_true")
    group.add_argument("--use_wav_enc", action="store_true")
    group.add_argument("--seed_poses", type=int, default=10)


def add_data_options(parser: ArgumentParser):
    group = parser.add_argument_group("dataset")
    group.add_argument("--dataset", default="genea2023",
                       choices=["genea2022", "genea2023", "humanml", "kit",
                                "humanact12", "uestc", "synthetic"],
                       type=str)
    group.add_argument("--data_dir", default="", type=str)
    group.add_argument("--num_frames", default=120, type=int)


def add_training_options(parser: ArgumentParser):
    group = parser.add_argument_group("training")
    group.add_argument("--save_dir", required=True, type=str)
    group.add_argument("--overwrite", action="store_true")
    group.add_argument("--train_platform_type", default="NoPlatform",
                       choices=["NoPlatform", "ClearmlPlatform",
                                "TensorboardPlatform"], type=str)
    group.add_argument("--lr", default=1e-4, type=float)
    group.add_argument("--weight_decay", default=0.0, type=float)
    group.add_argument("--lr_anneal_steps", default=0, type=int)
    group.add_argument("--eval_batch_size", default=32, type=int)
    group.add_argument("--eval_split", default="test",
                       choices=["val", "test"], type=str)
    group.add_argument("--eval_during_training", action="store_true")
    group.add_argument("--eval_rep_times", default=3, type=int)
    group.add_argument("--eval_num_samples", default=1_000, type=int)
    group.add_argument("--log_interval", default=1_000, type=int)
    group.add_argument("--save_interval", default=10_000, type=int)
    group.add_argument("--num_steps", default=600_000, type=int)
    group.add_argument("--resume_checkpoint", default="", type=str)


def add_tpu_options(parser: ArgumentParser):
    group = parser.add_argument_group("tpu")
    group.add_argument("--use_bf16", action="store_true",
                       help="bf16 activations/compute (params stay f32).")
    group.add_argument("--ema_rate", default=0.0, type=float,
                       help="EMA decay for params (0 disables).")
    group.add_argument("--schedule_sampler", default="uniform",
                       choices=["uniform", "loss-second-moment"], type=str)
    group.add_argument("--mesh_model_axis", default=1, type=int,
                       help="Devices on the tensor-parallel mesh axis.")
    group.add_argument("--use_fused_encoder", action="store_true",
                       help="Run encoder layers as fused Pallas kernels "
                            "(inference only; same param tree).")
    group.add_argument("--use_fused_train_encoder", action="store_true",
                       help="Custom-VJP fused encoder layers for the "
                            "training path (fused fwd+bwd Pallas "
                            "kernels, only the layer input saved for "
                            "backward; same param tree).")
    group.add_argument("--microbatch_size", default=0, type=int,
                       help="Gradient-accumulation microbatch size "
                            "(0 = whole batch; <=128/chip dodges the "
                            "large-batch encoder cliff).")
    group.add_argument("--device_batch_pool", default=0, type=int,
                       help="Pre-stage this many batches on device once "
                            "and cycle them for the whole run (0 = off). "
                            "Transport knob for hosts whose host->device "
                            "link is bandwidth-limited (e.g. tunneled "
                            "backends): the jitted step, logging, and "
                            "checkpoint paths are unchanged; only the "
                            "per-step upload is bypassed.")
    group.add_argument("--remat", action="store_true",
                       help="Rematerialize encoder layers in the backward "
                            "pass (jax.checkpoint). Memory knob for configs "
                            "whose activations exceed HBM; measured -22% "
                            "step time at the production config, so keep "
                            "it off unless you need the headroom.")


def add_sampling_options(parser: ArgumentParser):
    group = parser.add_argument_group("sampling")
    group.add_argument("--model_path", required=True, type=str)
    group.add_argument("--output_dir", default="", type=str)
    group.add_argument("--num_samples", default=10, type=int)
    group.add_argument("--num_repetitions", default=3, type=int)
    group.add_argument("--guidance_param", default=2.5, type=float)
    group.add_argument("--use_fused_encoder", action="store_true",
                       help="Run encoder layers as fused Pallas kernels "
                            "(same param tree; inference speedup on TPU).")
    group.add_argument("--no_fast_sampler", action="store_true",
                       help="Disable the MDM sampling fast path "
                            "(models/mdm_fastpath.py: loop-invariant "
                            "conditioning hoisted out of the denoise scan).")


def add_generate_options(parser: ArgumentParser):
    group = parser.add_argument_group("generate")
    group.add_argument("--motion_length", default=6.0, type=float)
    group.add_argument("--input_text", default="", type=str)
    group.add_argument("--action_file", default="", type=str)
    group.add_argument("--text_prompt", default="", type=str)
    group.add_argument("--action_name", default="", type=str)
    group.add_argument("--sampler", default="ddpm",
                       choices=["ddpm", "ddim", "plms", "dpmpp"], type=str)
    group.add_argument("--timestep_respacing", default="", type=str,
                       help='e.g. "ddim50" (uniform 50-step stride) or '
                            '"logsnr50" (50 steps uniform in log-SNR — '
                            'tighter low-step sampling for any sampler).')


def add_edit_options(parser: ArgumentParser):
    group = parser.add_argument_group("edit")
    group.add_argument("--edit_mode", default="in_between",
                       choices=["in_between", "upper_body"], type=str)
    group.add_argument("--text_condition", default="", type=str)
    group.add_argument("--prefix_end", default=0.25, type=float)
    group.add_argument("--suffix_start", default=0.75, type=float)


def add_serve_options(parser: ArgumentParser):
    group = parser.add_argument_group("serve")
    group.add_argument("--wav", default="", type=str,
                       help="Raw mono wav to stream (22050 Hz). Default: "
                            "stream the val split's own audio windows.")
    group.add_argument("--streams", default=1, type=int,
                       help="Concurrent takes batched per chunk program "
                            "(multi-tenant serving).")
    group.add_argument("--num_chunks", default=0, type=int,
                       help="Chunks to serve; 0 = as many as the source "
                            "provides.")
    group.add_argument("--sampler", default="ddpm",
                       choices=["ddpm", "ddim", "plms", "dpmpp"], type=str)
    group.add_argument("--sample_steps", default=0, type=int,
                       help="Respace the sampler to N steps (the latency "
                            "knob); 0 = the full trained chain.")
    group.add_argument("--step_spacing", default="uniform",
                       choices=["uniform", "logsnr"], type=str,
                       help="How respaced steps are placed: uniform "
                            "timestep stride, or uniform in log-SNR "
                            "(tighter low-step sampling).")


def add_evaluation_options(parser: ArgumentParser):
    group = parser.add_argument_group("eval")
    group.add_argument("--model_path", required=True, type=str)
    group.add_argument("--eval_mode", default="wo_mm",
                       choices=["wo_mm", "mm_short", "debug", "full"],
                       type=str)
    group.add_argument("--guidance_param", default=2.5, type=float)
    group.add_argument("--use_fused_encoder", action="store_true",
                       help="Run encoder layers as fused Pallas kernels "
                            "(same param tree; inference speedup on TPU).")


def train_args(argv=None):
    parser = ArgumentParser()
    add_base_options(parser)
    add_data_options(parser)
    add_model_options(parser)
    add_diffusion_options(parser)
    add_training_options(parser)
    add_tpu_options(parser)
    return parser.parse_args(argv)


def generate_args(argv=None):
    parser = ArgumentParser()
    add_base_options(parser)
    add_sampling_options(parser)
    add_generate_options(parser)
    return parse_and_load_from_model(parser, argv)


def edit_args(argv=None):
    parser = ArgumentParser()
    add_base_options(parser)
    add_sampling_options(parser)
    add_edit_options(parser)
    return parse_and_load_from_model(parser, argv)


def serve_args(argv=None):
    parser = ArgumentParser()
    add_base_options(parser)
    add_sampling_options(parser)
    add_serve_options(parser)
    return parse_and_load_from_model(parser, argv)


def evaluation_parser(argv=None):
    parser = ArgumentParser()
    add_base_options(parser)
    add_evaluation_options(parser)
    return parse_and_load_from_model(parser, argv)
