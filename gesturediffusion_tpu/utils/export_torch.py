"""Export a Flax checkpoint as a reference-loadable torch .pt file.

    python -m gesturediffusion_tpu.utils.export_torch \
        --model_path save/model000400000 --out model000400000.pt [--ema]

The output loads in the reference repo through its own
`load_model_wo_clip` contract (strict=False with only clip_model.*
missing) — see utils/convert_torch.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model_path", required=True,
                        help="Orbax checkpoint dir (model{step:09d})")
    parser.add_argument("--out", required=True, help="output .pt path")
    parser.add_argument("--ema", action="store_true",
                        help="export the EMA weights instead")
    args = parser.parse_args(argv)

    args.model_path = os.path.normpath(args.model_path)
    args_json = os.path.join(os.path.dirname(args.model_path), "args.json")
    if not os.path.isfile(args_json):
        raise FileNotFoundError(
            f"{args_json} not found — the training args are needed to "
            "rebuild the model architecture"
        )
    with open(args_json) as f:
        train_args = argparse.Namespace(**json.load(f))

    from gesturediffusion_tpu.models.mdm import MDM
    from gesturediffusion_tpu.models.mdm_t2m import MotionMDM
    from gesturediffusion_tpu.utils.checkpoint import load_checkpoint
    from gesturediffusion_tpu.utils.convert_torch import (
        save_torch_checkpoint,
    )
    from gesturediffusion_tpu.utils.model_factory import create_model

    model = create_model(train_args)
    if not isinstance(model, (MDM, MotionMDM)):
        raise NotImplementedError(
            "torch export covers the gesture MDM and upstream MotionMDM "
            f"families (got {type(model).__name__})"
        )
    ckpt = load_checkpoint(args.model_path)
    if args.ema:
        if not ckpt.get("ema_params"):
            raise ValueError(
                "--ema requested but the checkpoint has no EMA weights "
                "(trained with ema_rate=0) — rerun without --ema"
            )
        variables = dict(ckpt["ema_params"])
        # EMA tracks params only; BatchNorm running stats (wav encoder)
        # live in the live variables' batch_stats collection
        if "batch_stats" in ckpt["params"]:
            variables.setdefault(
                "batch_stats", ckpt["params"]["batch_stats"]
            )
    else:
        variables = ckpt["params"]
    save_torch_checkpoint(args.out, variables, model)
    print(f"wrote {args.out}")
    return args.out


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
