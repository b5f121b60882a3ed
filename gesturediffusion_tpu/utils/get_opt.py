"""T2M opt.txt checkpoint-config parser.

Functional parity surface with the reference parser
(reference: data_loaders/humanml/utils/get_opt.py:29-80): parses the
`opt.txt` files shipped with the T2M evaluator checkpoints into a
namespace and fills in the dataset dimension table (t2m: 22 joints /
263-dim / 196 max len; kit: 21 / 251 / 196).
"""

from __future__ import annotations

import os
from argparse import Namespace
from os.path import join as pjoin


def get_opt(opt_path: str, device=None) -> Namespace:
    opt = Namespace()
    opt_dict = vars(opt)

    skip = ("-------------- End ----------------",
            "------------ Options -------------",
            "\n")
    with open(opt_path) as f:
        for line in f:
            if line.strip() not in skip and ":" in line:
                key, value = line.strip().split(": ", 1)
                value = value.strip()
                if value in ("True", "False"):
                    opt_dict[key] = value == "True"
                elif _is_float(value):
                    opt_dict[key] = (
                        int(value) if value.lstrip("-").isdigit()
                        else float(value)
                    )
                else:
                    opt_dict[key] = value

    opt_dict["which_epoch"] = "finest"
    opt.save_root = os.path.dirname(opt_path)
    opt.model_dir = pjoin(opt.save_root, "model")
    opt.meta_dir = pjoin(opt.save_root, "meta")

    dataset_name = getattr(opt, "dataset_name", "t2m")
    if dataset_name == "t2m":
        opt.data_root = "./dataset/HumanML3D"
        opt.motion_dir = pjoin(opt.data_root, "new_joint_vecs")
        opt.text_dir = pjoin(opt.data_root, "texts")
        opt.joints_num = 22
        opt.dim_pose = 263
        opt.max_motion_length = 196
    elif dataset_name == "kit":
        opt.data_root = "./dataset/KIT-ML"
        opt.motion_dir = pjoin(opt.data_root, "new_joint_vecs")
        opt.text_dir = pjoin(opt.data_root, "texts")
        opt.joints_num = 21
        opt.dim_pose = 251
        opt.max_motion_length = 196
    else:
        raise KeyError(f"Dataset not recognized: {dataset_name}")

    opt.dim_word = 300
    opt.num_classes = 200 // getattr(opt, "unit_length", 4)
    opt.dim_pos_ohot = 15
    opt.is_train = False
    opt.is_continue = False
    opt.device = device
    return opt


def _is_float(s: str) -> bool:
    try:
        float(s)
        return True
    except ValueError:
        return False
