"""Experiment tracking adapters.

Functional parity surface with the reference platforms
(reference: train/train_platforms.py:3-52 — TrainPlatform base,
Tensorboard/ClearML/No-op adapters).  External trackers are optional
imports; NoPlatform is the default.
"""

from __future__ import annotations

import os


class TrainPlatform:
    def __init__(self, save_dir: str):
        pass

    def report_scalar(self, name, value, iteration, group_name=None):
        pass

    def report_args(self, args, name):
        pass

    def close(self):
        pass


class NoPlatform(TrainPlatform):
    pass


class TensorboardPlatform(TrainPlatform):
    def __init__(self, save_dir: str):
        from torch.utils.tensorboard import SummaryWriter  # optional dep

        self.writer = SummaryWriter(log_dir=save_dir)

    def report_scalar(self, name, value, iteration, group_name=None):
        self.writer.add_scalar(f"{group_name}/{name}", value, iteration)

    def close(self):
        self.writer.close()


class ClearmlPlatform(TrainPlatform):
    def __init__(self, save_dir: str):
        from clearml import Task  # optional dep

        # os.path.split handles slash-free and trailing-slash save_dirs
        # (reference: train/train_platforms.py ClearmlPlatform)
        name = os.path.basename(os.path.normpath(save_dir))
        self.task = Task.init(
            project_name="gesturediffusion_tpu", task_name=name
        )
        self.logger = self.task.get_logger()

    def report_scalar(self, name, value, iteration, group_name=None):
        self.logger.report_scalar(
            title=group_name, series=name, iteration=iteration, value=value
        )

    def report_args(self, args, name):
        self.task.connect(args, name=name)

    def close(self):
        self.task.close()


def create_platform(name: str, save_dir: str) -> TrainPlatform:
    table = {
        "NoPlatform": NoPlatform,
        "TensorboardPlatform": TensorboardPlatform,
        "ClearmlPlatform": ClearmlPlatform,
    }
    return table[name](save_dir)
