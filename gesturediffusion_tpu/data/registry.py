"""Dataset registry / loader factory.

Functional parity surface with the reference factory
(reference: data_loaders/get_data.py:5-36), extended with the synthetic
dataset for hermetic tests/bench.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

from gesturediffusion_tpu.data.collate import collate_gesture
from gesturediffusion_tpu.data.genea import Genea2022, Genea2023
from gesturediffusion_tpu.data.loader import DataLoader
from gesturediffusion_tpu.data.synthetic import SyntheticGesture


def get_dataset_class(name: str):
    if name == "genea2023":
        return Genea2023
    if name == "genea2022":
        return Genea2022
    if name == "synthetic":
        return SyntheticGesture
    if name in ("humanml", "kit"):
        from gesturediffusion_tpu.data.humanml import Text2MotionDatasetV2

        return Text2MotionDatasetV2
    if name == "humanact12":
        from gesturediffusion_tpu.data.a2m import HumanAct12Poses

        return HumanAct12Poses
    if name == "uestc":
        from gesturediffusion_tpu.data.uestc import UESTC

        return UESTC
    raise ValueError(f"Unsupported dataset name [{name}]")


def get_dataset(
    name: str,
    num_frames: int,
    split: str = "train",
    datapath: Optional[str] = None,
    n_seed_poses: int = 10,
    **kwargs,
):
    cls = get_dataset_class(name)
    if name == "synthetic":
        return cls(window=num_frames, n_seed_poses=n_seed_poses, **kwargs)
    if name in ("humanml", "kit"):
        return cls(
            datapath or f"./dataset/{'HumanML3D' if name == 'humanml' else 'KIT-ML'}",
            split=split,
            dataset_name="t2m" if name == "humanml" else "kit",
            **kwargs,
        )
    if name in ("humanact12", "uestc"):
        kw = dict(split=split, num_frames=num_frames, **kwargs)
        if datapath:
            kw["datapath"] = datapath
        return cls(**kw)
    kw = dict(split=split, window=num_frames, **kwargs)
    if datapath:
        kw["datapath"] = datapath
    if name == "genea2023":
        kw["n_seed_poses"] = n_seed_poses
    return cls(**kw)


def get_dataset_loader(
    name: str,
    batch_size: int,
    num_frames: int,
    split: str = "train",
    datapath: Optional[str] = None,
    num_workers: int = 8,
    n_seed_poses: int = 10,
    seed: int = 0,
    process_count: int = 1,
    process_index: int = 0,
    **kwargs,
) -> DataLoader:
    if name == "synthetic" and "n_items" not in kwargs:
        # the in-memory synthetic set must cover at least one full batch;
        # scale it with the requested batch size (2x so shuffling between
        # epochs actually reorders batches) instead of failing the
        # len < batch_size guard below at production batch sizes
        kwargs["n_items"] = max(64, 2 * batch_size)
    dataset = get_dataset(
        name, num_frames, split, datapath, n_seed_poses=n_seed_poses, **kwargs
    )
    if len(dataset) < batch_size:
        # fail loudly here: with drop_last the loader would silently yield
        # ZERO batches (classic cause: num_frames longer than every clip)
        raise ValueError(
            f"dataset [{name}] split={split!r} has {len(dataset)} usable "
            f"items < batch_size={batch_size} (check --num_frames "
            f"{num_frames} against the clip lengths and the data_dir)"
        )
    if name in ("humanact12", "uestc"):
        from gesturediffusion_tpu.data.a2m import collate_a2m

        collate_fn = partial(collate_a2m, max_frames=num_frames)
    elif name in ("humanml", "kit"):
        collate_fn = partial(collate_gesture, max_frames=196)
    else:
        # derive the static audio pad target from the dataset's own
        # audio rate (the 735 default only holds for 22050 Hz / 30 fps)
        spf = (
            round(dataset.sr / dataset.fps)
            if hasattr(dataset, "sr") and hasattr(dataset, "fps")
            else None
        )
        collate_fn = (
            partial(collate_gesture, max_frames=num_frames,
                    audio_samples_per_frame=spf)
            if spf
            else partial(collate_gesture, max_frames=num_frames)
        )
    return DataLoader(
        dataset,
        batch_size=batch_size,
        collate_fn=collate_fn,
        shuffle=(split == "train"),
        drop_last=True,
        num_workers=num_workers,
        seed=seed,
        process_count=process_count,
        process_index=process_index,
    )
