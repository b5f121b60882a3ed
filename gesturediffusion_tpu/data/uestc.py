"""UESTC action-to-motion dataset (VIBE-estimated SMPL rotvecs, 40 classes).

Functional parity surface with the reference loader
(reference: data_loaders/a2m/uestc.py:51-215 — vibe_cache_refined.pkl,
per-video frame counts, global translation recovery from the VIBE camera
(get_trans_from_vibe :26-48), 8-view front-view rotation correction
:122-152, 51/67 train/test subject split, min-frame filtering :168-176).

Host-side numpy end to end.
"""

from __future__ import annotations

import os
import pickle

import numpy as np

from gesturediffusion_tpu.data.a2m import A2MDataset
from gesturediffusion_tpu.ops.rotations_np import axis_angle_to_matrix_np

ACTION2MOTION_JOINTS = [8, 1, 2, 3, 4, 5, 6, 7, 0, 9, 10, 11, 12, 13, 14,
                        21, 24, 38]

TRAIN_SUBJECTS = [
    1, 2, 6, 12, 13, 16, 21, 24, 28, 29, 30, 31, 33, 35, 39, 41, 42, 45,
    47, 50, 52, 54, 55, 57, 59, 61, 63, 64, 67, 69, 70, 71, 73, 77, 81,
    84, 86, 87, 88, 90, 91, 93, 96, 99, 102, 103, 104, 107, 108, 112, 113,
]


def get_z(cam_s, cam_pos, joints, img_size, flength):
    """Depth offset approximating orthographic with a perspective camera."""
    joints_orth_target = (cam_s * (joints[:, :2] + cam_pos) + 1) * 0.5 * img_size
    height3d = np.linalg.norm(
        np.max(joints[:, :2], axis=0) - np.min(joints[:, :2], axis=0)
    )
    height2d = np.linalg.norm(
        np.max(joints_orth_target, axis=0) - np.min(joints_orth_target, axis=0)
    )
    return float(np.array(flength * (height3d / height2d)))


def get_trans_from_vibe(vibe, index, use_z=True) -> np.ndarray:
    alltrans = []
    for t in range(vibe["joints3d"][index].shape[0]):
        cam_orig = vibe["orig_cam"][index][t]
        x, y = cam_orig[2], cam_orig[3]
        z = (
            get_z(cam_s=cam_orig[0], cam_pos=cam_orig[2:4],
                  joints=vibe["joints3d"][index][t], img_size=540,
                  flength=500)
            if use_z
            else 0
        )
        alltrans.append([x, y, z])
    alltrans = np.array(alltrans)
    return alltrans - alltrans[0]


def _matrix_to_axis_angle_np(m: np.ndarray) -> np.ndarray:
    # pure-numpy twin of ops.rotations.matrix_to_axis_angle: data loading
    # must never pay a device round-trip (eager readback through the TPU
    # tunnel can hang/crash)
    from gesturediffusion_tpu.ops.rotations_np import matrix_to_axis_angle_np

    return matrix_to_axis_angle_np(m)


class UESTC(A2MDataset):
    dataname = "uestc"

    def __init__(self, datapath="dataset/uestc", method_name="vibe",
                 view="all", **kwargs):
        self.datapath = datapath
        self.method_name = method_name
        self.view = view
        super().__init__(**kwargs)

        with open(os.path.join(datapath, "info", "num_frames_min.txt")) as f:
            num_frames_video = np.asarray(
                [int(s) for s in f.read().splitlines()]
            )
        all_subjects = np.arange(1, 119)
        self._tr_subjects = TRAIN_SUBJECTS
        self._test_subjects = [
            s for s in all_subjects if s not in self._tr_subjects
        ]

        with open(os.path.join(datapath, "info", "names.txt")) as f:
            videos = f.read().splitlines()
        self._videos = videos

        if method_name != "vibe":
            raise ValueError("This method name is not recognized.")
        with open(os.path.join(datapath, "vibe_cache_refined.pkl"), "rb") as f:
            vibe_data = pickle.load(f)
        self._pose = vibe_data["pose"]
        num_frames_method = [p.shape[0] for p in self._pose]
        globpath = os.path.join(datapath, "globtrans_usez.pkl")
        if os.path.exists(globpath):
            with open(globpath, "rb") as f:
                self._globtrans = pickle.load(f)
        else:
            self._globtrans = [
                get_trans_from_vibe(vibe_data, i, use_z=True)
                for i in range(len(self._pose))
            ]
            with open(globpath, "wb") as f:
                pickle.dump(self._globtrans, f)
        self._joints = vibe_data["joints3d"]
        self._jointsIx = ACTION2MOTION_JOINTS

        num_frames_video = np.minimum(
            num_frames_video, num_frames_method
        ).astype(int)
        self._num_frames_in_video = list(num_frames_video)

        self._actions = [self.parse_action(v) for v in videos]
        self.num_actions = 40
        keep = np.arange(40)
        self._action_to_label = {int(x): i for i, x in enumerate(keep)}
        self._label_to_action = {i: int(x) for i, x in enumerate(keep)}
        self.num_classes = 40

        # per-view yaw rotations for front-view correction
        def rot(view):
            theta = -view * np.pi / 4
            return axis_angle_to_matrix_np(
                np.asarray([0.0, theta, 0.0], np.float64)[None]
            )[0]

        rotations = {k: rot(k) for k in range(8)}

        self._train, self._test = [], []
        self.info_actions = []
        for index, video in enumerate(videos):
            act, vw, subject, side = self._get_action_view_subject_side(video)
            self.info_actions.append(
                {"action": act, "view": vw, "subject": subject, "side": side}
            )
            if self.view == "frontview" and side != 1:
                continue
            if side != 1:
                if vw == 8:
                    continue
                rotation = rotations[vw]
                global_matrix = axis_angle_to_matrix_np(
                    self._pose[index][:, :3]
                )
                self._pose[index][:, :3] = _matrix_to_axis_angle_np(
                    rotation @ global_matrix
                )
                self._joints[index] = self._joints[index] @ rotation.T
                self._globtrans[index] = self._globtrans[index] @ rotation.T
            self._joints[index] = (
                self._joints[index] + self._globtrans[index][:, None]
            )
            if subject in self._tr_subjects:
                self._train.append(index)
            elif subject in self._test_subjects:
                self._test.append(index)
            else:
                raise ValueError("This subject doesn't belong to any set.")

        threshold = self.num_frames * 3 / 4 if self.num_frames > 0 else 0
        ok = set(np.where(num_frames_video >= threshold)[0].tolist())
        self._train = list(set(self._train) & ok)
        self._test = list(set(self._test))

        with open(os.path.join(datapath, "info/action_classes.txt")) as f:
            self._action_classes = np.array(f.read().splitlines())

    def _load_joints3D(self, ind, frame_ix):
        if len(self._joints[ind]) == 0:
            raise ValueError(f"Cannot load index {ind} in _load_joints3D.")
        if self._jointsIx is not None:
            return self._joints[ind][frame_ix][:, self._jointsIx]
        return self._joints[ind][frame_ix]

    def _load_rotvec(self, ind, frame_ix):
        return self._pose[ind][frame_ix, :].reshape(-1, 24, 3)

    @staticmethod
    def _get_action_view_subject_side(videopath):
        spl = videopath.split("_")
        return (int(spl[0][1:]), int(spl[1][1:]), int(spl[2][1:]),
                int(spl[3][1:]))

    def parse_action(self, path, return_int=True):
        info = self._get_action_view_subject_side(path)[0]
        return int(info) if return_int else info


def make_synthetic_uestc(
    root: str,
    n_videos: int = 16,
    n_actions: int = 4,
    seed: int = 0,
    min_frames: int = 64,
    max_frames: int = 80,
) -> str:
    """Synthetic vibe_cache_refined.pkl-shaped UESTC fixture for hermetic
    tests (covers train/test subjects, side-2 view correction, all views).

    Layout mirrors what the real dataset directory provides
    (reference: data_loaders/a2m/uestc.py:59-96 — info/num_frames_min.txt,
    info/names.txt, info/action_classes.txt, vibe_cache_refined.pkl with
    pose [T,72] / joints3d [T,49,3] / orig_cam [T,4] lists).
    """
    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(root, "info"), exist_ok=True)
    names, nframes, poses, joints, cams = [], [], [], [], []
    # subjects 1/2 are in TRAIN_SUBJECTS; 3/4 fall into the test split
    subjects = [1, 2, 3, 4]
    for v in range(n_videos):
        act = v % n_actions
        view = v % 8
        subject = subjects[v % len(subjects)]
        side = 1 if v % 2 == 0 else 2
        names.append(f"a{act}_d{view}_p{subject:03d}_c{side}_color.avi")
        t = int(rng.randint(min_frames, max_frames + 1))
        nframes.append(t)
        poses.append(
            np.cumsum(rng.randn(t, 72).astype(np.float32) * 0.02, axis=0)
        )
        joints.append(
            np.cumsum(rng.randn(t, 49, 3).astype(np.float32) * 0.01, axis=0)
        )
        cams.append(
            np.concatenate(
                [
                    rng.uniform(0.8, 1.2, (t, 2)),
                    rng.uniform(-0.1, 0.1, (t, 2)),
                ],
                axis=1,
            ).astype(np.float32)
        )
    with open(os.path.join(root, "info", "names.txt"), "w") as f:
        f.write("\n".join(names) + "\n")
    with open(os.path.join(root, "info", "num_frames_min.txt"), "w") as f:
        f.write("\n".join(str(n) for n in nframes) + "\n")
    with open(os.path.join(root, "info", "action_classes.txt"), "w") as f:
        f.write("\n".join(f"action_{i}" for i in range(40)) + "\n")
    with open(os.path.join(root, "vibe_cache_refined.pkl"), "wb") as f:
        pickle.dump(
            {"pose": poses, "joints3d": joints, "orig_cam": cams}, f
        )
    return root
