"""Numpy twins of the rotation conversions for host-side data prep.

Same math as ops/rotations.py (kept separate so data loading never pays a
device round-trip through the TPU tunnel).
"""

from __future__ import annotations

import numpy as np


def axis_angle_to_quaternion_np(axis_angle: np.ndarray) -> np.ndarray:
    angles = np.linalg.norm(axis_angle, axis=-1, keepdims=True)
    half = angles * 0.5
    small = np.abs(angles) < 1e-6
    sin_half_over_angle = np.where(
        small, 0.5 - angles * angles / 48.0,
        np.sin(half) / np.where(small, 1.0, angles),
    )
    return np.concatenate([np.cos(half), axis_angle * sin_half_over_angle], -1)


def quaternion_to_matrix_np(q: np.ndarray) -> np.ndarray:
    r, i, j, k = (q[..., n] for n in range(4))
    two_s = 2.0 / np.sum(q * q, axis=-1)
    o = np.stack(
        [
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ],
        axis=-1,
    )
    return o.reshape(q.shape[:-1] + (3, 3))


def axis_angle_to_matrix_np(axis_angle: np.ndarray) -> np.ndarray:
    return quaternion_to_matrix_np(axis_angle_to_quaternion_np(axis_angle))


def matrix_to_rotation_6d_np(matrix: np.ndarray) -> np.ndarray:
    return matrix[..., :2, :].reshape(matrix.shape[:-2] + (6,))
