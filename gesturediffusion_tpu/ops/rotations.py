"""Rotation representation conversions in JAX.

Functional parity surface with the reference's PyTorch3D-derived helpers
(reference: utils/rotation_conversions.py) — quaternion/matrix/axis-angle/
euler/6D conversions — re-derived from the standard closed forms and written
as batched jax.numpy functions.  All functions accept arbitrary leading batch
dimensions and operate on the trailing ones.

Conventions (matching the reference):
  * Quaternions are (w, x, y, z), unit norm, real part first.
  * Matrices are applied to column vectors: ``p' = R @ p``.
  * The 6D representation is the first two rows of the rotation matrix,
    flattened (Zhou et al., CVPR'19); decoding is Gram–Schmidt.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quaternion_to_matrix(quaternions: jax.Array) -> jax.Array:
    """Convert unit quaternions (..., 4) (w,x,y,z) to matrices (..., 3, 3).

    Reference surface: utils/rotation_conversions.py:38.
    """
    r, i, j, k = (quaternions[..., n] for n in range(4))
    two_s = 2.0 / jnp.sum(quaternions * quaternions, axis=-1)

    o = jnp.stack(
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
    return o.reshape(quaternions.shape[:-1] + (3, 3))


def _sqrt_positive_part(x: jax.Array) -> jax.Array:
    """sqrt(max(0, x)) with a subgradient of zero where x <= 0."""
    return jnp.sqrt(jnp.maximum(x, 0.0))


def matrix_to_quaternion(matrix: jax.Array) -> jax.Array:
    """Convert rotation matrices (..., 3, 3) to quaternions (..., 4) (w,x,y,z).

    Shepperd-style closed form with component signs taken from the
    off-diagonal differences; always returns w >= 0 — the convention the
    reference stack assumes (reference surface:
    utils/rotation_conversions.py:98).
    """
    m = matrix
    m00, m11, m22 = m[..., 0, 0], m[..., 1, 1], m[..., 2, 2]
    w = 0.5 * _sqrt_positive_part(1.0 + m00 + m11 + m22)
    x = 0.5 * _sqrt_positive_part(1.0 + m00 - m11 - m22)
    y = 0.5 * _sqrt_positive_part(1.0 - m00 + m11 - m22)
    z = 0.5 * _sqrt_positive_part(1.0 - m00 - m11 + m22)
    x = jnp.copysign(x, m[..., 2, 1] - m[..., 1, 2])
    y = jnp.copysign(y, m[..., 0, 2] - m[..., 2, 0])
    z = jnp.copysign(z, m[..., 1, 0] - m[..., 0, 1])
    return jnp.stack([w, x, y, z], axis=-1)


def standardize_quaternion(quaternions: jax.Array) -> jax.Array:
    """Force the real part to be non-negative (q and -q are the same rotation)."""
    return jnp.where(quaternions[..., :1] < 0, -quaternions, quaternions)


def quaternion_raw_multiply(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product of two quaternion arrays (..., 4)."""
    aw, ax, ay, az = (a[..., n] for n in range(4))
    bw, bx, by, bz = (b[..., n] for n in range(4))
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quaternion_multiply(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product, standardized to non-negative real part."""
    return standardize_quaternion(quaternion_raw_multiply(a, b))


def quaternion_invert(quaternion: jax.Array) -> jax.Array:
    """Inverse (conjugate) of unit quaternions."""
    return quaternion * jnp.asarray([1.0, -1.0, -1.0, -1.0], quaternion.dtype)


def quaternion_apply(quaternion: jax.Array, point: jax.Array) -> jax.Array:
    """Rotate points (..., 3) by unit quaternions (..., 4)."""
    real_parts = jnp.zeros_like(point[..., :1])
    point_as_quaternion = jnp.concatenate([real_parts, point], axis=-1)
    out = quaternion_raw_multiply(
        quaternion_raw_multiply(quaternion, point_as_quaternion),
        quaternion_invert(quaternion),
    )
    return out[..., 1:]


def axis_angle_to_quaternion(axis_angle: jax.Array) -> jax.Array:
    """Axis-angle vectors (..., 3) -> quaternions (..., 4).

    Uses the small-angle Taylor expansion of sin(x/2)/x near zero for
    stability (reference surface: utils/rotation_conversions.py:440).
    The norm is computed with a clamped sqrt so the gradient at the zero
    rotation is zero instead of NaN (needed by SMPLify-style fits that
    initialize poses at identity).
    """
    sq = jnp.sum(axis_angle * axis_angle, axis=-1, keepdims=True)
    angles = jnp.sqrt(jnp.maximum(sq, 1e-24))
    half_angles = angles * 0.5
    eps = 1e-6
    small = jnp.abs(angles) < eps
    # sin(x/2)/x ~ 1/2 - x^2/48
    sin_half_over_angle = jnp.where(
        small,
        0.5 - (angles * angles) / 48.0,
        jnp.sin(half_angles) / jnp.where(small, jnp.ones_like(angles), angles),
    )
    return jnp.concatenate(
        [jnp.cos(half_angles), axis_angle * sin_half_over_angle], axis=-1
    )


def quaternion_to_axis_angle(quaternions: jax.Array) -> jax.Array:
    """Quaternions (..., 4) -> axis-angle vectors (..., 3)."""
    norms = jnp.linalg.norm(quaternions[..., 1:], axis=-1, keepdims=True)
    half_angles = jnp.arctan2(norms, quaternions[..., :1])
    angles = 2.0 * half_angles
    eps = 1e-6
    small = jnp.abs(angles) < eps
    sin_half_over_angle = jnp.where(
        small,
        0.5 - (angles * angles) / 48.0,
        jnp.sin(half_angles) / jnp.where(small, jnp.ones_like(angles), angles),
    )
    return quaternions[..., 1:] / sin_half_over_angle


def axis_angle_to_matrix(axis_angle: jax.Array) -> jax.Array:
    """Axis-angle (..., 3) -> rotation matrices (..., 3, 3).

    Reference surface: utils/rotation_conversions.py:418.
    """
    return quaternion_to_matrix(axis_angle_to_quaternion(axis_angle))


def matrix_to_axis_angle(matrix: jax.Array) -> jax.Array:
    """Rotation matrices (..., 3, 3) -> axis-angle (..., 3)."""
    return quaternion_to_axis_angle(matrix_to_quaternion(matrix))


def rotation_6d_to_matrix(d6: jax.Array) -> jax.Array:
    """6D rotation representation (..., 6) -> matrices (..., 3, 3).

    Gram–Schmidt orthogonalization of the two encoded rows (Zhou et al.).
    This is the workhorse conversion of the motion stack (reference surface:
    utils/rotation_conversions.py:513).
    """
    def safe_normalize(v):
        # clamped norm: degenerate (near-zero) inputs stay finite instead of
        # poisoning downstream FK/eval with NaNs
        sq = jnp.sum(v * v, axis=-1, keepdims=True)
        return v / jnp.sqrt(jnp.maximum(sq, 1e-12))

    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = safe_normalize(a1)
    b2 = safe_normalize(a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def matrix_to_rotation_6d(matrix: jax.Array) -> jax.Array:
    """Rotation matrices (..., 3, 3) -> 6D representation (..., 6).

    First two rows, flattened (reference surface:
    utils/rotation_conversions.py:537).
    """
    return matrix[..., :2, :].reshape(matrix.shape[:-2] + (6,))


_EULER_AXES = {"X": 0, "Y": 1, "Z": 2}


def _axis_angle_rotation(axis: str, angle: jax.Array) -> jax.Array:
    """Rotation matrix about a named principal axis."""
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(angle), jnp.zeros_like(angle)
    if axis == "X":
        flat = (one, zero, zero, zero, cos, -sin, zero, sin, cos)
    elif axis == "Y":
        flat = (cos, zero, sin, zero, one, zero, -sin, zero, cos)
    elif axis == "Z":
        flat = (cos, -sin, zero, sin, cos, zero, zero, zero, one)
    else:
        raise ValueError(f"invalid axis {axis}")
    return jnp.stack(flat, axis=-1).reshape(angle.shape + (3, 3))


def euler_angles_to_matrix(euler_angles: jax.Array, convention: str) -> jax.Array:
    """Euler angles (..., 3) -> rotation matrices (..., 3, 3).

    ``convention`` is a 3-letter string from {X, Y, Z}, intrinsic rotations
    (reference surface: utils/rotation_conversions.py:218).
    """
    if len(convention) != 3 or any(c not in _EULER_AXES for c in convention):
        raise ValueError(f"invalid convention {convention}")
    matrices = [
        _axis_angle_rotation(c, euler_angles[..., i])
        for i, c in enumerate(convention)
    ]
    return matrices[0] @ matrices[1] @ matrices[2]


def _angle_from_tan(
    axis: str, other_axis: str, data: jax.Array, horizontal: bool, tait_bryan: bool
) -> jax.Array:
    i1, i2 = {"X": (2, 1), "Y": (0, 2), "Z": (1, 0)}[axis]
    if horizontal:
        i2, i1 = i1, i2
    even = (axis + other_axis) in {"XY", "YZ", "ZX"}
    if horizontal == even:
        return jnp.arctan2(data[..., i1], data[..., i2])
    if tait_bryan:
        return jnp.arctan2(-data[..., i2], data[..., i1])
    return jnp.arctan2(data[..., i2], -data[..., i1])


def matrix_to_euler_angles(matrix: jax.Array, convention: str) -> jax.Array:
    """Rotation matrices (..., 3, 3) -> Euler angles (..., 3).

    Reference surface: utils/rotation_conversions.py:151.
    """
    if len(convention) != 3 or any(c not in _EULER_AXES for c in convention):
        raise ValueError(f"invalid convention {convention}")
    i0 = _EULER_AXES[convention[0]]
    i2 = _EULER_AXES[convention[2]]
    tait_bryan = i0 != i2
    if tait_bryan:
        central_angle = jnp.arcsin(
            jnp.clip(matrix[..., i0, i2] * (-1.0 if i0 - i2 in [-1, 2] else 1.0), -1, 1)
        )
    else:
        central_angle = jnp.arccos(jnp.clip(matrix[..., i0, i0], -1, 1))

    o = (
        _angle_from_tan(
            convention[0], convention[1], matrix[..., i2], False, tait_bryan
        ),
        central_angle,
        _angle_from_tan(
            convention[2], convention[1], matrix[..., i0, :], True, tait_bryan
        ),
    )
    return jnp.stack(o, axis=-1)


def random_quaternions(key: jax.Array, n: int, dtype=jnp.float32) -> jax.Array:
    """Uniformly-distributed random unit quaternions (n, 4)."""
    o = jax.random.normal(key, (n, 4), dtype=dtype)
    return o / jnp.linalg.norm(o, axis=-1, keepdims=True)


def random_rotations(key: jax.Array, n: int, dtype=jnp.float32) -> jax.Array:
    """Uniformly-distributed random rotation matrices (n, 3, 3)."""
    return quaternion_to_matrix(random_quaternions(key, n, dtype=dtype))
