"""Quaternion toolbox for the HumanML3D motion codec, in JAX.

Functional parity surface with the reference's quaternion helpers
(reference: data_loaders/humanml/common/quaternion.py — qmul:33, qrot:54,
qeuler:76, qfix:149, quaternion_to_cont6d:314, cont6d_to_matrix:320,
qslerp:369, qbetween:387), re-derived from the standard closed forms.

Conventions: quaternions are (w, x, y, z), real part first.  The cont6d
representation here stacks the first two *columns* of the rotation matrix
(note: this differs from ``ops.rotations.matrix_to_rotation_6d`` which uses
rows — both conventions exist in the reference and both are preserved).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def qinv(q: jax.Array) -> jax.Array:
    """Conjugate of unit quaternions (..., 4) — delegates to
    rotations.quaternion_invert (same (w,x,y,z) convention)."""
    from gesturediffusion_tpu.ops.rotations import quaternion_invert

    return quaternion_invert(q)


def qnormalize(q: jax.Array) -> jax.Array:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def qmul(q: jax.Array, r: jax.Array) -> jax.Array:
    """Hamilton product q*r — delegates to
    rotations.quaternion_raw_multiply (same (w,x,y,z) convention)."""
    from gesturediffusion_tpu.ops.rotations import quaternion_raw_multiply

    return quaternion_raw_multiply(q, r)


def qrot(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vectors v (..., 3) by quaternions q (..., 4); shapes broadcast."""
    qvec = q[..., 1:]
    uv = jnp.cross(qvec, v)
    uuv = jnp.cross(qvec, uv)
    return v + 2.0 * (q[..., :1] * uv + uuv)


_QEULER_FORMULAS = {
    # order -> per-axis (kind, args) where kind is 'atan2' or 'asin';
    # expressed as lambdas over (q0, q1, q2, q3).
    "xyz": (
        lambda q0, q1, q2, q3: jnp.arctan2(2 * (q0 * q1 - q2 * q3), 1 - 2 * (q1 * q1 + q2 * q2)),
        lambda q0, q1, q2, q3: ("asin", 2 * (q1 * q3 + q0 * q2)),
        lambda q0, q1, q2, q3: jnp.arctan2(2 * (q0 * q3 - q1 * q2), 1 - 2 * (q2 * q2 + q3 * q3)),
    ),
    "yzx": (
        lambda q0, q1, q2, q3: jnp.arctan2(2 * (q0 * q1 - q2 * q3), 1 - 2 * (q1 * q1 + q3 * q3)),
        lambda q0, q1, q2, q3: jnp.arctan2(2 * (q0 * q2 - q1 * q3), 1 - 2 * (q2 * q2 + q3 * q3)),
        lambda q0, q1, q2, q3: ("asin", 2 * (q1 * q2 + q0 * q3)),
    ),
    "zxy": (
        lambda q0, q1, q2, q3: ("asin", 2 * (q0 * q1 + q2 * q3)),
        lambda q0, q1, q2, q3: jnp.arctan2(2 * (q0 * q2 - q1 * q3), 1 - 2 * (q1 * q1 + q2 * q2)),
        lambda q0, q1, q2, q3: jnp.arctan2(2 * (q0 * q3 - q1 * q2), 1 - 2 * (q1 * q1 + q3 * q3)),
    ),
    "xzy": (
        lambda q0, q1, q2, q3: jnp.arctan2(2 * (q0 * q1 + q2 * q3), 1 - 2 * (q1 * q1 + q3 * q3)),
        lambda q0, q1, q2, q3: jnp.arctan2(2 * (q0 * q2 + q1 * q3), 1 - 2 * (q2 * q2 + q3 * q3)),
        lambda q0, q1, q2, q3: ("asin", 2 * (q0 * q3 - q1 * q2)),
    ),
    "yxz": (
        lambda q0, q1, q2, q3: ("asin", 2 * (q0 * q1 - q2 * q3)),
        lambda q0, q1, q2, q3: jnp.arctan2(2 * (q1 * q3 + q0 * q2), 1 - 2 * (q1 * q1 + q2 * q2)),
        lambda q0, q1, q2, q3: jnp.arctan2(2 * (q1 * q2 + q0 * q3), 1 - 2 * (q1 * q1 + q3 * q3)),
    ),
    "zyx": (
        lambda q0, q1, q2, q3: jnp.arctan2(2 * (q0 * q1 + q2 * q3), 1 - 2 * (q1 * q1 + q2 * q2)),
        lambda q0, q1, q2, q3: ("asin", 2 * (q0 * q2 - q1 * q3)),
        lambda q0, q1, q2, q3: jnp.arctan2(2 * (q0 * q3 + q1 * q2), 1 - 2 * (q2 * q2 + q3 * q3)),
    ),
}


def qeuler(q: jax.Array, order: str, epsilon: float = 0.0, deg: bool = True) -> jax.Array:
    """Quaternions (..., 4) -> Euler angles (..., 3) in the given axis order."""
    if order not in _QEULER_FORMULAS:
        raise ValueError(f"unsupported euler order {order}")
    q0, q1, q2, q3 = (q[..., n] for n in range(4))
    comps = []
    for f in _QEULER_FORMULAS[order]:
        val = f(q0, q1, q2, q3)
        if isinstance(val, tuple):  # ('asin', arg) marker
            val = jnp.arcsin(jnp.clip(val[1], -1 + epsilon, 1 - epsilon))
        comps.append(val)
    out = jnp.stack(comps, axis=-1)
    return out * (180.0 / jnp.pi) if deg else out


def qfix(q: jax.Array) -> jax.Array:
    """Enforce sign continuity along the time axis of a (T, J, 4) sequence.

    Picks q or -q per frame so consecutive quaternions have a non-negative
    dot product (reference surface: quaternion.py:149).
    """
    dots = jnp.sum(q[1:] * q[:-1], axis=-1)
    flip = (jnp.cumsum((dots < 0).astype(jnp.int32), axis=0) % 2).astype(bool)
    sign = jnp.where(flip, -1.0, 1.0)[..., None]
    return jnp.concatenate([q[:1], q[1:] * sign], axis=0)


def euler_to_quaternion(e: jax.Array, order: str, deg: bool = False) -> jax.Array:
    """Euler angles (..., 3) -> quaternions (..., 4), intrinsic composition.

    Mirrors the reference's antipodal-sign convention for right-handed orders.
    """
    if deg:
        e = e * (jnp.pi / 180.0)
    x, y, z = e[..., 0], e[..., 1], e[..., 2]
    zeros = jnp.zeros_like(x)
    rx = jnp.stack([jnp.cos(x / 2), jnp.sin(x / 2), zeros, zeros], axis=-1)
    ry = jnp.stack([jnp.cos(y / 2), zeros, jnp.sin(y / 2), zeros], axis=-1)
    rz = jnp.stack([jnp.cos(z / 2), zeros, zeros, jnp.sin(z / 2)], axis=-1)
    table = {"x": rx, "y": ry, "z": rz}
    result = None
    for coord in order:
        r = table[coord]
        result = r if result is None else qmul(result, r)
    if order in ("xyz", "yzx", "zxy"):
        result = -result
    return result


def expmap_to_quaternion(e: jax.Array) -> jax.Array:
    """Axis-angle / exponential map (..., 3) -> quaternions (..., 4)."""
    theta = jnp.linalg.norm(e, axis=-1, keepdims=True)
    w = jnp.cos(0.5 * theta)
    xyz = 0.5 * jnp.sinc(0.5 * theta / jnp.pi) * e
    return jnp.concatenate([w, xyz], axis=-1)


def quaternion_to_matrix(quaternions: jax.Array) -> jax.Array:
    """Quaternions (..., 4) -> matrices (..., 3, 3)."""
    from gesturediffusion_tpu.ops import rotations

    return rotations.quaternion_to_matrix(quaternions)


def quaternion_to_cont6d(quaternions: jax.Array) -> jax.Array:
    """Quaternions -> 6D rep = first two matrix *columns* concatenated."""
    m = quaternion_to_matrix(quaternions)
    return jnp.concatenate([m[..., 0], m[..., 1]], axis=-1)


def cont6d_to_matrix(cont6d: jax.Array) -> jax.Array:
    """Column-convention 6D rep (..., 6) -> rotation matrices (..., 3, 3)."""
    x_raw, y_raw = cont6d[..., 0:3], cont6d[..., 3:6]
    x = x_raw / jnp.linalg.norm(x_raw, axis=-1, keepdims=True)
    z = jnp.cross(x, y_raw)
    z = z / jnp.linalg.norm(z, axis=-1, keepdims=True)
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=-1)


def qpow(q0: jax.Array, t, eps: float = 1e-9) -> jax.Array:
    """Raise unit quaternions to the power(s) t; broadcasts t over q0."""
    q0 = qnormalize(q0)
    theta0 = jnp.arccos(jnp.clip(q0[..., 0], -1.0, 1.0))
    theta0 = jnp.where(jnp.abs(theta0) <= eps, eps, theta0)
    v0 = q0[..., 1:] / jnp.sin(theta0)[..., None]
    t = jnp.asarray(t)
    theta = t.reshape(t.shape + (1,) * theta0.ndim) * theta0
    w = jnp.cos(theta)[..., None]
    xyz = jnp.broadcast_to(v0, theta.shape + (3,)) * jnp.sin(theta)[..., None]
    return jnp.concatenate([w, xyz], axis=-1)


def qslerp(q0: jax.Array, q1: jax.Array, t) -> jax.Array:
    """Spherical interpolation from q0 to q1 at points t; output t.shape + q0.shape."""
    q0 = qnormalize(q0)
    q1 = qnormalize(q1)
    q_ = qpow(qmul(q1, qinv(q0)), t)
    t = jnp.asarray(t)
    q0b = jnp.broadcast_to(q0, t.shape + q0.shape)
    return qmul(q_, q0b)


def qbetween(v0: jax.Array, v1: jax.Array) -> jax.Array:
    """Quaternion rotating v0 onto v1 (both (..., 3))."""
    v = jnp.cross(v0, v1)
    w = jnp.sqrt(
        jnp.sum(v0 * v0, axis=-1, keepdims=True)
        * jnp.sum(v1 * v1, axis=-1, keepdims=True)
    ) + jnp.sum(v0 * v1, axis=-1, keepdims=True)
    return qnormalize(jnp.concatenate([w, v], axis=-1))


def lerp(p0: jax.Array, p1: jax.Array, t) -> jax.Array:
    t = jnp.asarray(t)
    shape_t = t.shape + (1,) * p0.ndim
    return p0 + t.reshape(shape_t) * (p1 - p0)
