"""HumanML3D 263-dim motion feature codec, in JAX.

Functional parity surface with the reference codec
(reference: data_loaders/humanml/scripts/motion_process.py —
recover_root_rot_pos:362, recover_from_rot:384, recover_from_ric:415;
feature layout documented at gaussian_diffusion.py:1418-1424):

    [0]                      root rotation (yaw) velocity
    [1:3]                    root linear velocity (x, z)
    [3]                      root height y
    [4 : 4+(J-1)*3]          rotation-invariant joint positions (RIC)
    [... : ...+(J-1)*6]      joint rotations (cont6d)
    [... : ...+J*3]          local joint velocities
    [-4:]                    foot contact labels

All functions are pure jnp, jit/vmap-friendly (cumsum replaces the
reference's in-place fills).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gesturediffusion_tpu.ops.quaternion import (
    qinv,
    qrot,
    quaternion_to_cont6d,
)


def recover_root_rot_pos(data: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Root yaw quaternion + root position from velocity features.

    data: [..., T, D]; returns (r_rot_quat [..., T, 4], r_pos [..., T, 3]).
    """
    rot_vel = data[..., 0]
    # integrate yaw velocity (shifted so frame 0 has zero rotation)
    r_rot_ang = jnp.cumsum(
        jnp.concatenate(
            [jnp.zeros_like(rot_vel[..., :1]), rot_vel[..., :-1]], axis=-1
        ),
        axis=-1,
    )
    zeros = jnp.zeros_like(r_rot_ang)
    r_rot_quat = jnp.stack(
        [jnp.cos(r_rot_ang), zeros, jnp.sin(r_rot_ang), zeros], axis=-1
    )

    # shifted XZ linear velocity, rotated into world frame, integrated
    vel_xz = jnp.concatenate(
        [jnp.zeros_like(data[..., :1, 1:3]), data[..., :-1, 1:3]], axis=-2
    )
    r_pos = jnp.concatenate(
        [
            vel_xz[..., 0:1],
            jnp.zeros_like(vel_xz[..., 0:1]),
            vel_xz[..., 1:2],
        ],
        axis=-1,
    )
    r_pos = qrot(qinv(r_rot_quat), r_pos)
    r_pos = jnp.cumsum(r_pos, axis=-2)
    r_pos = r_pos.at[..., 1].set(data[..., 3])
    return r_rot_quat, r_pos


def recover_from_ric(data: jax.Array, joints_num: int) -> jax.Array:
    """Rotation-invariant coordinates -> world joint positions [..., T, J, 3]."""
    r_rot_quat, r_pos = recover_root_rot_pos(data)
    positions = data[..., 4 : (joints_num - 1) * 3 + 4]
    positions = positions.reshape(positions.shape[:-1] + (joints_num - 1, 3))

    inv = jnp.broadcast_to(
        qinv(r_rot_quat)[..., None, :], positions.shape[:-1] + (4,)
    )
    positions = qrot(inv, positions)
    positions = positions.at[..., 0].add(r_pos[..., None, 0])
    positions = positions.at[..., 2].add(r_pos[..., None, 2])
    return jnp.concatenate([r_pos[..., None, :], positions], axis=-2)


def recover_from_rot(
    data: jax.Array, joints_num: int, skeleton, offsets
) -> jax.Array:
    """Rotation features -> world joint positions via cont6d FK."""
    r_rot_quat, r_pos = recover_root_rot_pos(data)
    r_rot_cont6d = quaternion_to_cont6d(r_rot_quat)
    start = 1 + 2 + 1 + (joints_num - 1) * 3
    end = start + (joints_num - 1) * 6
    cont6d = jnp.concatenate([r_rot_cont6d, data[..., start:end]], axis=-1)
    cont6d = cont6d.reshape(-1, joints_num, 6)
    r_pos_flat = r_pos.reshape(-1, 3)
    return skeleton.forward_kinematics_cont6d(cont6d, r_pos_flat, offsets)


def recover_rot(data: jax.Array) -> jax.Array:
    """Features -> per-joint cont6d params + padded root translation row
    (reference: motion_process.py:401-415)."""
    joints_num = 22 if data.shape[-1] == 263 else 21
    r_rot_quat, r_pos = recover_root_rot_pos(data)
    r_pos_pad = jnp.concatenate(
        [r_pos, jnp.zeros_like(r_pos)], axis=-1
    )[..., None, :]
    r_rot_cont6d = quaternion_to_cont6d(r_rot_quat)
    start = 1 + 2 + 1 + (joints_num - 1) * 3
    end = start + (joints_num - 1) * 6
    cont6d = jnp.concatenate([r_rot_cont6d, data[..., start:end]], axis=-1)
    cont6d = cont6d.reshape(data.shape[:-1] + (joints_num, 6))
    return jnp.concatenate([cont6d, r_pos_pad], axis=-2)
