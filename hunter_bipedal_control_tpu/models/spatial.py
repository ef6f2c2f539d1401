"""Rotation / spatial algebra utilities (ZYX-Euler floating-base convention).

The whole framework parameterizes the floating base with ZYX Euler angles
(yaw-pitch-roll), matching the centroidal-state convention of the reference
stack (state layout documented at
legged_controllers/config/hunter/task.info:154-183 and used throughout
legged_wbc/src/WbcBase.cpp:70-79).  Generalized coordinates:

    q = [p_W (3), theta_zyx (3), q_joints (nj)]
    v = [dp_W (3), dtheta_zyx (3), dq_joints (nj)]

i.e. base linear velocity is expressed in the world frame and base angular
velocity as Euler-rate derivatives — the same convention OCS2's centroidal
model mapping uses.  All functions are pure jnp and `vmap`/`jit` friendly.
"""
from __future__ import annotations

import jax.numpy as jnp


def rot_x(a):
    c, s = jnp.cos(a), jnp.sin(a)
    return jnp.array([[1.0, 0.0, 0.0], [0.0, c, -s], [0.0, s, c]])


def rot_y(a):
    c, s = jnp.cos(a), jnp.sin(a)
    return jnp.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]])


def rot_z(a):
    c, s = jnp.cos(a), jnp.sin(a)
    return jnp.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def rotation_zyx(zyx):
    """World_R_body from ZYX Euler angles theta = (yaw z, pitch y, roll x).

    Equivalent of OCS2 ``getRotationMatrixFromZyxEulerAngles``.
    """
    z, y, x = zyx[0], zyx[1], zyx[2]
    cz, sz = jnp.cos(z), jnp.sin(z)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cx, sx = jnp.cos(x), jnp.sin(x)
    return jnp.array(
        [
            [cz * cy, cz * sy * sx - sz * cx, cz * sy * cx + sz * sx],
            [sz * cy, sz * sy * sx + cz * cx, sz * sy * cx - cz * sx],
            [-sy, cy * sx, cy * cx],
        ]
    )


def euler_rate_map_zyx(zyx):
    """E(theta) with omega_world = E @ dtheta_zyx.

    Equivalent of OCS2 ``getGlobalAngularVelocityFromEulerAnglesZyxDerivatives``.
    """
    z, y = zyx[0], zyx[1]
    cz, sz = jnp.cos(z), jnp.sin(z)
    cy, sy = jnp.cos(y), jnp.sin(y)
    return jnp.array(
        [
            [0.0, -sz, cz * cy],
            [0.0, cz, sz * cy],
            [1.0, 0.0, -sy],
        ]
    )


def global_angular_velocity_from_euler_rates(zyx, dzyx):
    return euler_rate_map_zyx(zyx) @ dzyx


def euler_rates_from_global_angular_velocity(zyx, omega_world):
    """Inverse of :func:`euler_rate_map_zyx` (closed form; singular at |pitch|=pi/2)."""
    z, y = zyx[0], zyx[1]
    cz, sz = jnp.cos(z), jnp.sin(z)
    cy, sy = jnp.cos(y), jnp.sin(y)
    ty = sy / cy
    Einv = jnp.array(
        [
            [cz * ty, sz * ty, 1.0],
            [-sz, cz, 0.0],
            [cz / cy, sz / cy, 0.0],
        ]
    )
    return Einv @ omega_world


def euler_rates_from_local_angular_velocity(zyx, omega_local):
    """Equivalent of OCS2 ``getEulerAnglesZyxDerivativesFromLocalAngularVelocity``."""
    return euler_rates_from_global_angular_velocity(zyx, rotation_zyx(zyx) @ omega_local)


def skew(v):
    return jnp.array(
        [
            [0.0, -v[2], v[1]],
            [v[2], 0.0, -v[0]],
            [-v[1], v[0], 0.0],
        ]
    )


def axis_angle_rotation(axis, angle):
    """Rodrigues rotation about a (unit) axis."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    K = skew(axis)
    return jnp.eye(3, dtype=K.dtype) + s * K + (1.0 - c) * (K @ K)


def quat_to_zyx(quat_xyzw):
    """Quaternion (x,y,z,w) -> ZYX Euler (yaw, pitch, roll)."""
    x, y, z, w = quat_xyzw[0], quat_xyzw[1], quat_xyzw[2], quat_xyzw[3]
    yaw = jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))
    sp = jnp.clip(2.0 * (w * y - z * x), -1.0, 1.0)
    pitch = jnp.arcsin(sp)
    roll = jnp.arctan2(2.0 * (w * x + y * z), 1.0 - 2.0 * (x * x + y * y))
    return jnp.stack([yaw, pitch, roll])


def zyx_to_quat(zyx):
    """ZYX Euler (yaw, pitch, roll) -> quaternion (x,y,z,w)."""
    hz, hy, hx = 0.5 * zyx[0], 0.5 * zyx[1], 0.5 * zyx[2]
    cz, sz = jnp.cos(hz), jnp.sin(hz)
    cy, sy = jnp.cos(hy), jnp.sin(hy)
    cx, sx = jnp.cos(hx), jnp.sin(hx)
    w = cz * cy * cx + sz * sy * sx
    x = cz * cy * sx - sz * sy * cx
    y = cz * sy * cx + sz * cy * sx
    z = sz * cy * cx - cz * sy * sx
    return jnp.stack([x, y, z, w])


def log3(R):
    """SO(3) log map: rotation matrix -> rotation vector (Pinocchio log3)."""
    cos_theta = jnp.clip(0.5 * (jnp.trace(R) - 1.0), -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    vee = 0.5 * jnp.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    # theta/sin(theta), stable near 0
    small = theta < 1e-6
    scale = jnp.where(small, 1.0 + theta * theta / 6.0, theta / jnp.sin(jnp.where(small, 1.0, theta)))
    return scale * vee


def rotation_error_in_world(R_des, R_meas):
    """World-frame rotation error used by the WBC base-angular task
    (ocs2 ``rotationErrorInWorld``, consumed at legged_wbc/src/WbcBase.cpp:281)."""
    return R_meas @ log3(R_meas.T @ R_des)


def wrap_to_pi(a):
    return jnp.mod(a + jnp.pi, 2.0 * jnp.pi) - jnp.pi


def shortest_angular_distance(a_from, a_to):
    return wrap_to_pi(a_to - a_from)
