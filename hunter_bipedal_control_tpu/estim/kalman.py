"""Leg-odometry Kalman filter (18-state / 28-measurement), batched.

Parity target: legged_estimation/src/LinearKalmanFilter.cpp:25-337 —
IMU dead-reckoning fused with leg odometry:

    state  x (18) = [base pos (3), base vel (3), foot positions (4x3)]
    meas   y (28) = [-p_foot_rel (12), -v_foot_rel (12), foot heights (4)]

with contact-gated noise inflation (x100 on swing feet, :117-136), LU-based
innovation solve (:138-160), covariance symmetrization + xy-conditioning
(:159-167).  The structure matrices A, B, C are built once; the update is a
single fused dense step that vmaps over scenario batches.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..models.kinematics import contact_jacobians, contact_positions, fk
from ..models.robot import RobotModel
from ..models.spatial import (
    euler_rates_from_global_angular_velocity,
    quat_to_zyx,
    rotation_zyx,
)

NS = 18
NM = 28
NUM_FEET = 4


class KalmanParams(NamedTuple):
    """kalmanFilter block of task.info:336-345."""

    foot_radius: jnp.ndarray
    imu_process_noise_position: jnp.ndarray
    imu_process_noise_velocity: jnp.ndarray
    foot_process_noise_position: jnp.ndarray
    foot_sensor_noise_position: jnp.ndarray
    foot_sensor_noise_velocity: jnp.ndarray
    foot_height_sensor_noise: jnp.ndarray
    high_suspect_number: jnp.ndarray  # 100


def default_kalman_params(dtype=jnp.float32) -> KalmanParams:
    return KalmanParams(
        foot_radius=jnp.asarray(0.02, dtype),
        imu_process_noise_position=jnp.asarray(0.02, dtype),
        imu_process_noise_velocity=jnp.asarray(0.02, dtype),
        foot_process_noise_position=jnp.asarray(0.5, dtype),
        foot_sensor_noise_position=jnp.asarray(0.5, dtype),
        foot_sensor_noise_velocity=jnp.asarray(0.1, dtype),
        foot_height_sensor_noise=jnp.asarray(0.01, dtype),
        high_suspect_number=jnp.asarray(100.0, dtype),
    )


class KalmanState(NamedTuple):
    x_hat: jnp.ndarray        # (18,)
    P: jnp.ndarray            # (18,18)
    feet_heights: jnp.ndarray  # (4,)


def init_kalman_state(dtype=jnp.float32, base_z: float = 0.0) -> KalmanState:
    x = jnp.zeros(NS, dtype).at[2].set(base_z)
    return KalmanState(
        x_hat=x,
        P=100.0 * jnp.eye(NS, dtype=dtype),
        feet_heights=jnp.zeros(NUM_FEET, dtype),
    )


def _structure_matrices(dtype):
    """The constant C (LinearKalmanFilter.cpp:40-57)."""
    C = np.zeros((NM, NS))
    c1 = np.concatenate([np.eye(3), np.zeros((3, 3))], axis=1)
    c2 = np.concatenate([np.zeros((3, 3)), np.eye(3)], axis=1)
    for i in range(4):
        C[3 * i:3 * i + 3, 0:6] = c1
        C[12 + 3 * i:15 + 3 * i, 0:6] = c2
    C[0:12, 6:18] = -np.eye(12)
    C[24, 8] = 1.0
    C[25, 11] = 1.0
    C[26, 14] = 1.0
    C[27, 17] = 1.0
    return jnp.asarray(C, dtype)


def kalman_update(model: RobotModel, params: KalmanParams, state: KalmanState,
                  zyx, joint_pos, joint_vel, omega_world, quat_xyzw,
                  linear_accel_local, contact_flags, dt):
    """One filter tick (LinearKalmanFilter::update :72-184).

    Inputs are the sensor quantities the reference feeds from its hardware
    handles; returns (new KalmanState, base position, base velocity).
    """
    dtype = state.x_hat.dtype
    # relative foot kinematics: base at origin, orientation applied (:86-102)
    q_pino = jnp.concatenate([jnp.zeros(3, dtype), zyx, joint_pos])
    euler_rates = euler_rates_from_global_angular_velocity(zyx, omega_world)
    v_pino = jnp.concatenate([jnp.zeros(3, dtype), euler_rates, joint_vel])
    kin = fk(model, q_pino)
    ee_pos = contact_positions(model, kin)                      # (4,3)
    J = contact_jacobians(model, kin)[:, 0:3, :]
    ee_vel = jnp.einsum("cij,j->ci", J, v_pino)

    ps = (-ee_pos).at[:, 2].add(params.foot_radius).reshape(-1)  # (12,)
    vs = (-ee_vel).reshape(-1)                                   # (12,)
    y = jnp.concatenate([ps, vs, state.feet_heights])

    # A, B with dt (:75-80)
    A = jnp.eye(NS, dtype=dtype)
    A = A.at[0:3, 3:6].set(dt * jnp.eye(3, dtype=dtype))
    B = jnp.zeros((NS, 3), dtype)
    B = B.at[0:3, :].set(0.5 * dt * dt * jnp.eye(3, dtype=dtype))
    B = B.at[3:6, :].set(dt * jnp.eye(3, dtype=dtype))

    # noise (:105-136): base q scaled by dt terms, contact gating x100.
    # The gate interpolates continuously in the contact weight so callers
    # may pass fractional confidences (the kinematic rocker-gated
    # leg-odometry trust, runtime/mj_loop.py kf_contact='rocker'); for the
    # reference's binary flags this is EXACTLY the original where(flag, 1, hs).
    hs = params.high_suspect_number
    w_c = jnp.clip(contact_flags, 0.0, 1.0)
    gate = 1.0 + (hs - 1.0) * (1.0 - w_c)                        # (4,)
    q_diag = jnp.concatenate(
        [
            jnp.full(3, dt / 20.0, dtype) * params.imu_process_noise_position,
            jnp.full(3, dt * 9.81 / 20.0, dtype) * params.imu_process_noise_velocity,
            (dt * params.foot_process_noise_position) * jnp.repeat(gate, 3),
        ]
    )
    r_diag = jnp.concatenate(
        [
            params.foot_sensor_noise_position * jnp.repeat(gate, 3),
            params.foot_sensor_noise_velocity * jnp.repeat(gate, 3),
            params.foot_height_sensor_noise * gate,
        ]
    )
    Qn = jnp.diag(q_diag)
    Rn = jnp.diag(r_diag)

    # world-frame acceleration (:138-139)
    accel = rotation_zyx(quat_to_zyx(quat_xyzw)) @ linear_accel_local + jnp.asarray(
        [0.0, 0.0, -9.81], dtype
    )

    C = _structure_matrices(dtype)
    x_pred = A @ state.x_hat + B @ accel
    Pm = A @ state.P @ A.T + Qn
    yhat = C @ x_pred
    ey = y - yhat
    Ssy = C @ Pm @ C.T + Rn
    # innovation covariance is SPD (noise-regularized): pivoted Gauss-Jordan
    # replaces the 28x28 row-sequential LU on the 500 Hz device loop
    from ..ops.linalg import gj_inverse
    sol = gj_inverse(Ssy) @ jnp.concatenate([ey[:, None], C], axis=1)
    s_ey, s_C = sol[:, 0], sol[:, 1:]
    x_new = x_pred + Pm @ C.T @ s_ey
    P_new = (jnp.eye(NS, dtype=dtype) - Pm @ C.T @ s_C) @ Pm
    P_new = 0.5 * (P_new + P_new.T)

    # xy covariance conditioning (:162-167)
    det_xy = P_new[0, 0] * P_new[1, 1] - P_new[0, 1] * P_new[1, 0]
    cond = det_xy > 1e-6
    P_cond = P_new.at[0:2, 2:].set(0.0).at[2:, 0:2].set(0.0)
    P_cond = P_cond.at[0:2, 0:2].set(P_new[0:2, 0:2] / 10.0)
    P_new = jnp.where(cond, P_cond, P_new)

    new_state = KalmanState(x_hat=x_new, P=P_new, feet_heights=state.feet_heights)
    return new_state, x_new[0:3], x_new[3:6]


def reset_kalman(dtype=jnp.float32) -> KalmanState:
    """/reset_estimation behavior (:242-278)."""
    return init_kalman_state(dtype)


def fuse_external_position(model: RobotModel, state: KalmanState, params: KalmanParams,
                           new_pos, zyx, joint_pos, contact_flags) -> KalmanState:
    """External odometry fusion (updateFromTopic, LinearKalmanFilter.cpp
    :186-241): overwrite the base position with an external estimate (e.g.
    tracking camera), recompute foot-position states from FK at the new
    base, and pin contacting feet heights."""
    q = jnp.concatenate([new_pos, zyx, joint_pos])
    kin = fk(model, q)
    feet = contact_positions(model, kin)
    feet = feet.at[:, 2].add(-params.foot_radius)
    x = state.x_hat
    x = x.at[0:3].set(new_pos)
    x = x.at[6:18].set(feet.reshape(-1))
    heights = jnp.where(contact_flags > 0.5, feet[:, 2], state.feet_heights)
    return state._replace(x_hat=x, feet_heights=heights)
