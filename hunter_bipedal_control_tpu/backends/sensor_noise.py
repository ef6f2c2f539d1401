"""Sensor noise & bias models for the simulation backends.

The reference declares IMU covariances in its Gazebo backend config
(legged_gazebo/config/default.yaml: orientation 0.0012, angular velocity
0.0004, linear acceleration 0.01 — diagonal covariances) and publishes them
with the IMU handle (LeggedHWSim.cpp:113-131; the plugin body carries a
"TODO Add noise" — the covariances are declared but Gazebo feeds clean
signals).  This module actually injects that noise, plus slowly-walking
gyro/accel biases and encoder noise, so the Kalman filter's contact-gated
inflation and dead-reckoning are exercised under realistic sensing.

Two implementations with shared parameters:
  - in-graph (jax, PRNG threaded through the loop carry) for the
    `fullorder` backend — vmappable across scenario sweeps;
  - host-side (numpy, stateful) for the MuJoCo plant loop.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class SensorNoiseParams(NamedTuple):
    """Per-sample standard deviations (sqrt of the reference's declared
    diagonal covariances) + bias random-walk intensities."""

    ori_std: jnp.ndarray          # rad, sqrt(0.0012) ~ 0.035
    gyro_std: jnp.ndarray         # rad/s, sqrt(0.0004) = 0.02
    accel_std: jnp.ndarray        # m/s^2, sqrt(0.01) = 0.1
    encoder_pos_std: jnp.ndarray  # rad
    encoder_vel_std: jnp.ndarray  # rad/s
    gyro_bias_std: jnp.ndarray    # initial bias draw, rad/s
    accel_bias_std: jnp.ndarray   # initial bias draw, m/s^2
    bias_walk_std: jnp.ndarray    # random-walk intensity per sqrt(s)


def default_sensor_noise_params(dtype=jnp.float32) -> SensorNoiseParams:
    return SensorNoiseParams(
        ori_std=jnp.asarray(np.sqrt(0.0012), dtype),
        gyro_std=jnp.asarray(np.sqrt(0.0004), dtype),
        accel_std=jnp.asarray(np.sqrt(0.01), dtype),
        encoder_pos_std=jnp.asarray(5e-4, dtype),
        encoder_vel_std=jnp.asarray(5e-3, dtype),
        gyro_bias_std=jnp.asarray(2e-3, dtype),
        accel_bias_std=jnp.asarray(2e-2, dtype),
        bias_walk_std=jnp.asarray(1e-3, dtype),
    )


# ---------------------------------------------------------------------------
# in-graph (fullorder backend)
# ---------------------------------------------------------------------------


class NoiseState(NamedTuple):
    key: jnp.ndarray          # PRNG key (uint32 (2,))
    gyro_bias: jnp.ndarray    # (3,)
    accel_bias: jnp.ndarray   # (3,)


def init_noise_state(params: SensorNoiseParams, seed_or_key=0,
                     dtype=jnp.float32) -> NoiseState:
    key = (jax.random.PRNGKey(seed_or_key)
           if jnp.ndim(seed_or_key) == 0 else seed_or_key)
    k1, k2, key = jax.random.split(key, 3)
    return NoiseState(
        key=key,
        gyro_bias=(params.gyro_bias_std
                   * jax.random.normal(k1, (3,), dtype)),
        accel_bias=(params.accel_bias_std
                    * jax.random.normal(k2, (3,), dtype)),
    )


def corrupt(params: SensorNoiseParams, state: NoiseState, quat_xyzw,
            omega_local, accel_local, joint_pos, joint_vel, dt):
    """Apply one tick of sensor corruption.  Returns
    (new NoiseState, quat, omega, accel, joint_pos, joint_vel)."""
    from ..models.spatial import quat_to_zyx, zyx_to_quat

    dtype = omega_local.dtype
    key = state.key
    keys = jax.random.split(key, 8)
    n = lambda k, sh: jax.random.normal(k, sh, dtype)

    sdt = jnp.sqrt(jnp.asarray(dt, dtype))
    gyro_bias = state.gyro_bias + params.bias_walk_std * sdt * n(keys[0], (3,))
    accel_bias = state.accel_bias + params.bias_walk_std * sdt * n(keys[1], (3,))

    # orientation: small additive euler-angle noise (away from gimbal lock
    # this equals a small-angle rotation perturbation)
    zyx = quat_to_zyx(quat_xyzw) + params.ori_std * n(keys[2], (3,))
    quat = zyx_to_quat(zyx)
    omega = omega_local + gyro_bias + params.gyro_std * n(keys[3], (3,))
    accel = accel_local + accel_bias + params.accel_std * n(keys[4], (3,))
    qj = joint_pos + params.encoder_pos_std * n(keys[5], joint_pos.shape)
    vj = joint_vel + params.encoder_vel_std * n(keys[6], joint_vel.shape)
    return (NoiseState(key=keys[7], gyro_bias=gyro_bias,
                       accel_bias=accel_bias), quat, omega, accel, qj, vj)


# ---------------------------------------------------------------------------
# host-side (MuJoCo plant loop)
# ---------------------------------------------------------------------------


class SensorNoise:
    """Stateful numpy twin of `corrupt` for the host-side MuJoCo loop
    (`runtime/mj_loop.py` passes sensors() dicts through ``corrupt``)."""

    def __init__(self, params: SensorNoiseParams | None = None, seed=0):
        self.p = params or default_sensor_noise_params()
        self.rng = np.random.default_rng(seed)
        self.gyro_bias = float(self.p.gyro_bias_std) * self.rng.standard_normal(3)
        self.accel_bias = float(self.p.accel_bias_std) * self.rng.standard_normal(3)

    def corrupt(self, sensors: dict, dt: float) -> dict:
        p, rng = self.p, self.rng
        sdt = np.sqrt(dt)
        self.gyro_bias = self.gyro_bias + float(p.bias_walk_std) * sdt * rng.standard_normal(3)
        self.accel_bias = self.accel_bias + float(p.bias_walk_std) * sdt * rng.standard_normal(3)
        out = dict(sensors)
        # quaternion perturbation by a small random rotation
        ang = float(p.ori_std) * rng.standard_normal(3)
        half = 0.5 * ang
        dq = np.concatenate([half, [1.0]])
        dq /= np.linalg.norm(dq)
        x1, y1, z1, w1 = dq
        x2, y2, z2, w2 = sensors["quat"]
        out["quat"] = np.array([
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ])
        out["omega_local"] = (sensors["omega_local"] + self.gyro_bias
                              + float(p.gyro_std) * rng.standard_normal(3))
        out["accel_local"] = (sensors["accel_local"] + self.accel_bias
                              + float(p.accel_std) * rng.standard_normal(3))
        out["joint_pos"] = (sensors["joint_pos"]
                            + float(p.encoder_pos_std) * rng.standard_normal(10))
        out["joint_vel"] = (sensors["joint_vel"]
                            + float(p.encoder_vel_std) * rng.standard_normal(10))
        return out
