"""Target trajectories (fixed-size pytree) + command shaping.

Parity targets:
  - OCS2 ``TargetTrajectories`` with linear interpolation (getDesiredState)
  - legged_controllers/src/TargetTrajectoriesPublisher.cpp:29-177 —
    cmd_vel -> 2-point target trajectory, slew-rate limiting, deadband,
    pose-goal targets.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..models.spatial import rotation_zyx

T_NODES = 8  # fixed node capacity


class TargetTrajectories(NamedTuple):
    times: jnp.ndarray   # (T,)
    states: jnp.ndarray  # (T, nx)
    inputs: jnp.ndarray  # (T, nu)


def interp_state(tt: TargetTrajectories, t) -> jnp.ndarray:
    return _interp(tt.times, tt.states, t)


def interp_input(tt: TargetTrajectories, t) -> jnp.ndarray:
    return _interp(tt.times, tt.inputs, t)


def _interp(times, vals, t):
    n = times.shape[0]
    i = jnp.clip(jnp.searchsorted(times, t, side="right") - 1, 0, n - 2)
    t0, t1 = times[i], times[i + 1]
    w = jnp.clip((t - t0) / jnp.maximum(t1 - t0, 1e-9), 0.0, 1.0)
    return (1.0 - w) * vals[i] + w * vals[i + 1]


class CmdVelConfig(NamedTuple):
    """reference.info values + publisher-side shaping constants."""

    com_height: jnp.ndarray          # 0.63
    default_joints: jnp.ndarray      # (nj,)
    target_displacement_velocity: jnp.ndarray
    target_rotation_velocity: jnp.ndarray
    change_limit: jnp.ndarray        # slew rate per tick (TargetTrajectoriesPublisher.h:97)
    deadband: jnp.ndarray            # |v| below this zeroed (.cpp:109-112)
    # Terminal-node span multiplier for the 2-point cmd_vel target.  The
    # reference emits [t, t+horizon] (.cpp:121-125); for a 2-point LINEAR
    # target, moving the end node to t + span*horizon with the pose
    # advanced by span*horizon*v leaves every in-horizon interpolant
    # BITWISE identical (same slope) and only extends the extrapolation
    # range, so the swing planner's next_middle_time samples (up to ~1.5
    # horizons ahead) and the foothold_yaw_lead stop clamping at the
    # terminal yaw (the ADVICE-r4 saturation).  1.0 = reference span.
    span_scale: jnp.ndarray = 1.0


def default_cmd_vel_config(nj=10, dtype=jnp.float32) -> CmdVelConfig:
    dj = jnp.asarray(
        [0.10, 0.00, 0.40, 0.93, 0.53, -0.10, 0.00, -0.40, 0.93, -0.53], dtype=dtype
    )
    return CmdVelConfig(
        com_height=jnp.asarray(0.63, dtype),
        default_joints=dj,
        target_displacement_velocity=jnp.asarray(0.5, dtype),
        target_rotation_velocity=jnp.asarray(1.57, dtype),
        change_limit=jnp.asarray(0.05, dtype),
        deadband=jnp.asarray(0.05, dtype),
        span_scale=jnp.asarray(1.0, dtype),
    )


def filter_cmd_vel(cmd_vel, last_cmd_vel, cfg: CmdVelConfig):
    """Slew-rate limit + deadband (TargetTrajectoriesPublisher cmdVelCallback)."""
    delta = jnp.clip(cmd_vel - last_cmd_vel, -cfg.change_limit, cfg.change_limit)
    out = last_cmd_vel + delta
    out = jnp.where(jnp.abs(out) < cfg.deadband, 0.0, out)
    return out


def estimate_time_to_target(pos_err, yaw_err, cfg: CmdVelConfig):
    """TargetTrajectoriesPublisher::estimateTimeToTarget (.cpp:29-38):
    max of displacement / targetDisplacementVelocity and
    |dyaw| / targetRotationVelocity."""
    t_disp = pos_err / cfg.target_displacement_velocity
    t_rot = jnp.abs(yaw_err) / cfg.target_rotation_velocity
    return jnp.maximum(t_disp, t_rot)


def goal_to_target(goal_pose, observation_state, t_now, cfg: CmdVelConfig,
                   nu=22) -> TargetTrajectories:
    """goalToTargetTrajectories (.cpp:83-100): a world-frame pose goal
    (x, y, yaw) becomes a 2-point trajectory whose duration comes from
    estimateTimeToTarget; z snaps to comHeight, roll/pitch to zero."""
    dtype = observation_state.dtype
    current_pose = observation_state[6:12]
    target_pose = jnp.array(
        [goal_pose[0], goal_pose[1], cfg.com_height,
         goal_pose[2], 0.0, 0.0], dtype=dtype,
    )
    pos_err = jnp.linalg.norm(target_pose[0:2] - current_pose[0:2])
    yaw_err = target_pose[3] - current_pose[3]
    T = estimate_time_to_target(pos_err, yaw_err, cfg)

    nx = observation_state.shape[0]
    s0 = jnp.zeros(nx, dtype)
    s0 = s0.at[6:12].set(current_pose)
    s0 = s0.at[12:].set(cfg.default_joints)
    s1 = s0.at[6:12].set(target_pose)

    times = jnp.full((T_NODES,), t_now + T, dtype).at[0].set(t_now)
    states = jnp.tile(s1[None], (T_NODES, 1)).at[0].set(s0)
    inputs = jnp.zeros((T_NODES, nu), dtype)
    return TargetTrajectories(times=times, states=states, inputs=inputs)


def body_rotation_to_target(target_euler, observation_state, t_now, cfg: CmdVelConfig,
                            nu=22, time_to_target=None) -> TargetTrajectories:
    """bodyRotationToTargetTrajectories (TargetTrajectoriesPublisher.cpp:61-81):
    hold xy, slew z toward comHeight by at most change_limit, command the
    target zyx attitude (the gamepad /body_rotation posture mode).
    target_euler = (yaw, pitch, roll) i.e. the zyx euler target."""
    dtype = observation_state.dtype
    current_pose = observation_state[6:12]
    dz = jnp.clip(cfg.com_height - current_pose[2], -cfg.change_limit, cfg.change_limit)
    # the reference uses the change-limit-clipped z for the TARGET state too
    # (cmdPosToTargetTrajectories builds targetPose with currentPose(2)+dz,
    # TargetTrajectoriesPublisher.cpp:134-155 -> :61-86), not comHeight —
    # so start and target poses coincide: hold xy, slewed z, target attitude
    start_pose = jnp.concatenate([
        current_pose[0:2], (current_pose[2] + dz)[None], target_euler.astype(dtype)])
    target_pose = start_pose

    nx = observation_state.shape[0]
    s0 = jnp.zeros(nx, dtype)
    s0 = s0.at[6:12].set(start_pose)
    s0 = s0.at[12:].set(cfg.default_joints)
    s1 = s0.at[6:12].set(target_pose)

    T = time_to_target if time_to_target is not None else 1.0
    times = jnp.full((T_NODES,), t_now + T, dtype).at[0].set(t_now)
    states = jnp.tile(s1[None], (T_NODES, 1)).at[0].set(s0)
    inputs = jnp.zeros((T_NODES, nu), dtype)
    return TargetTrajectories(times=times, states=states, inputs=inputs)


def cmd_pos_to_target(cmd_euler, observation_state, t_now, cfg: CmdVelConfig,
                      nu=22, time_to_target=1.0) -> TargetTrajectories:
    """cmdPosToTargetTrajectories (TargetTrajectoriesPublisher.cpp:134-155):
    an attitude command (yaw, pitch, roll) at the current xy; z slewed toward
    comHeight; reaching time = now + TIME_TO_TARGET."""
    return body_rotation_to_target(
        cmd_euler, observation_state, t_now, cfg, nu, time_to_target)


def cmd_vel_to_target(cmd_vel, observation_state, t_now, horizon,
                      cfg: CmdVelConfig, nu=22) -> TargetTrajectories:
    """cmdVelToTargetTrajectories (.cpp:102-130): rotate the planar command
    into world, integrate one horizon ahead, and emit a 2-point trajectory
    (padded to T_NODES).  cmd_vel = (vx, vy, vz, yaw_rate) in base frame."""
    zyx = observation_state[9:12]
    R = rotation_zyx(zyx)
    v_world = R @ cmd_vel[0:3]

    current_pose = observation_state[6:12]
    # span_scale extends the terminal node (same slope -> identical
    # in-horizon interpolants; see CmdVelConfig.span_scale)
    span = cfg.span_scale * horizon
    target_pose = jnp.array(
        [
            current_pose[0] + span * v_world[0],
            current_pose[1] + span * v_world[1],
            cfg.com_height,
            current_pose[3] + span * cmd_vel[3],
            0.0,
            0.0,
        ],
        dtype=observation_state.dtype,
    )

    nx = observation_state.shape[0]
    s0 = jnp.zeros(nx, observation_state.dtype)
    s0 = s0.at[0:3].set(v_world)
    # the reference sets ONLY the linear part (stateTrajectory[k].head(3) =
    # cmdVelRot, .cpp:127-128); angular momentum targets stay zero and the
    # yaw-rate command enters through the pose-yaw target below.  (An
    # earlier revision wrote cmd_vel[3] into index 3 — the X angular
    # momentum — injecting a spurious roll-momentum reference during turns.)
    s0 = s0.at[6:12].set(jnp.concatenate([current_pose[0:2], cfg.com_height[None],
                                          jnp.array([current_pose[3], 0.0, 0.0])]))
    s0 = s0.at[12:].set(cfg.default_joints)
    s1 = s0.at[6:12].set(target_pose)

    times = jnp.full((T_NODES,), t_now + span, observation_state.dtype)
    times = times.at[0].set(t_now)
    states = jnp.tile(s1[None], (T_NODES, 1)).at[0].set(s0)
    inputs = jnp.zeros((T_NODES, nu), observation_state.dtype)
    return TargetTrajectories(times=times, states=states, inputs=inputs)
