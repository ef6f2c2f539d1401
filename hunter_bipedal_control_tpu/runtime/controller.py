"""The 500 Hz control tick: policy evaluation -> WBC -> hybrid joint command.

Parity target: LeggedController::update (legged_controllers/src/
LeggedController.cpp:137-278) — stance override before walking, WBC update,
desired pos/vel forward-integration with the WBC joint accelerations,
per-joint-group gain scheduling (cfg/Tutorials.cfg defaults), position-limit
emergency stop, and the hybrid joint command 5-tuple
(HybridJointInterface.h:77-84).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..gait.mode_schedule import MODE_CONTACTS, ModeSchedule, mode_at_time
from ..models.robot import RobotModel
from ..solver.mpc import evaluate_policy
from ..solver.sqp import SqpSolution
from ..wbc.wbc import WbcParams, WbcState, wbc_update

NJ = 10


class GainConfig(NamedTuple):
    """cfg/Tutorials.cfg defaults + joint grouping of LeggedController."""

    kp_position: jnp.ndarray    # 10 (pre-load standing)
    kd_position: jnp.ndarray    # 3
    kp_big_stance: jnp.ndarray  # 40
    kp_big_swing: jnp.ndarray   # 30
    kd_big: jnp.ndarray         # 2
    kp_small_stance: jnp.ndarray  # 30
    kp_small_swing: jnp.ndarray   # 20
    kd_small: jnp.ndarray       # 2
    kd_feet: jnp.ndarray        # 0.01
    # Ankle (feet) kp, split from the small group (round 5).  The
    # reference's LeggedController shares the small-joint kp with the
    # ankles; -1.0 keeps that parity coupling (feet follow
    # kp_small_stance/swing).  Setting explicit values decouples them —
    # needed because the yaw envelope wants hip-yaw stance kp ~90 (full
    # 1.5 rad/s joystick scale) while ankle stance kp 90 overdrives
    # sagittal tracking by ~35% (docs/DESIGN.md round-5 yaw section).
    kp_feet_stance: jnp.ndarray = -1.0
    kp_feet_swing: jnp.ndarray = -1.0


def default_gains(dtype=jnp.float32) -> GainConfig:
    return GainConfig(
        kp_position=jnp.asarray(10.0, dtype),
        kd_position=jnp.asarray(3.0, dtype),
        kp_big_stance=jnp.asarray(40.0, dtype),
        kp_big_swing=jnp.asarray(30.0, dtype),
        kd_big=jnp.asarray(2.0, dtype),
        kp_small_stance=jnp.asarray(30.0, dtype),
        kp_small_swing=jnp.asarray(20.0, dtype),
        kd_small=jnp.asarray(2.0, dtype),
        kd_feet=jnp.asarray(0.01, dtype),
        kp_feet_stance=jnp.asarray(-1.0, dtype),
        kp_feet_swing=jnp.asarray(-1.0, dtype),
    )


# slider ranges of cfg/Tutorials.cfg (name -> (min, max))
GAIN_LIMITS = {
    "kp_position": (0.0, 300.0),
    "kd_position": (0.0, 100.0),
    "kp_big_stance": (0.0, 100.0),
    "kp_big_swing": (0.0, 100.0),
    "kd_big": (0.0, 20.0),
    "kp_small_stance": (0.0, 100.0),
    "kp_small_swing": (0.0, 100.0),
    "kd_small": (0.0, 20.0),
    "kd_feet": (0.0, 20.0),
    # -1 = follow the small-group kp (reference coupling); see GainConfig
    "kp_feet_stance": (-1.0, 100.0),
    "kp_feet_swing": (-1.0, 100.0),
}


def reconfigure_gains(gains: GainConfig, **updates) -> GainConfig:
    """Live PD-gain reconfiguration (dynamicParamCallback parity,
    LeggedController.cpp:433-447 + cfg/Tutorials.cfg slider ranges).

    GainConfig fields are traced leaves of the jitted control tick, so the
    returned config takes effect on the very next tick with NO recompilation
    — the TPU-native analog of rqt dynamic_reconfigure
    (tests/test_gain_reconfig.py asserts both properties)."""
    bad = set(updates) - set(GAIN_LIMITS)
    if bad:
        raise ValueError(f"unknown gain fields: {sorted(bad)}")
    new = {}
    for name, value in updates.items():
        lo, hi = GAIN_LIMITS[name]
        ref = getattr(gains, name)
        new[name] = jnp.clip(jnp.asarray(value, ref.dtype), lo, hi)
    return gains._replace(**new)


class JointCommand(NamedTuple):
    """The hybrid joint 5-tuple (pos, vel, kp, kd, feedforward)."""

    pos_des: jnp.ndarray  # (10,)
    vel_des: jnp.ndarray
    kp: jnp.ndarray
    kd: jnp.ndarray
    tau_ff: jnp.ndarray


class TickOutput(NamedTuple):
    command: JointCommand
    optimized_state: jnp.ndarray
    optimized_input: jnp.ndarray
    wbc_solution: jnp.ndarray
    emergency_stop: jnp.ndarray


# joint grouping: hips roll/yaw (0,1,5,6) small; knees etc (2,3,7,8) big;
# ankles (4,9) small kp + kd_feet (LeggedController.cpp:226-243)
import numpy as _np

_SMALL = _np.asarray([1.0, 1.0, 0, 0, 0, 1.0, 1.0, 0, 0, 0], _np.float32)
_BIG = _np.asarray([0, 0, 1.0, 1.0, 0, 0, 0, 1.0, 1.0, 0], _np.float32)
_FEET = _np.asarray([0, 0, 0, 0, 1.0, 0, 0, 0, 0, 1.0], _np.float32)


def control_tick(model: RobotModel, wbc_params: WbcParams, gains: GainConfig,
                 wbc_state: WbcState, policy: SqpSolution, schedule: ModeSchedule,
                 t, x_est, rbd_measured, default_joints, set_walk,
                 emergency_stop, loop_dt, policy_lead=0.0, swing_lead=0.0,
                 lead_forces=True):
    """One 500 Hz controller update.  Returns (TickOutput, new WbcState).

    ``policy_lead`` evaluates the primal policy ``lead`` seconds ahead of
    the tick time.  The reference's MRT consumes policies that are one
    solve-latency plus up to one MPC period old (the MPC thread anchors at
    an observation taken 10-20 ms before the tick that consumes it,
    LeggedController.cpp:396-421 + :151-156), so its 500 Hz loop always
    executes the plan's [latency, latency+period] window — where the
    plan's catch-up velocities have ramped up.  A synchronous in-process
    loop that solves with zero latency executes only the plan's first
    [0, period] window, which the SQP anchors to the measured state; the
    commanded references then never lead the plant and the PD layer
    delivers none of the plan's swing catch-up (measured as the backward
    toe-apex deficit, docs/DESIGN.md round-4).  ``policy_lead`` restores
    the reference's own effective policy age.  Mode flags stay at ``t``
    (the reference also gates contacts at the current time, :296-303).

    ``swing_lead`` (round 5) applies an EXTRA lead to the SWING legs'
    joint references only.  A global lead also leads the stance legs'
    position targets and the contact-schedule content of the policy
    sample, which for short-stance gaits (flying trot: 0.15 s windows)
    exits stances ~20% early and fells the robot within seconds
    (docs/DESIGN.md round-5 flying-trot bisection: lead 28 ms falls at
    engagement; lead 0 walks but the un-led swing catch-up leaves a
    persistent +0.1 rad forward lean, toe-first stances, and a toe-vault
    fall at ~5 s).  Splitting the lead per leg gives the swing feet the
    plan's catch-up window while stance references stay anchored at t.

    ``lead_forces=False`` keeps the FORCE feedforward (u[0:12]) sampled at
    ``t`` while the motion references take the lead: a led sample that
    crosses a contact-mode switch reads the NEXT mode's force plan (for
    flying trot, the FLY phase's zeros during the last ~fifth of every
    0.15 s stance), and the WBC's force-tracking task then unloads the
    stance leg exactly when push-off should peak."""
    dtype = x_est.dtype
    x_opt, u_opt = evaluate_policy(policy, t + policy_lead)
    mode = mode_at_time(schedule, t)
    contact_flags = jnp.asarray(MODE_CONTACTS, dtype)[mode]
    if policy_lead and not lead_forces:
        _, u_now = evaluate_policy(policy, t)
        u_opt = u_opt.at[0:12].set(u_now[0:12])
    if swing_lead:
        x_led, u_led = evaluate_policy(policy, t + policy_lead + swing_lead)
        # toe-contact flag of leg j//5 gates each joint (stance keeps the
        # un-led sample; swing takes the led one)
        leg_sw = jnp.concatenate(
            [jnp.repeat(contact_flags[0], 5), jnp.repeat(contact_flags[1], 5)]
        )
        x_opt = x_opt.at[12:22].set(
            jnp.where(leg_sw > 0.5, x_opt[12:22], x_led[12:22]))
        u_opt = u_opt.at[12:22].set(
            jnp.where(leg_sw > 0.5, u_opt[12:22], u_led[12:22]))

    # stance override until /set_walk (LeggedController.cpp:161-173)
    x_stance = jnp.zeros_like(x_opt).at[6:12].set(x_est[6:12]).at[12:].set(default_joints)
    x_opt = jnp.where(set_walk, x_opt, x_stance)
    u_opt = jnp.where(set_walk, u_opt, jnp.zeros_like(u_opt))
    contact_flags = jnp.where(set_walk, contact_flags, jnp.ones_like(contact_flags))
    stance_mode = ~set_walk

    wbc_x, wbc_state = wbc_update(
        model, wbc_params, wbc_state, x_opt, u_opt, rbd_measured,
        contact_flags, stance_mode,
    )
    tau_wbc = wbc_x[16 + 12:]
    joint_acc = wbc_x[6:16]

    pos_des = x_opt[12:22] + 0.5 * joint_acc * loop_dt * loop_dt
    vel_des = u_opt[12:22] + joint_acc * loop_dt

    # per-leg stance flag: toe contact of leg j//5 (LeggedController.cpp:224-229)
    leg_stance = jnp.concatenate(
        [jnp.repeat(contact_flags[0], 5), jnp.repeat(contact_flags[1], 5)]
    )
    kp_fs = jnp.where(gains.kp_feet_stance < 0.0, gains.kp_small_stance,
                      gains.kp_feet_stance)
    kp_fw = jnp.where(gains.kp_feet_swing < 0.0, gains.kp_small_swing,
                      gains.kp_feet_swing)
    kp = (
        _SMALL * jnp.where(leg_stance > 0.5, gains.kp_small_stance, gains.kp_small_swing)
        + _BIG * jnp.where(leg_stance > 0.5, gains.kp_big_stance, gains.kp_big_swing)
        + _FEET * jnp.where(leg_stance > 0.5, kp_fs, kp_fw)
    )
    kd = _SMALL * gains.kd_small + _BIG * gains.kd_big + _FEET * gains.kd_feet

    # position-limit trip (±0.02 rad beyond URDF limits, :196-209)
    jpos_meas = rbd_measured[6:16]
    tripped = jnp.any(
        (jpos_meas > model.joint_upper + 0.02) | (jpos_meas < model.joint_lower - 0.02)
    )
    emergency_stop = emergency_stop | tripped

    cmd = JointCommand(pos_des=pos_des, vel_des=vel_des, kp=kp, kd=kd, tau_ff=tau_wbc)
    # e-stop: damping-only command (:245-248)
    cmd = jax.tree.map(
        lambda on, off: jnp.where(emergency_stop, off, on),
        cmd,
        JointCommand(
            pos_des=jnp.zeros(NJ, dtype),
            vel_des=jnp.zeros(NJ, dtype),
            kp=jnp.zeros(NJ, dtype),
            kd=jnp.ones(NJ, dtype),
            tau_ff=jnp.zeros(NJ, dtype),
        ),
    )
    out = TickOutput(
        command=cmd,
        optimized_state=x_opt,
        optimized_input=u_opt,
        wbc_solution=wbc_x,
        emergency_stop=emergency_stop,
    )
    return out, wbc_state
