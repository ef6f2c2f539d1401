"""Closed loop against the full-order physics backend with the Kalman
filter + momentum observer in the loop — the TPU-native equivalent of the
reference's MuJoCo/Gazebo sim-in-the-loop operation (SURVEY.md §3.3/§3.5),
including sensing, estimation, WBC, PD motor model and contact physics.

Everything is one jittable pure function; vmap batches disturbance /
push-recovery scenario sweeps (BASELINE.json config 4).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..backends.fullorder import (
    SimParams,
    SimState,
    init_sim_state,
    sim_step,
    synth_imu,
)
from ..estim.contact import (
    ContactObserverParams,
    ContactObserverState,
    classify_contact,
    early_late_contact_flags,
    init_contact_observer,
    momentum_observer_update,
)
from ..refs.swing_planner import start_stop_time
from ..estim.kalman import KalmanParams, KalmanState, init_kalman_state, kalman_update
from ..gait import adaptive
from ..gait.mode_schedule import MODE_CONTACTS, mode_at_time
from ..models.centroidal import rbd_state_to_centroidal
from ..models.kinematics import contact_positions, fk
from ..models.robot import RobotModel
from ..models.spatial import (
    global_angular_velocity_from_euler_rates,
)
from ..ocp import problem as ocp
from ..refs import swing_planner as swp
from ..refs import targets as tg
from ..solver import mpc as mpc_mod
from ..solver import sqp as sqp_mod
from ..wbc.wbc import WbcParams, WbcState, init_wbc_state
from .controller import GainConfig, control_tick
from .loop import LoopConfig, _empty_policy

NJ = 10
NV = 16


class SimLoopState(NamedTuple):
    plant: SimState
    kalman: KalmanState
    observer: ContactObserverState
    mpc_state: mpc_mod.MpcState
    wbc_state: WbcState
    gait: adaptive.GaitRunState
    policy: sqp_mod.SqpSolution
    emergency_stop: jnp.ndarray
    last_cmd_vel: jnp.ndarray
    last_torque: jnp.ndarray  # (10,) applied torques for the observer
    # sensor-noise state (backends.sensor_noise.NoiseState) or None =
    # noise-free sensing (the reference Gazebo plugin's actual behavior)
    noise: object = None


def init_sim_loop_state(model: RobotModel, settings: sqp_mod.SqpSettings,
                        q0, v0=None, t0=0.0, noise_params=None,
                        noise_seed=0) -> SimLoopState:
    dtype = q0.dtype
    if noise_params is not None:
        from ..backends import sensor_noise as sn

        noise = sn.init_noise_state(noise_params, noise_seed, dtype)
    else:
        noise = None
    nx = 12 + model.nj
    nu = 12 + model.nj
    kf = init_kalman_state(dtype)
    # seed the filter at the true base/feet so there is no startup transient
    kin = fk(model, q0)
    feet = contact_positions(model, kin)
    x_hat = jnp.zeros(18, dtype)
    x_hat = x_hat.at[0:3].set(q0[0:3])
    x_hat = x_hat.at[6:18].set(feet.reshape(-1))
    kf = kf._replace(x_hat=x_hat, P=0.1 * jnp.eye(18, dtype=dtype))
    return SimLoopState(
        plant=init_sim_state(q0, v0, t0),
        kalman=kf,
        observer=init_contact_observer(dtype),
        mpc_state=mpc_mod.init_mpc_state(model, settings, nx, dtype),
        wbc_state=init_wbc_state(dtype),
        gait=adaptive.init_gait_run_state(dtype, t0),
        policy=_empty_policy(settings, nx, nu, dtype),
        emergency_stop=jnp.asarray(False),
        last_cmd_vel=jnp.zeros(4, dtype),
        last_torque=jnp.zeros(NJ, dtype),
        noise=noise,
    )


def _sense_and_estimate(model, kf_params, st: SimLoopState, schedule, t, dt,
                        noise_params=None):
    """LeggedController::updateStateEstimation parity (:280-349): read sim
    sensors (optionally corrupted per the Gazebo-declared covariances),
    run the KF, assemble rbdState + centroidal observation."""
    plant = st.plant
    quat, omega_local, accel_local = synth_imu(model, plant)
    qj, vj = plant.q[6:], plant.v[6:]
    nstate = st.noise
    if noise_params is not None:
        from ..backends import sensor_noise as sn
        from ..models.spatial import quat_to_zyx, rotation_zyx

        nstate, quat, omega_local, accel_local, qj, vj = sn.corrupt(
            noise_params, nstate, quat, omega_local, accel_local, qj, vj, dt)
        # like the reference, orientation comes from the (noisy) IMU quat
        zyx = quat_to_zyx(quat)
        omega_world = rotation_zyx(zyx) @ omega_local
    else:
        zyx = plant.q[3:6]
        omega_world = global_angular_velocity_from_euler_rates(zyx, plant.v[3:6])
    cmd_contact = jnp.asarray(MODE_CONTACTS, plant.q.dtype)[mode_at_time(schedule, t)]

    kf, pos, vel = kalman_update(
        model, kf_params, st.kalman, zyx, qj, vj,
        omega_world, quat, accel_local, cmd_contact, dt,
    )
    rbd = jnp.concatenate([zyx, pos, qj, omega_world, vel, vj])
    x_est = rbd_state_to_centroidal(model, rbd)
    return kf, rbd, x_est, cmd_contact, nstate


def run_sim_loop(model: RobotModel, settings: sqp_mod.SqpSettings,
                 params: ocp.OcpParams, planner_cfg: swp.SwingConfig,
                 wbc_params: WbcParams, gains: GainConfig,
                 cmd_cfg: tg.CmdVelConfig, kf_params: KalmanParams,
                 obs_params: ContactObserverParams, sim_params: SimParams,
                 cfg: LoopConfig, state: SimLoopState, cmd_vel_seq,
                 n_mpc_steps: int, default_joints, noise_params=None):
    """Run n_mpc_steps MPC periods of physics-in-the-loop simulation.
    ``noise_params``: optional backends.sensor_noise.SensorNoiseParams;
    requires state.noise to be an initialized NoiseState."""
    dtype = state.plant.q.dtype

    def mpc_period(carry, inp):
        st: SimLoopState = carry
        cmd_vel_raw = inp
        t = st.plant.t

        # estimate current state for the solver
        kf0, rbd0, x_est, _, nst0 = _sense_and_estimate(
            model, kf_params, st, st.gait.schedule, t, cfg.control_dt,
            noise_params,
        )

        cmd_vel = tg.filter_cmd_vel(cmd_vel_raw, st.last_cmd_vel, cmd_cfg)
        target = tg.cmd_vel_to_target(cmd_vel, x_est, t, settings.horizon, cmd_cfg)

        gait, vel_avg = adaptive.vel_abs_update(st.gait, cmd_vel, target.states[0])
        gait = adaptive.walk_gait_switch(gait, vel_avg, t, t + 10.0)
        gait = adaptive.extend_schedule(gait, t, t + 2 * settings.horizon)

        body_cmd6 = jnp.concatenate([cmd_vel[0:3], jnp.zeros(2, dtype), cmd_vel[3:4]])
        sol, mpc_state, bundle = mpc_mod.mpc_step(
            model, settings, params, planner_cfg, st.mpc_state, gait.schedule,
            target, t, x_est, body_cmd6, default_joints,
        )
        # swing windows for contact classification (StartStopTime4Legs,
        # LeggedController.cpp:306-308)
        from ..gait.mode_schedule import swing_windows

        win_starts, win_stops, _ = swing_windows(
            gait.schedule, t - settings.horizon, t + 2 * settings.horizon
        )

        def tick(tc, j):
            plant, kf, obs, wbc_state, estop, last_tau, nst = tc
            tt = plant.t
            st_tick = st._replace(plant=plant, kalman=kf, noise=nst)
            kf, rbd, x_now, cmd_contact, nst = _sense_and_estimate(
                model, kf_params, st_tick, gait.schedule, tt, cfg.control_dt,
                noise_params,
            )
            obs, _ = momentum_observer_update(
                model, obs_params, obs, rbd, last_tau, cfg.control_dt
            )
            # contact classification + early/late detection
            from ..gait.mode_schedule import phase_index_at_time

            p = phase_index_at_time(gait.schedule, tt)
            ss = jnp.stack([win_starts[:, p], win_stops[:, p]], axis=1)
            est_contact = classify_contact(obs_params, obs.est_forces,
                                           cmd_contact, ss, tt)
            frac = jnp.clip((tt - ss[:, 0]) / jnp.maximum(ss[:, 1] - ss[:, 0], 1e-6),
                            0.0, 1.0)
            early, late = early_late_contact_flags(
                None, est_contact, cmd_contact, frac, ss[:, 1] - tt
            )
            out, wbc_state = control_tick(
                model, wbc_params, gains, wbc_state, sol, gait.schedule, tt,
                x_now, rbd, default_joints, jnp.asarray(True), estop,
                cfg.control_dt, policy_lead=cfg.policy_lead,
            )
            plant = sim_step(model, sim_params, plant, out.command)
            tau_applied = (
                out.command.tau_ff
                + out.command.kp * (out.command.pos_des - plant.q[6:])
                + out.command.kd * (out.command.vel_des - plant.v[6:])
            )
            return (
                (plant, kf, obs, wbc_state, out.emergency_stop, tau_applied,
                 nst),
                (plant.q[2], x_now[0], est_contact, early, late),
            )

        (plant, kf, obs, wbc_state, estop, last_tau, nst), (
            zs, vxs, est_contacts, earlies, lates
        ) = jax.lax.scan(
            tick,
            (st.plant, kf0, st.observer, st.wbc_state, st.emergency_stop,
             st.last_torque, nst0),
            jnp.arange(cfg.ticks_per_mpc),
        )

        new_state = SimLoopState(
            plant=plant, kalman=kf, observer=obs, mpc_state=mpc_state,
            wbc_state=wbc_state, gait=gait, policy=sol,
            emergency_stop=estop, last_cmd_vel=cmd_vel, last_torque=last_tau,
            noise=nst,
        )
        telem = {
            "t": t,
            "base_z": zs[-1],
            "vx_est": vxs[-1],
            # KF base-position error vs ground truth (sensor-noise telemetry)
            "est_pos_err": jnp.linalg.norm(kf.x_hat[0:3] - plant.q[0:3]),
            "q": plant.q,
            "v": plant.v,
            "cost": sol.cost,
            "violation": sol.constraint_violation,
            "gait_level": gait.gait_level,
            "contact_fz": plant.contact_forces[:, 2],
            "est_force_norm": obs.est_forces[12:14],
            "est_contact": est_contacts[-1],
            "early_contact": earlies[-1],
            "late_contact": lates[-1],
        }
        return new_state, telem

    return jax.lax.scan(mpc_period, state, cmd_vel_seq)
