"""MPC orchestration: reference preparation + warm start + SQP solve.

This is the TPU-native analog of the reference's MPC thread body
(LeggedController.cpp:396-420 -> SqpMpc::run), including the pre-solver
reference pipeline of SwitchedModelReferenceManager::modifyReferences
(SwitchedModelReferenceManager.cpp:136-171):

    re-tiled gait schedule  ->  swing-spline planner  ->  joint-space
    reference generation via per-leg IK at 0.15 s samples  ->  SQP.

The entire prepare+solve is one pure function (`mpc_step`) that jits once
and vmaps over scenario batches.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..gait.mode_schedule import MODE_CONTACTS, ModeSchedule, mode_at_time
from ..models.robot import RobotModel
from ..models.spatial import rotation_zyx
from ..ocp import problem as ocp
from ..refs import ik as ik_mod
from ..refs import swing_planner as swp
from ..refs import targets as tg
from . import sqp

JOINT_REF_STEP = 0.15  # calculateJointRef sampling (SwitchedModelReferenceManager.cpp:262)


class MpcState(NamedTuple):
    """Carried across solves (the solver-side persistent state)."""

    planner: swp.PlannerState
    xs_ws: jnp.ndarray  # (N+1, nx) warm-start states
    us_ws: jnp.ndarray  # (N, nu) warm-start inputs
    ws_times: jnp.ndarray  # (N+1,)
    has_ws: jnp.ndarray    # bool scalar


def init_mpc_state(model: RobotModel, settings: sqp.SqpSettings, nx=None, dtype=jnp.float32):
    nx = nx or (12 + model.nj)
    nu = 12 + model.nj
    N = settings.n_intervals
    return MpcState(
        planner=swp.init_planner_state(dtype),
        xs_ws=jnp.zeros((N + 1, nx), dtype),
        us_ws=jnp.zeros((N, nu), dtype),
        ws_times=jnp.zeros(N + 1, dtype),
        has_ws=jnp.asarray(False),
    )


def _joint_reference(model: RobotModel, target: tg.TargetTrajectories,
                     refs: swp.SwingRefs, init_time, final_time, x_init,
                     default_joints, n_samples: int):
    """calculateJointRef (SwitchedModelReferenceManager.cpp:251-300):
    resample the target at 0.15 s steps and fill joint references by leg IK
    on the planned foot positions.

    TPU-first restructure: the reference chains samples sequentially
    (previous sample's joints warm-start the next IK), which serializes
    ~n_samples * max_it kinematics passes — measured as the dominant term
    of the on-device single-scenario solve latency.  Here all samples solve
    in parallel from the default pose, then a second parallel pass
    re-solves warm-started by the first pass's own result: the same total
    iteration budget the sequential chain reaches by its last sample, at
    2 IK depths instead of n_samples."""
    nj = model.nj
    Ts = jnp.linspace(init_time, final_time, n_samples).astype(target.times.dtype)
    states = jax.vmap(lambda t: tg.interp_state(target, t))(Ts)
    inputs = jax.vmap(lambda t: tg.interp_input(target, t))(Ts)

    euler = x_init[9:12]
    R_des = rotation_zyx(euler)  # world2body * identity (R_des for both feet)

    des = jax.vmap(
        lambda t: jnp.stack(
            [swp.foot_reference(refs, 0, t)[0], swp.foot_reference(refs, 1, t)[0]]
        )
    )(Ts)  # (n_samples, 2, 3)
    poses = states[:, 6:12]

    def solve_one(pose, des_t, warm_joints):
        q_ref = jnp.concatenate([pose, warm_joints])
        return ik_mod.compute_ik(model, q_ref, des_t, R_des, trans_it=3, rot_it=2)

    qj1 = jax.vmap(solve_one, in_axes=(0, 0, None))(poses, des, default_joints)
    joint_refs = jax.vmap(solve_one)(poses, des, qj1)
    states = states.at[:, 12 : 12 + nj].set(joint_refs)
    return tg.TargetTrajectories(times=Ts, states=states, inputs=inputs)


def prepare_references(model: RobotModel, settings: sqp.SqpSettings,
                       planner_cfg: swp.SwingConfig, planner_state: swp.PlannerState,
                       schedule: ModeSchedule, target: tg.TargetTrajectories,
                       init_time, x_init, body_vel_cmd, default_joints):
    """modifyReferences parity: swing planner update + joint refs + per-knot
    reference bundle."""
    N = settings.n_intervals
    final_time = init_time + settings.horizon
    dtype = x_init.dtype

    feet = _current_feet(model, x_init)
    refs, planner_state = swp.update_planner(
        planner_cfg, planner_state, schedule, target, init_time, final_time,
        body_vel_cmd, feet, body_vel_meas=x_init[0:3],
    )

    n_samples = int(settings.horizon / JOINT_REF_STEP) + 1
    mod_target = _joint_reference(
        model, target, refs, init_time, final_time, x_init, default_joints, n_samples
    )

    times = init_time + jnp.arange(N + 1, dtype=dtype) * (settings.horizon / N)
    x_nom = jax.vmap(lambda t: tg.interp_state(mod_target, t))(times)
    flags = jax.vmap(
        lambda t: jnp.asarray(MODE_CONTACTS, dtype)[mode_at_time(schedule, t)]
    )(times)
    foot_refs = jax.vmap(
        lambda t: jnp.stack([
            jnp.stack(swp.foot_reference(refs, leg, t)[0:2]) for leg in range(4)
        ])
    )(times)  # (N+1, 4, 2, 3)
    bundle = sqp.ReferenceBundle(
        times=times,
        x_nom=x_nom,
        contact_flags=flags,
        foot_pos_ref=foot_refs[:, :, 0, :],
        foot_vel_ref=foot_refs[:, :, 1, :],
    )
    return bundle, refs, mod_target, planner_state


def _current_feet(model: RobotModel, x_init):
    """Current foot positions from state (InverseKinematics::computeFootPos)."""
    from ..models.kinematics import contact_positions, fk

    return contact_positions(model, fk(model, x_init[6:]))


def _warm_start(model, settings, refs_bundle, state: MpcState, x_init):
    """Interpolate the previous solution onto the new grid (coldStart=false);
    fall back to the initializer on first solve."""
    N = settings.n_intervals
    xs0, us0 = sqp.initializer_trajectories(model, settings, refs_bundle, x_init)

    def interp_prev():
        def ix(t):
            tt = tg.TargetTrajectories(state.ws_times, state.xs_ws, state.xs_ws)
            return tg.interp_state(tt, t)

        def iu(t):
            tt = tg.TargetTrajectories(state.ws_times[:-1], state.us_ws, state.us_ws)
            return tg.interp_state(tt, t)

        xs = jax.vmap(ix)(refs_bundle.times)
        us = jax.vmap(iu)(refs_bundle.times[:-1])
        return xs.at[0].set(x_init), us

    xs_w, us_w = jax.lax.cond(state.has_ws, interp_prev, lambda: (xs0, us0))
    return xs_w, us_w


def mpc_step(model: RobotModel, settings: sqp.SqpSettings, params: ocp.OcpParams,
             planner_cfg: swp.SwingConfig, state: MpcState,
             schedule: ModeSchedule, target: tg.TargetTrajectories,
             init_time, x_init, body_vel_cmd, default_joints):
    """Full MPC advance (the 100 Hz `advanceMpc` analog).

    Returns (SqpSolution, new MpcState, ReferenceBundle)."""
    bundle, swing_refs, mod_target, planner_state = prepare_references(
        model, settings, planner_cfg, state.planner, schedule, target,
        init_time, x_init, body_vel_cmd, default_joints,
    )
    xs_ws, us_ws = _warm_start(model, settings, bundle, state, x_init)
    sol = sqp.solve(model, settings, params, bundle, x_init, xs_ws, us_ws)
    new_state = MpcState(
        planner=planner_state,
        xs_ws=sol.states,
        us_ws=sol.inputs[:-1],
        ws_times=sol.times,
        has_ws=jnp.asarray(True),
    )
    return sol, new_state, bundle


def evaluate_policy(sol: sqp.SqpSolution, t, x=None):
    """MRT policy evaluation: linear interpolation of the latest primal
    solution (MPC_MRT_Interface::evaluatePolicy with useFeedbackPolicy=false).
    Returns (x*, u*, mode is handled by the caller's schedule)."""
    tt_x = tg.TargetTrajectories(sol.times, sol.states, sol.states)
    tt_u = tg.TargetTrajectories(sol.times, sol.inputs, sol.inputs)
    return tg.interp_state(tt_x, t), tg.interp_state(tt_u, t)
