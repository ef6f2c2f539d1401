"""Deterministic co-simulation scheduler: 100 Hz MPC / 500 Hz control.

The TPU-native re-expression of the reference's thread structure
(SURVEY.md §2.2): the MPC thread (LeggedController.cpp:396-421) and the
SCHED_FIFO hardware loop (legged_hw/src/LeggedHWLoop.cpp:53-79) become one
nested lax.scan — an outer scan over MPC solves, an inner scan over the
control ticks of each MPC period.  The policy produced by solve k is
consumed by the ticks of period k+1, reproducing the MRT "evaluate the last
finished policy while a new solve runs" latency deterministically
(LeggedController.cpp:151-159).

The whole closed loop is one jittable, vmappable pure function —
`rollout_dummy_loop` is the physics-free variant (SURVEY.md §4 dummy loop).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..backends.dummy import DummyPlantState, dummy_step, init_dummy_plant
from ..gait import adaptive
from ..gait.mode_schedule import MODE_CONTACTS, mode_at_time
from ..models.centroidal import q_v_to_rbd_state, state_input_to_v, state_to_q
from ..models.robot import RobotModel
from ..ocp import problem as ocp
from ..refs import swing_planner as swp
from ..refs import targets as tg
from ..solver import mpc as mpc_mod
from ..solver import sqp as sqp_mod
from ..wbc.wbc import WbcParams, WbcState, init_wbc_state
from .controller import GainConfig, control_tick

NJ = 10


class LoopConfig(NamedTuple):
    """Static timing configuration (hunter.yaml 500 Hz loop, task.info
    100 Hz MPC)."""

    control_dt: float = 0.002     # 500 Hz
    ticks_per_mpc: int = 5        # -> 100 Hz MPC
    use_wbc: bool = True          # dummy loop can bypass WBC (pure MRT test)
    # MRT policy-age parity for synchronous zero-latency loops (see
    # runtime/controller.py control_tick docstring).  The dummy loop
    # integrates the solver's own dynamics, so 0.0 keeps it an exact
    # MRT-dummy-loop test; physics loops (sim_loop, mj_loop) pass the
    # deployment value.
    policy_lead: float = 0.0


class LoopState(NamedTuple):
    plant: DummyPlantState
    mpc_state: mpc_mod.MpcState
    wbc_state: WbcState
    gait: adaptive.GaitRunState
    policy: sqp_mod.SqpSolution
    emergency_stop: jnp.ndarray
    last_cmd_vel: jnp.ndarray  # (4,) slew-limited command memory


def _empty_policy(settings: sqp_mod.SqpSettings, nx, nu, dtype):
    N = settings.n_intervals
    return sqp_mod.SqpSolution(
        times=jnp.zeros(N + 1, dtype),
        states=jnp.zeros((N + 1, nx), dtype),
        inputs=jnp.zeros((N + 1, nu), dtype),
        cost=jnp.asarray(0.0, dtype),
        constraint_violation=jnp.asarray(0.0, dtype),
        step_size=jnp.asarray(0.0, dtype),
    )


def init_loop_state(model: RobotModel, settings: sqp_mod.SqpSettings, x0,
                    t0=0.0) -> LoopState:
    dtype = x0.dtype
    nx = x0.shape[0]
    nu = 12 + model.nj
    return LoopState(
        plant=init_dummy_plant(x0, t0),
        mpc_state=mpc_mod.init_mpc_state(model, settings, nx, dtype),
        wbc_state=init_wbc_state(dtype),
        gait=adaptive.init_gait_run_state(dtype, t0),
        policy=_empty_policy(settings, nx, nu, dtype),
        emergency_stop=jnp.asarray(False),
        last_cmd_vel=jnp.zeros(4, dtype),
    )


def run_dummy_loop(model: RobotModel, settings: sqp_mod.SqpSettings,
                   params: ocp.OcpParams, planner_cfg: swp.SwingConfig,
                   wbc_params: WbcParams, gains: GainConfig,
                   cmd_cfg: tg.CmdVelConfig, cfg: LoopConfig,
                   state: LoopState, cmd_vel_seq, n_mpc_steps: int,
                   default_joints):
    """Run `n_mpc_steps` MPC periods of closed loop against the dummy plant.

    cmd_vel_seq: (n_mpc_steps, 4) commanded (vx, vy, vz, yaw_rate) per period.
    Returns (final LoopState, telemetry dict of stacked per-period arrays).
    """
    dtype = state.plant.x.dtype

    def mpc_period(carry, inp):
        st: LoopState = carry
        cmd_vel_raw = inp
        t = st.plant.t
        x_est = st.plant.x

        # --- command shaping (TargetTrajectoriesPublisher parity) ---
        cmd_vel = tg.filter_cmd_vel(cmd_vel_raw, st.last_cmd_vel, cmd_cfg)
        target = tg.cmd_vel_to_target(cmd_vel, x_est, t, settings.horizon, cmd_cfg)

        # --- velocity-adaptive gait + schedule upkeep ---
        gait, vel_avg = adaptive.vel_abs_update(st.gait, cmd_vel, target.states[0])
        gait = adaptive.walk_gait_switch(gait, vel_avg, t, t + 10.0)
        gait = adaptive.extend_schedule(gait, t, t + 2 * settings.horizon)

        # --- MPC solve (policy becomes active for the *next* period's ticks
        #     after this scan step: here we use it immediately after solve,
        #     which models a solve completing within one period) ---
        body_cmd6 = jnp.concatenate([cmd_vel[0:3], jnp.zeros(2, dtype), cmd_vel[3:4]])
        sol, mpc_state, _ = mpc_mod.mpc_step(
            model, settings, params, planner_cfg, st.mpc_state, gait.schedule,
            target, t, x_est, body_cmd6, default_joints,
        )

        def tick(tc, j):
            plant, wbc_state, estop = tc
            tt = plant.t
            x_now = plant.x
            # dummy backend: "measured" rbd state from the plant's own
            # centroidal state + current policy input (cheater estimator,
            # FromTopicEstimate parity)
            x_opt, u_opt = mpc_mod.evaluate_policy(sol, tt)
            v_now = state_input_to_v(model, x_now, u_opt)
            rbd = q_v_to_rbd_state(model, state_to_q(x_now), v_now)

            out, wbc_state = control_tick(
                model, wbc_params, gains, wbc_state, sol, gait.schedule, tt,
                x_now, rbd, default_joints, jnp.asarray(True), estop,
                cfg.control_dt, policy_lead=cfg.policy_lead,
            ) if cfg.use_wbc else (None, wbc_state)

            # plant evolves under the policy input (MRT dummy rollout)
            plant = dummy_step(model, plant, u_opt, cfg.control_dt)
            estop = out.emergency_stop if cfg.use_wbc else estop
            return (plant, wbc_state, estop), (x_now[8], u_opt[2])

        (plant, wbc_state, estop), (zs, fzs) = jax.lax.scan(
            tick, (st.plant, st.wbc_state, st.emergency_stop),
            jnp.arange(cfg.ticks_per_mpc),
        )

        new_state = LoopState(
            plant=plant,
            mpc_state=mpc_state,
            wbc_state=wbc_state,
            gait=gait,
            policy=sol,
            emergency_stop=estop,
            last_cmd_vel=cmd_vel,
        )
        telem = {
            "t": t,
            "base_z": zs[-1],
            "cost": sol.cost,
            "violation": sol.constraint_violation,
            "alpha": sol.step_size,
            "gait_level": gait.gait_level,
            "x": plant.x,
        }
        return new_state, telem

    final_state, telem = jax.lax.scan(mpc_period, state, cmd_vel_seq)
    return final_state, telem
