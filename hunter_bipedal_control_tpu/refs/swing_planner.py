"""Swing-foot trajectory planner (fixed-shape, jit/vmap-native).

Parity target: legged_interface/src/foot_planner/SwingTrajectoryPlanner.cpp
:60-572 — per-leg per-phase X/Y/Z piecewise cubics, the Raibert-style
foothold rule (calNextFootPos, :289-312) and the hand-tuned 3/4-node swing
shapes (genSwingTrajs, :314-358).

The reference's std::vector-of-splines + triple buffering becomes a dense
pytree: node arrays of shape (4 legs, P phases, 4 nodes) per axis, built by
a lax.scan over phases (the next-stance position propagates sequentially).
Everything is part of the jitted MPC preparation step.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..gait.mode_schedule import (
    BIG_TIME,
    MAX_PHASES,
    ModeSchedule,
    contact_flags_at_time,
    phase_index_at_time,
    swing_windows,
)
from ..models.spatial import rotation_zyx
from .splines import PiecewiseCubic, eval_piecewise
from .targets import TargetTrajectories, interp_state

NUM_FEET = 4
N_NODES = 4
P1 = MAX_PHASES + 1


class SwingConfig(NamedTuple):
    """swing_trajectory_config of task.info:21-34."""

    lift_off_velocity: jnp.ndarray
    touch_down_velocity: jnp.ndarray
    swing_height: jnp.ndarray
    swing_time_scale: jnp.ndarray
    feet_bias: jnp.ndarray       # (4, 3) shoulder bias per foot
    next_position_z: jnp.ndarray
    # Extra lead (s) on the target-pose sample that rotates the foothold
    # bias in calNextFootPos.  0.0 = exact reference parity
    # (SwingTrajectoryPlanner.cpp:289-312 anchors at next_middle_time,
    # ~half a step ahead), which geometrically supports only ~half the
    # commanded turn rate when re-anchored at measured yaw every solve —
    # the measured 53% yaw floor (docs/DESIGN.md round-4 yaw bisection).
    # Set to ~half a gait period (0.3) to anchor one full step ahead.
    # CLAMP CAVEAT (ADVICE r4): interp_state clamps at the target's final
    # node; cmd_vel targets span [t, t+horizon] while next_middle_times
    # reach ~1.5 horizons ahead, so for far phases (or leads near the
    # remaining target span) the lead saturates at the terminal yaw
    # instead of extrapolating — large-lead sweeps plateau from this
    # clamp, not from dynamics, unless the target terminal time is
    # extended (refs/targets.py cmd_vel horizon).
    foothold_yaw_lead: jnp.ndarray = 0.0
    # Capture-point stepping feedback (round 5).  The reference feeds
    # calNextFootPos the TARGET trajectory's first-node velocity
    # (SwingTrajectoryPlanner.cpp:242), which for cmd_vel targets IS the
    # command (TargetTrajectoriesPublisher.cpp:127-128) — so its
    # k*(vel - vel_cmd) term is identically zero and the stepping layer has
    # NO velocity feedback; the MIT-Cheetah paper the reference cites at
    # :288 uses the MEASURED velocity here.  foothold_vel_fb blends the
    # measured base velocity into vel_linear:
    #   vel_linear = vel_target + fb * (vel_meas - vel_target)
    # 0.0 = exact reference parity; 1.0 = fully measured (capture-point
    # scale: the foothold's vel_linear sensitivity ~0.3 s matches
    # sqrt(z/g) ~ 0.25 s).  Required for the short-stance flying trot
    # (docs/DESIGN.md round-5 measurement).
    foothold_vel_fb: jnp.ndarray = 0.0


def default_swing_config(dtype=jnp.float32) -> SwingConfig:
    x1, x2, y, z = 0.034, -0.056, 0.11, -0.63
    return SwingConfig(
        lift_off_velocity=jnp.asarray(0.05, dtype),
        touch_down_velocity=jnp.asarray(0.0, dtype),
        swing_height=jnp.asarray(0.04, dtype),
        swing_time_scale=jnp.asarray(0.15, dtype),
        feet_bias=jnp.asarray([[x1, y, z], [x1, -y, z], [x2, y, z], [x2, -y, z]], dtype),
        next_position_z=jnp.asarray(0.02, dtype),
        foothold_yaw_lead=jnp.asarray(0.0, dtype),
        foothold_vel_fb=jnp.asarray(0.0, dtype),
    )


class SwingRefs(NamedTuple):
    """Planned foot references for one schedule window."""

    node_times: jnp.ndarray  # (4, P1, 3, N_NODES)
    node_pos: jnp.ndarray    # (4, P1, 3, N_NODES)
    node_vel: jnp.ndarray    # (4, P1, 3, N_NODES)
    event_times: jnp.ndarray  # (MAX_PHASES,) copy of schedule events
    window_start: jnp.ndarray  # (4, P1) start/stop of contact-or-swing window
    window_stop: jnp.ndarray   # (4, P1)
    contact_seq: jnp.ndarray   # (4, P1)


class PlannerState(NamedTuple):
    """Persistent cross-solve planner memory (latestStanceposition_)."""

    latest_stance_position: jnp.ndarray  # (4, 3)


def init_planner_state(dtype=jnp.float32) -> PlannerState:
    return PlannerState(latest_stance_position=jnp.zeros((NUM_FEET, 3), dtype))


def _raibert_foothold(cfg: SwingConfig, foot, current_time, stop_time,
                      next_middle_time, next_middle_body_pose, current_body_pose,
                      current_body_vel, vel_cmd):
    """calNextFootPos (SwingTrajectoryPlanner.cpp:289-312)."""
    roted_bias = rotation_zyx(next_middle_body_pose[3:6]) @ cfg.feet_bias[foot]
    R_cur = rotation_zyx(current_body_pose[3:6])
    vel_cmd_linear = R_cur @ vel_cmd[0:3]
    vel_cmd_angular = R_cur @ vel_cmd[3:6]
    vel_linear = current_body_vel.at[2].set(0.0)

    k = 0.03
    p_shoulder = (stop_time - current_time) * (0.5 * vel_linear + 0.5 * vel_cmd_linear) + roted_bias
    p_symmetry = (next_middle_time - stop_time) * vel_linear + k * (vel_linear - vel_cmd_linear)
    p_centrifugal = 0.5 * jnp.sqrt(jnp.abs(current_body_pose[2]) / 9.81) * jnp.cross(
        vel_linear, vel_cmd_angular
    )
    p = current_body_pose[0:3] + p_shoulder + p_symmetry + p_centrifugal
    return p.at[2].set(cfg.next_position_z)


def _swing_nodes(cfg: SwingConfig, start_time, stop_time, start_pos, stop_pos):
    """genSwingTrajs (SwingTrajectoryPlanner.cpp:314-358): tuned 3-node XY /
    4-node Z Hermite shapes.  Returns times/pos/vel arrays (3 axes, 4 nodes);
    XY pads node 3 by duplicating the final node."""
    dtype = start_pos.dtype
    dt = stop_time - start_time

    xy_a1, xy_l1, xy_k1 = 0.417, 0.650, 1.770
    t_mid = (1 - xy_a1) * start_time + xy_a1 * stop_time

    def xy_axis(p0, p1):
        times = jnp.stack([start_time, t_mid, stop_time, stop_time])
        pos = jnp.stack([p0, (1 - xy_l1) * p0 + xy_l1 * p1, p1, p1])
        vel = jnp.stack(
            [jnp.zeros_like(p0), xy_k1 * (p1 - p0) / jnp.maximum(dt, 1e-6),
             jnp.zeros_like(p0), jnp.zeros_like(p0)]
        )
        return times, pos, vel

    tx, px, vx = xy_axis(start_pos[0], stop_pos[0])
    ty, py, vy = xy_axis(start_pos[1], stop_pos[1])

    scaling = jnp.minimum(1.0, dt / cfg.swing_time_scale)
    max_z = jnp.maximum(start_pos[2], stop_pos[2]) + scaling * cfg.swing_height
    z_a1, z_l1, z_k1 = 0.251, 0.749, 1.338
    z_a2, z_l2, z_k2 = 0.630, 0.570, 1.633
    z_k3 = 0.000
    tz = jnp.stack(
        [
            start_time,
            (1 - z_a1) * start_time + z_a1 * stop_time,
            (1 - z_a2) * start_time + z_a2 * stop_time,
            stop_time,
        ]
    )
    pz = jnp.stack(
        [
            start_pos[2],
            z_l1 * max_z,
            z_l2 * max_z + (1 - z_l2) * stop_pos[2],
            stop_pos[2],
        ]
    )
    vz = jnp.stack(
        [
            jnp.zeros_like(max_z),
            z_k1 * (z_l1 * (max_z - start_pos[2])) / jnp.maximum(z_a1 * dt, 1e-6),
            z_k2 * z_l2 * (stop_pos[2] - max_z) / jnp.maximum((1 - z_a2) * dt, 1e-6),
            z_k3 * z_l2 * (stop_pos[2] - max_z) / jnp.maximum((1 - z_a2) * dt, 1e-6),
        ]
    )
    times = jnp.stack([tx, ty, tz]).astype(dtype)
    pos = jnp.stack([px, py, pz]).astype(dtype)
    vel = jnp.stack([vx, vy, vz]).astype(dtype)
    return times, pos, vel


def _stance_nodes(start_time, stop_time, pos):
    """Constant splines for stance phases (SwingTrajectoryPlanner.cpp:261-276)."""
    dtype = pos.dtype
    t = jnp.stack(
        [start_time, (2 * start_time + stop_time) / 3, (start_time + 2 * stop_time) / 3, stop_time]
    )
    times = jnp.tile(t[None, :], (3, 1)).astype(dtype)
    p = jnp.tile(pos[:, None], (1, N_NODES))
    v = jnp.zeros((3, N_NODES), dtype)
    return times, p, v


def update_planner(
    cfg: SwingConfig,
    state: PlannerState,
    schedule: ModeSchedule,
    target: TargetTrajectories,
    init_time,
    final_time,
    body_vel_cmd,          # (6,) commanded twist in base frame
    current_feet_position,  # (4, 3) measured/IK foot positions
    body_vel_meas=None,    # (3,) measured world base velocity (optional;
                           # consumed only when cfg.foothold_vel_fb != 0)
):
    """SwingTrajectoryPlanner::update (:164-286), one fused pass.

    Returns (SwingRefs, new PlannerState).
    """
    dtype = current_feet_position.dtype
    horizon = final_time - init_time
    h_start = init_time - horizon
    h_end = final_time + horizon

    cmd_contact = contact_flags_at_time(schedule, init_time + 0.001, dtype)  # (4,)
    latest = jnp.where(
        cmd_contact[:, None] > 0.5, current_feet_position, state.latest_stance_position
    )
    latest = latest.at[:, 2].set(cfg.next_position_z)

    starts, stops, cs = swing_windows(schedule, h_start, h_end)  # (4,P1)

    # next-stance-window stop time for each phase: window stop of the phase
    # right after this window's stop
    next_phase_idx = jnp.clip(
        jax.vmap(lambda e: jnp.searchsorted(schedule.event_times, e + 1e-6, side="right"))(
            stops.reshape(-1)
        ).reshape(NUM_FEET, P1),
        0,
        P1 - 1,
    )
    next_window_stop = jnp.take_along_axis(stops, next_phase_idx, axis=1)  # (4,P1)
    # "swingFinalIndex == last phase" -> next_middle_time = swingFinalTime
    last_real_event = jnp.max(jnp.where(schedule.event_times < BIG_TIME / 2,
                                        schedule.event_times, -BIG_TIME))
    is_tail = stops >= last_real_event - 1e-9
    next_middle_times = jnp.where(is_tail, stops, 0.5 * (stops + next_window_stop))

    current_body_pose = interp_state(target, init_time)[6:12]
    current_body_vel = interp_state(target, init_time)[0:3]
    if body_vel_meas is not None:
        # capture-point stepping feedback (see SwingConfig.foothold_vel_fb)
        current_body_vel = current_body_vel + cfg.foothold_vel_fb * (
            body_vel_meas - current_body_vel)

    # ---- parallel stance propagation over phases ----------------------
    # The reference chains footholds phase by phase; the recurrence
    # ("latest fresh swing window wins") is exactly expressible with
    # cumulative maxima + gathers because window stops are nondecreasing
    # along the phase axis — a 33-step sequential scan becomes full-width
    # parallel work.  The sequential-scan oracle lives in
    # tests/test_swing_parallel.py::_update_planner_scan; measured numbers
    # are in docs/DESIGN.md (phase profile table).
    ps = jnp.arange(P1)

    def leg_parallel(leg):
        is_swing = cs[leg] < 0.5                             # (P1,)
        s, e = starts[leg], stops[leg]

        def cand_at(p):
            next_mid_t = next_middle_times[leg, p]
            # only the ZYX part of this pose is consumed (roted_bias);
            # foothold_yaw_lead=0 is the reference anchor (see SwingConfig)
            next_mid_pose = interp_state(
                target, next_mid_t + cfg.foothold_yaw_lead)[6:12]
            return _raibert_foothold(
                cfg, leg, init_time, e[p], next_mid_t, next_mid_pose,
                current_body_pose, current_body_vel, body_vel_cmd,
            )

        cand = jax.vmap(cand_at)(ps)                         # (P1, 3)

        # fresh[p]: first phase of each new swing window ahead of init_time
        # (scan semantics: e must exceed the last accepted stop by 1e-9)
        elig = is_swing & (init_time < e)
        e_el = jnp.where(elig, e, -BIG_TIME)
        m_incl = jax.lax.associative_scan(jnp.maximum, e_el)
        m_prev = jnp.concatenate(
            [jnp.asarray(-BIG_TIME, dtype)[None], m_incl[:-1]])
        fresh = elig & (e > m_prev + 1e-9)

        # idx1[p] = latest fresh phase <= p; idx2[p] = the fresh phase
        # before that one (scan's next_stance / last_stance carries)
        marks = jnp.where(fresh, ps, -1)
        idx1 = jax.lax.associative_scan(jnp.maximum, marks)
        idx1_prev = jnp.concatenate([jnp.asarray(-1)[None], idx1[:-1]])
        idx2 = jnp.where(idx1 >= 0, idx1_prev[jnp.clip(idx1, 0, P1 - 1)], -1)

        def pick(idx):
            val = cand[jnp.clip(idx, 0, P1 - 1)]
            return jnp.where((idx >= 0)[:, None], val, latest[leg][None, :])

        next_stance = pick(idx1)                             # (P1, 3)
        last_stance = pick(idx2)

        def nodes_at(p):
            sw_t, sw_p, sw_v = _swing_nodes(cfg, s[p], e[p], last_stance[p],
                                            next_stance[p])
            st_t, st_p, st_v = _stance_nodes(s[p], e[p], next_stance[p])
            sw = is_swing[p]
            return (jnp.where(sw, sw_t, st_t), jnp.where(sw, sw_p, st_p),
                    jnp.where(sw, sw_v, st_v))

        return jax.vmap(nodes_at)(ps)

    node_times, node_pos, node_vel = jax.vmap(leg_parallel)(jnp.arange(NUM_FEET))

    refs = SwingRefs(
        node_times=node_times,
        node_pos=node_pos,
        node_vel=node_vel,
        event_times=schedule.event_times,
        window_start=starts,
        window_stop=stops,
        contact_seq=cs,
    )
    return refs, PlannerState(latest_stance_position=latest)


def foot_reference(refs: SwingRefs, leg, t):
    """(pos(3), vel(3), acc(3)) of the planned foot trajectory at time t —
    the get{X,Y,Z}{position,velocity}Constraint lookups (:91-159)."""
    p = jnp.clip(jnp.searchsorted(refs.event_times, t, side="right"), 0, P1 - 1)

    def axis(a):
        sp = PiecewiseCubic(
            times=refs.node_times[leg, p, a],
            pos=refs.node_pos[leg, p, a],
            vel=refs.node_vel[leg, p, a],
        )
        return eval_piecewise(sp, t)

    out = [axis(a) for a in range(3)]
    pos = jnp.stack([o[0] for o in out])
    vel = jnp.stack([o[1] for o in out])
    acc = jnp.stack([o[2] for o in out])
    return pos, vel, acc


def start_stop_time(refs: SwingRefs, t):
    """(4, 2) current window [start, stop] per leg
    (threadSaftyGetStartStopTime, :469-532)."""
    p = jnp.clip(jnp.searchsorted(refs.event_times, t, side="right"), 0, P1 - 1)
    return jnp.stack([refs.window_start[:, p], refs.window_stop[:, p]], axis=1)
