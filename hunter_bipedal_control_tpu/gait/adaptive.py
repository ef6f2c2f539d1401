"""Gait timeline management: template insertion + velocity-adaptive
switching (fixed-shape).

Parity targets:
  - GaitSchedule::insertModeSequenceTemplate (GaitSchedule.cpp:57-89):
    keep the timeline before the insert time, bridge with a
    phase-transition stance, then tile the new template.
  - SwitchedModelReferenceManager::walkGait / trotGait / calculateVelAbs
    (SwitchedModelReferenceManager.cpp:185-249): stance <-> trot <->
    flying-trot switching on a 50-sample average velocity magnitude with
    thresholds 0.02 / 0.03 / 0.4 m/s.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.spatial import rotation_zyx
from .mode_schedule import (
    BIG_TIME,
    MAX_PHASES,
    FLYING_TROT_GAIT,
    STANCE,
    STANCE_GAIT,
    TROT_GAIT,
    GaitTemplate,
    ModeSchedule,
    tile_template,
)

VEL_HISTORY = 50
PHASE_TRANSITION_STANCE_TIME = 0.1  # model_settings (task.info:11)


def insert_template(schedule: ModeSchedule, template: GaitTemplate,
                    insert_time, final_time,
                    stance_time=PHASE_TRANSITION_STANCE_TIME) -> ModeSchedule:
    """Fixed-shape timeline splice: phases strictly before ``insert_time``
    are kept; a stance bridge of ``stance_time`` follows; the template tiles
    from there to ``final_time``."""
    lead_until = insert_time + stance_time
    tiled = tile_template(template, insert_time, final_time,
                          lead_mode=STANCE, lead_until=lead_until)
    # tiled.event_times starts at lead_until; prepend the insert_time event
    # so the bridge phase [insert_time, lead_until) is explicit:
    #   events: [insert_t, lead_until, lead_until+d1, ...]
    #   modes : [STANCE(pre), STANCE(bridge), template...]
    new_events = jnp.concatenate(
        [jnp.asarray(insert_time, tiled.event_times.dtype)[None], tiled.event_times[:-1]]
    )
    stance_pair = jnp.full(2, STANCE, jnp.int32)
    new_modes = jnp.concatenate([stance_pair, tiled.modes[1:-1]])

    n_keep = jnp.searchsorted(schedule.event_times, insert_time, side="left")
    idx = jnp.arange(MAX_PHASES)
    from_old = idx < n_keep
    shifted = jnp.clip(idx - n_keep, 0, MAX_PHASES - 1)
    events = jnp.where(from_old, schedule.event_times, new_events[shifted])
    modes_body = jnp.where(from_old, schedule.modes[1:], new_modes[1:][shifted])
    modes = jnp.concatenate([schedule.modes[:1], modes_body])
    return ModeSchedule(event_times=events, modes=modes)


class GaitRunState(NamedTuple):
    """Persistent adaptive-gait state (gaitLevel_ + velocity history)."""

    schedule: ModeSchedule
    gait_level: jnp.ndarray     # int32: 0 stance, 1 trot, 3 flying trot
    vel_history: jnp.ndarray    # (VEL_HISTORY,)
    hist_count: jnp.ndarray     # int32 valid sample count
    gait_scale: jnp.ndarray = 1.0  # cadence scale for domain sweeps (config 5)


def init_gait_run_state(dtype=jnp.float32, start_time=0.0, horizon=2.4,
                        gait_scale=1.0) -> GaitRunState:
    return GaitRunState(
        schedule=tile_template(STANCE_GAIT(), start_time - horizon, start_time + horizon * 4),
        gait_level=jnp.asarray(0, jnp.int32),
        vel_history=jnp.zeros(VEL_HISTORY, dtype),
        hist_count=jnp.asarray(0, jnp.int32),
        gait_scale=jnp.asarray(gait_scale, dtype),
    )


def vel_abs_update(state: GaitRunState, vel_cmd, target_state):
    """calculateVelAbs (:229-249): blend commanded and reference velocity,
    yaw rate scaled by 1/3, 50-sample running average."""
    zyx = target_state[9:12]
    v_cmd_w = rotation_zyx(zyx) @ vel_cmd[0:3]
    v4_cmd = jnp.stack([v_cmd_w[0], v_cmd_w[1], 0.0, vel_cmd[3] / 3.0])
    vel_est = target_state[0:6]
    v4_est = jnp.stack([vel_est[0], vel_est[1], 0.0, vel_est[3] / 3.0])
    vel_abs = jnp.linalg.norm(0.5 * v4_cmd + 0.5 * v4_est)

    hist = jnp.roll(state.vel_history, 1).at[0].set(vel_abs)
    count = jnp.minimum(state.hist_count + 1, VEL_HISTORY)
    vel_avg = hist.sum() / jnp.maximum(count, 1)
    return state._replace(vel_history=hist, hist_count=count), vel_avg


def walk_gait_switch(state: GaitRunState, vel_avg, init_time, final_time) -> GaitRunState:
    """walkGait (:185-217): hysteresis thresholds 0.02 / 0.03 / 0.4 m/s.
    (The reference's flying-trot branch updates gaitLevel_ without inserting
    the template — a latent no-op; we mirror the *effective* behavior of
    switching between stance and trot, and track level 3 for parity.)"""
    sched = state.schedule
    level = state.gait_level

    # find the next event time >= init_time (findInsertModeSequenceTemplateTimer)
    idx = jnp.searchsorted(sched.event_times, init_time, side="left")
    insert_t = jnp.where(
        idx < MAX_PHASES, sched.event_times[jnp.clip(idx, 0, MAX_PHASES - 1)], init_time
    )
    insert_t = jnp.minimum(insert_t, init_time + 1.0)

    to_stance = (vel_avg <= 0.02) & (level != 0)
    to_trot = (vel_avg > 0.03) & (vel_avg < 0.4) & (level != 1)
    to_fly = (vel_avg >= 0.4) & (level != 3)

    from .mode_schedule import scale_template

    s = state.gait_scale
    sched_stance = insert_template(sched, scale_template(STANCE_GAIT(), s),
                                   insert_t, final_time)
    sched_trot = insert_template(sched, scale_template(TROT_GAIT(), s),
                                 insert_t, final_time)

    new_sched = jax.tree.map(
        lambda a, b, c: jnp.where(to_stance, a, jnp.where(to_trot, b, c)),
        sched_stance, sched_trot, sched,
    )
    new_level = jnp.where(to_stance, 0, jnp.where(to_trot, 1, jnp.where(to_fly, 3, level)))
    return state._replace(schedule=new_sched, gait_level=new_level.astype(jnp.int32))


def fixed_gait_switch(state: GaitRunState, vel_avg, init_time, final_time,
                      template, level_id: int) -> GaitRunState:
    """Stance <-> explicitly-selected-gait switching (the /gait_type toggle
    analog): same 0.02/0.03 hysteresis and next-event insertion as
    walkGait (:185-217), but the walking template is the caller's fixed
    choice (e.g. FLYING_TROT_GAIT) instead of the velocity-adaptive pair."""
    sched = state.schedule
    level = state.gait_level

    idx = jnp.searchsorted(sched.event_times, init_time, side="left")
    insert_t = jnp.where(
        idx < MAX_PHASES, sched.event_times[jnp.clip(idx, 0, MAX_PHASES - 1)], init_time
    )
    insert_t = jnp.minimum(insert_t, init_time + 1.0)

    to_stance = (vel_avg <= 0.02) & (level != 0)
    to_walk = (vel_avg > 0.03) & (level != level_id)

    from .mode_schedule import scale_template

    s = state.gait_scale
    sched_stance = insert_template(sched, scale_template(STANCE_GAIT(), s),
                                   insert_t, final_time)
    sched_walk = insert_template(sched, scale_template(template, s),
                                 insert_t, final_time)
    new_sched = jax.tree.map(
        lambda a, b, c: jnp.where(to_stance, a, jnp.where(to_walk, b, c)),
        sched_stance, sched_walk, sched,
    )
    new_level = jnp.where(to_stance, 0, jnp.where(to_walk, level_id, level))
    return state._replace(schedule=new_sched,
                          gait_level=new_level.astype(jnp.int32))


def extend_schedule(state: GaitRunState, init_time, final_time,
                    template=None) -> GaitRunState:
    """Re-tile when the horizon outruns the stored window (the implicit
    re-tiling GaitSchedule::getModeSchedule performs at every query).

    Past phases older than one second before ``init_time`` are compacted
    away first (GaitSchedule's deque erase), keeping the fixed MAX_PHASES
    window centered on [init_time - 1, final_time] — without this the
    array saturates with history and walking collapses after
    ~MAX_PHASES * (half gait period) seconds."""
    from .mode_schedule import compact_schedule, rotate_template, scale_template

    sched = compact_schedule(state.schedule, init_time - 1.0)
    last_event = jnp.max(
        jnp.where(sched.event_times < BIG_TIME / 2, sched.event_times, -BIG_TIME)
    )
    need = last_event < final_time

    level = state.gait_level
    s = state.gait_scale

    def continuation(tmpl):
        """Rotate the template so the extension CONTINUES the live pattern:
        match the (next, next-next) mode pair encoded in the schedule's
        mode padding against consecutive template modes (pairs are unique
        for all shipped gaits; no match -> restart at modes[0], e.g. right
        after a gait switch)."""
        ev = sched.event_times
        n_real = jnp.sum(ev < BIG_TIME / 2).astype(jnp.int32)
        m = jnp.maximum(n_real - 1, 0)
        mu1 = sched.modes[jnp.clip(m + 1, 0, MAX_PHASES)]
        mu2 = sched.modes[jnp.clip(m + 2, 0, MAX_PHASES)]
        n = tmpl.n_modes
        i = jnp.arange(tmpl.modes.shape[0])
        nxt = tmpl.modes[(i + 1) % jnp.maximum(n, 1)]
        match = (tmpl.modes == mu1) & (nxt == mu2) & (i < n)
        j = jnp.where(jnp.any(match), jnp.argmax(match), 0)
        return rotate_template(tmpl, j)

    # STRICT PARITY with the reference's latent no-op: walkGait's level-3
    # branch sets gaitLevel_=3 WITHOUT inserting the flying-trot template
    # (SwitchedModelReferenceManager.cpp:210-218), and getModeSchedule keeps
    # re-tiling the last *inserted* template — trot.  So above 0.4 m/s the
    # reference keeps trotting, and extensions here do too (level 1 and 3
    # both continue trot).  FLYING_TROT_GAIT stays reachable as an
    # explicitly selected fixed gait (teleop gait toggle / tests).
    # Decision + adaptive crossing test: docs/DESIGN.md, tests/test_gait_coverage.py.
    # ``template`` (static, e.g. FLYING_TROT_GAIT()): explicitly selected
    # fixed gait — the /gait_type toggle analog (TargetTrajectoriesPublisher
    # gait-type publisher, .h:136-150).  The extension then continues THAT
    # pattern instead of the adaptive stance/trot pair.
    if template is not None:
        tmpl = continuation(scale_template(template, s))
        tmpl_st = continuation(scale_template(STANCE_GAIT(), s))
        ext_walk = insert_template(sched, tmpl, last_event, final_time + 2.4, 0.0)
        ext_st = insert_template(sched, tmpl_st, last_event, final_time + 2.4, 0.0)
        ext = jax.tree.map(lambda a, b: jnp.where(level == 0, a, b),
                           ext_st, ext_walk)
        new_sched = jax.tree.map(lambda a, b: jnp.where(need, a, b), ext, sched)
        return state._replace(schedule=new_sched)
    tmpl_trot = continuation(scale_template(TROT_GAIT(), s))
    tmpl_stance = continuation(scale_template(STANCE_GAIT(), s))
    ext_stance = insert_template(sched, tmpl_stance, last_event, final_time + 2.4, 0.0)
    ext_trot = insert_template(sched, tmpl_trot, last_event, final_time + 2.4, 0.0)
    ext = jax.tree.map(
        lambda a, b: jnp.where(level == 0, a, b),
        ext_stance, ext_trot,
    )
    new_sched = jax.tree.map(lambda a, b: jnp.where(need, a, b), ext, sched)
    return state._replace(schedule=new_sched)
