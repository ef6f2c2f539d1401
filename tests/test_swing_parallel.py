"""The parallel stance-propagation in update_planner (cumulative-max +
gathers) must reproduce the sequential per-phase scan recurrence EXACTLY —
the scan is the reference semantics (SwingTrajectoryPlanner::update chains
footholds phase by phase, :164-286)."""
import jax
import jax.numpy as jnp
import numpy as np

from hunter_bipedal_control_tpu.gait import mode_schedule as ms
from hunter_bipedal_control_tpu.refs import swing_planner as swp
from hunter_bipedal_control_tpu.refs import targets as tg
from hunter_bipedal_control_tpu.refs.swing_planner import (
    _raibert_foothold,
    _stance_nodes,
    _swing_nodes,
)
from hunter_bipedal_control_tpu.gait.mode_schedule import (
    BIG_TIME,
    contact_flags_at_time,
    swing_windows,
)
from hunter_bipedal_control_tpu.refs.targets import interp_state

F32 = jnp.float32
NUM_FEET = 4


def _update_planner_scan(cfg, state, schedule, target, init_time, final_time,
                         body_vel_cmd, current_feet_position):
    """The original sequential implementation (oracle)."""
    dtype = current_feet_position.dtype
    horizon = final_time - init_time
    h_start = init_time - horizon
    h_end = final_time + horizon

    cmd_contact = contact_flags_at_time(schedule, init_time + 0.001, dtype)
    latest = jnp.where(cmd_contact[:, None] > 0.5, current_feet_position,
                       state.latest_stance_position)
    latest = latest.at[:, 2].set(cfg.next_position_z)

    starts, stops, cs = swing_windows(schedule, h_start, h_end)
    P1 = cs.shape[1]
    next_phase_idx = jnp.clip(
        jax.vmap(lambda e: jnp.searchsorted(
            schedule.event_times, e + 1e-6, side="right"))(
            stops.reshape(-1)).reshape(NUM_FEET, P1), 0, P1 - 1)
    next_window_stop = jnp.take_along_axis(stops, next_phase_idx, axis=1)
    last_real_event = jnp.max(jnp.where(
        schedule.event_times < BIG_TIME / 2, schedule.event_times, -BIG_TIME))
    is_tail = stops >= last_real_event - 1e-9
    next_middle_times = jnp.where(is_tail, stops,
                                  0.5 * (stops + next_window_stop))
    current_body_pose = interp_state(target, init_time)[6:12]
    current_body_vel = interp_state(target, init_time)[0:3]

    def leg_scan(leg):
        def body(carry, p):
            last_stance, next_stance, last_final_time = carry
            is_swing = cs[leg, p] < 0.5
            s, e = starts[leg, p], stops[leg, p]
            fresh = is_swing & (init_time < e) & (e > last_final_time + 1e-9)
            next_mid_t = next_middle_times[leg, p]
            next_mid_pose = interp_state(target, next_mid_t)[6:12]
            cand = _raibert_foothold(cfg, leg, init_time, e, next_mid_t,
                                     next_mid_pose, current_body_pose,
                                     current_body_vel, body_vel_cmd)
            new_last = jnp.where(fresh, next_stance, last_stance)
            new_next = jnp.where(fresh, cand, next_stance)
            new_final = jnp.where(fresh, e, last_final_time)
            sw_t, sw_p, sw_v = _swing_nodes(cfg, s, e, new_last, new_next)
            st_t, st_p, st_v = _stance_nodes(s, e, new_next)
            t = jnp.where(is_swing, sw_t, st_t)
            pos = jnp.where(is_swing, sw_p, st_p)
            vel = jnp.where(is_swing, sw_v, st_v)
            return (new_last, new_next, new_final), (t, pos, vel)

        init = (latest[leg], latest[leg], jnp.asarray(-BIG_TIME, dtype))
        _, (t, pos, vel) = jax.lax.scan(body, init, jnp.arange(P1))
        return t, pos, vel

    node_times, node_pos, node_vel = jax.vmap(leg_scan)(jnp.arange(NUM_FEET))
    return swp.SwingRefs(node_times=node_times, node_pos=node_pos,
                         node_vel=node_vel, event_times=schedule.event_times,
                         window_start=starts, window_stop=stops,
                         contact_seq=cs)


def _swing_windows_scan(schedule, horizon_start, horizon_end):
    """The original sequential swing_windows (oracle): forward/backward
    lax.scan propagation of the contiguous equal-flag run boundaries."""
    cs = ms.contact_sequence(schedule)
    starts_of_phase = jnp.concatenate(
        [jnp.asarray(horizon_start)[None], schedule.event_times])
    ends_of_phase = jnp.concatenate(
        [schedule.event_times, jnp.asarray(BIG_TIME)[None]])
    ends_of_phase = jnp.minimum(ends_of_phase, horizon_end)

    def fwd(carry, inp):
        prev_flag, prev_start = carry
        flag, ph_start = inp
        start = jnp.where(flag == prev_flag, prev_start, ph_start)
        return (flag, start), start

    def one_leg_fwd(flags):
        init = (flags[0], jnp.asarray(horizon_start, starts_of_phase.dtype))
        _, starts = jax.lax.scan(fwd, init, (flags, starts_of_phase))
        return starts

    def bwd(carry, inp):
        next_flag, next_stop = carry
        flag, ph_end = inp
        stop = jnp.where(flag == next_flag, next_stop, ph_end)
        return (flag, stop), stop

    def one_leg_bwd(flags):
        init = (flags[-1], jnp.asarray(horizon_end, ends_of_phase.dtype))
        _, stops = jax.lax.scan(bwd, init, (flags, ends_of_phase),
                                reverse=True)
        return stops

    return jax.vmap(one_leg_fwd)(cs), jax.vmap(one_leg_bwd)(cs), cs


def test_swing_windows_matches_scan():
    rng = np.random.default_rng(7)
    gaits = [ms.TROT_GAIT(), ms.FLYING_TROT_GAIT(), ms.STANDING_TROT_GAIT(),
             ms.STANCE_GAIT()]
    for k in range(16):
        tmpl = ms.scale_template(gaits[k % 4], float(rng.uniform(0.6, 1.5)))
        t0 = float(rng.uniform(-1.0, 4.0))
        sched = ms.tile_template(tmpl, t0 - 1.0, t0 + 3.0)
        h0 = t0 + float(rng.uniform(-0.5, 0.5))
        h1 = h0 + float(rng.uniform(0.5, 2.5))
        s_ref, e_ref, cs_ref = _swing_windows_scan(sched, h0, h1)
        s_par, e_par, cs_par = swing_windows(sched, h0, h1)
        np.testing.assert_array_equal(np.asarray(cs_ref), np.asarray(cs_par))
        np.testing.assert_allclose(np.asarray(s_ref), np.asarray(s_par),
                                   rtol=0, atol=0, err_msg=f"case {k} starts")
        np.testing.assert_allclose(np.asarray(e_ref), np.asarray(e_par),
                                   rtol=0, atol=0, err_msg=f"case {k} stops")


def test_parallel_matches_scan():
    cfg = swp.default_swing_config()
    rng = np.random.default_rng(11)
    gaits = [ms.TROT_GAIT(), ms.FLYING_TROT_GAIT(), ms.STANDING_TROT_GAIT(),
             ms.STANCE_GAIT()]
    for k in range(12):
        tmpl = ms.scale_template(gaits[k % 4],
                                 float(rng.uniform(0.7, 1.4)))
        t0 = float(rng.uniform(-0.5, 3.0))
        sched = ms.tile_template(tmpl, t0 - 1.0, t0 + 3.0)
        init_time = t0 + float(rng.uniform(0.0, 0.6))
        final_time = init_time + 0.8
        x = jnp.asarray(
            np.concatenate([rng.normal(0, 0.2, 6),
                            [0.1 * rng.standard_normal(), 0.0, 0.63],
                            rng.normal(0, 0.05, 3),
                            rng.normal(0, 0.1, 10)]), F32)
        target = tg.cmd_vel_to_target(
            jnp.asarray(rng.uniform(-0.3, 0.3, 4), F32), x, init_time, 0.8,
            tg.default_cmd_vel_config())
        feet = jnp.asarray(rng.normal(0, 0.1, (4, 3)), F32)
        feet = feet.at[:, 2].set(0.02)
        cmd6 = jnp.asarray(rng.normal(0, 0.2, 6), F32)
        st = swp.init_planner_state()

        ref_scan = _update_planner_scan(cfg, st, sched, target, init_time,
                                        final_time, cmd6, feet)
        ref_par, _ = swp.update_planner(cfg, st, sched, target, init_time,
                                        final_time, cmd6, feet)
        for a, b, name in ((ref_scan.node_times, ref_par.node_times, "t"),
                           (ref_scan.node_pos, ref_par.node_pos, "pos"),
                           (ref_scan.node_vel, ref_par.node_vel, "vel")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5,
                                       err_msg=f"case {k} {name}")
