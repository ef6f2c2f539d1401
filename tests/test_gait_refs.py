"""Gait schedule, swing planner, target and IK tests."""
import jax
import jax.numpy as jnp
import numpy as np

from hunter_bipedal_control_tpu.gait import adaptive
from hunter_bipedal_control_tpu.gait import mode_schedule as ms
from hunter_bipedal_control_tpu.refs import ik, splines, swing_planner as swp, targets as tg


def test_trot_tiling():
    sched = ms.tile_template(ms.TROT_GAIT(), 0.0, 2.4)
    # [0,0.3) = L, [0.3,0.6) = R, alternating (gait.info trot block)
    assert int(ms.mode_at_time(sched, 0.1)) == ms.L_MODE
    assert int(ms.mode_at_time(sched, 0.4)) == ms.R_MODE
    assert int(ms.mode_at_time(sched, 0.7)) == ms.L_MODE
    np.testing.assert_allclose(
        np.asarray(ms.contact_flags_at_time(sched, 0.1)), [1, 0, 1, 0]
    )


def test_flying_trot_modes():
    f = ms.tile_template(ms.FLYING_TROT_GAIT(), 0.0, 1.0)
    seq = [int(ms.mode_at_time(f, t)) for t in [0.05, 0.17, 0.25, 0.37, 0.45]]
    assert seq == [ms.L_MODE, ms.FLY, ms.R_MODE, ms.FLY, ms.L_MODE]


def test_insert_template_preserves_past():
    sched = ms.tile_template(ms.STANCE_GAIT(), -0.8, 2.4)
    new = adaptive.insert_template(sched, ms.TROT_GAIT(), 0.5, 3.0)
    # before insert: stance; after stance bridge: trot
    assert int(ms.mode_at_time(new, 0.3)) == ms.STANCE
    assert int(ms.mode_at_time(new, 0.55)) == ms.STANCE  # bridge
    assert int(ms.mode_at_time(new, 0.65)) == ms.L_MODE
    assert int(ms.mode_at_time(new, 0.95)) == ms.R_MODE


def test_swing_windows_trot():
    sched = ms.tile_template(ms.TROT_GAIT(), 0.0, 2.4)
    starts, stops, cs = ms.swing_windows(sched, -0.8, 2.4)
    # leg 1 (R toe) swings during L phases: [0, 0.3), stance [0.3, 0.6) ...
    p = ms.phase_index_at_time(sched, 0.1)
    assert float(cs[1, p]) == 0.0
    np.testing.assert_allclose(float(starts[1, p]), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(stops[1, p]), 0.3, atol=1e-6)


def test_cubic_spline_endpoints():
    sp = splines.PiecewiseCubic(
        times=jnp.array([0.0, 0.5, 1.0, 1.0]),
        pos=jnp.array([0.0, 0.8, 0.2, 0.2]),
        vel=jnp.array([0.0, 0.1, 0.0, 0.0]),
    )
    p0, v0, _ = splines.eval_piecewise(sp, 0.0)
    p1, v1, _ = splines.eval_piecewise(sp, 1.0)
    pm, vm, _ = splines.eval_piecewise(sp, 0.5)
    np.testing.assert_allclose(float(p0), 0.0, atol=1e-7)
    np.testing.assert_allclose(float(p1), 0.2, atol=1e-6)
    np.testing.assert_allclose(float(pm), 0.8, atol=1e-6)
    np.testing.assert_allclose(float(vm), 0.1, atol=1e-6)


def test_swing_trajectory_shape(hunter_model_f32):
    """Swing foot lifts to ~swingHeight and lands at the Raibert target."""
    m = hunter_model_f32
    cfg = swp.default_swing_config()
    st = swp.init_planner_state()
    # tile from 0.0 so leg 1's swing window is exactly [0, 0.3)
    sched = ms.tile_template(ms.TROT_GAIT(), 0.0, 2.4)
    dj = jnp.array([0.10, 0., 0.40, 0.93, 0.53, -0.10, 0., -0.40, 0.93, -0.53])
    x0 = jnp.concatenate([jnp.zeros(6), jnp.array([0., 0., 0.63]), jnp.zeros(3), dj])
    target = tg.cmd_vel_to_target(jnp.zeros(4), x0, 0.0, 0.8, tg.default_cmd_vel_config())
    feet = jnp.zeros((4, 3)).at[:, 2].set(0.02)
    refs, _ = swp.update_planner(cfg, st, sched, target, 0.0, 0.8,
                                 jnp.zeros(6), feet)
    # leg 1 swings in [0, 0.3): max z near 0.02 + swingHeight
    zs = [float(swp.foot_reference(refs, 1, t)[0][2]) for t in np.linspace(0.01, 0.29, 20)]
    assert max(zs) > 0.04 and max(zs) < 0.09
    # touchdown back at next_position_z
    np.testing.assert_allclose(
        float(swp.foot_reference(refs, 1, 0.299)[0][2]), 0.02, atol=0.01
    )


def test_cmd_vel_filter_slew_and_deadband():
    cfg = tg.default_cmd_vel_config()
    out = tg.filter_cmd_vel(jnp.array([1.0, 0, 0, 0]), jnp.zeros(4), cfg)
    np.testing.assert_allclose(float(out[0]), 0.05, atol=1e-7)  # slew limit
    out2 = tg.filter_cmd_vel(jnp.array([0.04, 0, 0, 0]), jnp.zeros(4), cfg)
    np.testing.assert_allclose(float(out2[0]), 0.0)  # deadband


def test_ik_roundtrip(hunter_model_f32):
    m = hunter_model_f32
    dj = jnp.array([0.10, 0., 0.40, 0.93, 0.53, -0.10, 0., -0.40, 0.93, -0.53])
    q = jnp.concatenate([jnp.array([0., 0., 0.63]), jnp.zeros(3), dj], dtype=jnp.float32)
    des = ik.foot_positions(m, q)
    rng = np.random.default_rng(3)
    q0 = q.at[6:].add(jnp.asarray(0.15 * rng.uniform(-1, 1, 10), jnp.float32))
    qj = ik.compute_ik(m, q0, des, jnp.eye(3))
    rec = ik.foot_positions(m, q.at[6:].set(qj))
    assert float(jnp.abs(rec - des).max()) < 2e-3


def test_velocity_adaptive_switching():
    st = adaptive.init_gait_run_state()
    # feed high velocity -> switches to trot
    target_state = jnp.zeros(22).at[0].set(0.3)
    for _ in range(5):
        st2, vel_avg = adaptive.vel_abs_update(st, jnp.array([0.3, 0, 0, 0]), target_state)
        st = st2
    assert float(vel_avg) > 0.03
    st = adaptive.walk_gait_switch(st, vel_avg, 0.5, 5.0)
    assert int(st.gait_level) == 1
    # mode after switch time is trot-like (L or R within a period)
    modes = {int(ms.mode_at_time(st.schedule, t)) for t in np.linspace(0.8, 1.4, 13)}
    assert ms.L_MODE in modes and ms.R_MODE in modes


def test_flying_trot_threshold_is_latent_noop():
    """STRICT PARITY with the reference's level-3 branch
    (SwitchedModelReferenceManager.cpp:210-218): crossing the 0.4 m/s
    average sets gaitLevel_=3 but inserts NO template, and getModeSchedule
    keeps re-tiling the last inserted template (trot) — so the adaptive
    controller must keep trotting above 0.4 m/s, with no FLY phase ever
    entering the schedule."""
    st = adaptive.init_gait_run_state()
    target_state = jnp.zeros(22).at[0].set(0.2)
    # ramp through trot first (0.03 < v < 0.4) ...
    for _ in range(10):
        st, vel_avg = adaptive.vel_abs_update(st, jnp.array([0.2, 0, 0, 0]), target_state)
    st = adaptive.walk_gait_switch(st, vel_avg, 0.5, 5.0)
    assert int(st.gait_level) == 1
    # ... then cross the 0.4 threshold (the adaptive path's only route to 3)
    target_state = jnp.zeros(22).at[0].set(0.6)
    for _ in range(60):
        st, vel_avg = adaptive.vel_abs_update(st, jnp.array([0.6, 0, 0, 0]), target_state)
    assert float(vel_avg) >= 0.4
    st = adaptive.walk_gait_switch(st, vel_avg, 1.0, 5.0)
    assert int(st.gait_level) == 3          # level tracks the reference
    # keep walking: extensions at level 3 continue TROT, never flying trot
    for k in range(20):
        t = 1.0 + 0.5 * k
        st = adaptive.extend_schedule(st, t, t + 2.0)
    real = np.asarray(st.schedule.event_times) < ms.BIG_TIME / 2
    modes = np.asarray(st.schedule.modes)[:-1][real]
    assert ms.FLY not in set(modes.tolist()), "flying trot leaked into the schedule"
    assert {ms.L_MODE, ms.R_MODE} <= set(modes.tolist())
    # and dropping back below 0.4 re-inserts trot (gaitLevel_ != 1 branch)
    st2 = adaptive.walk_gait_switch(st, jnp.asarray(0.2), 11.0, 15.0)
    assert int(st2.gait_level) == 1


def test_compact_schedule_preserves_queries():
    """Compaction (GaitSchedule's deque-erase analog) must not change any
    query at t >= keep_from, and must free slots so the window can keep
    extending — without it every walk fell at ~MAX_PHASES * (half gait
    period) seconds when the fixed array saturated with past events."""
    import jax.numpy as jnp
    import numpy as np

    from hunter_bipedal_control_tpu.gait import adaptive, mode_schedule as ms

    seq = []
    sched = ms.tile_template(ms.TROT_GAIT(), 0.0, 100.0)
    c = ms.compact_schedule(sched, 2.0)
    for t in (2.0, 2.05, 2.2, 3.1, 5.0, 9.0):
        assert int(ms.mode_at_time(c, t)) == int(ms.mode_at_time(sched, t)), t
        assert int(ms.phase_index_at_time(c, t)) <= int(
            ms.phase_index_at_time(sched, t))
    # saturation regression: walk the window forward for 60 s of trot —
    # the schedule must always cover [t, t+2] with real (finite) events
    st = adaptive.init_gait_run_state(jnp.float32, 0.0)
    st = st._replace(gait_level=jnp.asarray(1, jnp.int32),
                     schedule=ms.tile_template(ms.TROT_GAIT(), -1.0, 2.4))
    for k in range(60):
        t = 1.0 * k
        st = adaptive.extend_schedule(st, t, t + 2.0)
        ev = st.schedule.event_times
        last = float(jnp.max(jnp.where(ev < ms.BIG_TIME / 2, ev, -ms.BIG_TIME)))
        assert last >= t + 2.0, (k, last)
        # and the phases around t remain alternating trot, not a stuck mode
        modes = [int(ms.mode_at_time(st.schedule, t + dt))
                 for dt in (0.05, 0.2, 0.35, 0.5)]
        assert len(set(modes)) > 1, (k, modes)
        # record the mode stream over [t, t+1) as the loop advances
        seq.extend(int(ms.mode_at_time(st.schedule, t + dt))
                   for dt in np.arange(0.0, 1.0, 0.01))
    # phase-continuity: extensions must CONTINUE the L/R pattern (a restart
    # at the splice doubles a single-support phase to 0.6 s of hop)
    seq = np.asarray(seq[100:])  # skip the initial window
    runs = np.diff(np.flatnonzero(np.concatenate(
        [[True], seq[1:] != seq[:-1], [True]])))
    assert runs.max() * 0.01 <= 0.35, f"single-support run {runs.max()*0.01}s"  # trot phases are 0.3 s; a splice restart doubles one to 0.6
