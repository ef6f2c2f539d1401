"""SQP solver, QP solver, WBC and estimator tests (f32 product path)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hunter_bipedal_control_tpu.gait import mode_schedule as ms
from hunter_bipedal_control_tpu.ocp import penalties, problem as ocp
from hunter_bipedal_control_tpu.ops.qp import solve_qp
from hunter_bipedal_control_tpu.refs import swing_planner as swp, targets as tg
from hunter_bipedal_control_tpu.solver import mpc as mpc_mod, sqp
from hunter_bipedal_control_tpu.wbc import wbc as wbc_mod
from hunter_bipedal_control_tpu.estim import kalman

DJ = jnp.array([0.10, 0., 0.40, 0.93, 0.53, -0.10, 0., -0.40, 0.93, -0.53],
               dtype=jnp.float32)


F32 = jnp.float32


@pytest.fixture(scope="module")
def setup(hunter_model_f32):
    m = hunter_model_f32
    settings = sqp.SqpSettings()
    qnom = jnp.concatenate([jnp.array([0., 0., 0.63], F32), jnp.zeros(3, F32), DJ])
    params = ocp.make_input_cost(m, ocp.default_ocp_params(m), qnom)
    return m, settings, params, qnom


def test_penalties():
    # relaxed barrier: smooth at the switch, convex
    for h in [0.05, 0.1, 0.2, 5.0]:
        p, dp, d2p = penalties.relaxed_barrier(jnp.asarray(h), 0.1, 0.1)
        eps = 1e-4
        p1, _, _ = penalties.relaxed_barrier(jnp.asarray(h + eps), 0.1, 0.1)
        p0, _, _ = penalties.relaxed_barrier(jnp.asarray(h - eps), 0.1, 0.1)
        np.testing.assert_allclose(float((p1 - p0) / (2 * eps)), float(dp), rtol=1e-2)
        assert float(d2p) > 0


def test_qp_kkt():
    rng = np.random.default_rng(0)
    n, me, mi = 38, 16, 40
    A = rng.standard_normal((n, n))
    H = jnp.asarray(A @ A.T + n * np.eye(n), jnp.float32)
    g = jnp.asarray(rng.standard_normal(n), jnp.float32)
    Aeq = jnp.asarray(rng.standard_normal((me, n)), jnp.float32)
    beq = jnp.asarray(rng.standard_normal(me), jnp.float32)
    Ain = jnp.asarray(rng.standard_normal((mi, n)), jnp.float32)
    bin_ = jnp.asarray(rng.standard_normal(mi) + 2.0, jnp.float32)
    sol = solve_qp(H, g, Aeq, beq, Ain, bin_, n_iters=20)
    x = np.asarray(sol.x, np.float64)
    assert np.abs(np.asarray(Aeq) @ x - np.asarray(beq)).max() < 1e-4
    assert np.maximum(np.asarray(Ain) @ x - np.asarray(bin_), 0).max() < 1e-4
    r = (np.asarray(H, np.float64) @ x + np.asarray(g)
         + np.asarray(Aeq, np.float64).T @ np.asarray(sol.eq_dual, np.float64)
         + np.asarray(Ain, np.float64).T @ np.asarray(sol.ineq_dual, np.float64))
    assert np.abs(r).max() < 1e-3


def test_structured_linearization_matches_ad(setup):
    """The structure-exploiting knot linearization (AD over q only, analytic
    h/u columns) must match the pure-AD oracle to f32 precision across all
    contact modes."""
    m, settings, params, qnom = setup
    rng = np.random.default_rng(3)
    dt = 0.015
    for flags in ([1, 1, 1, 1], [0, 0, 0, 0], [1, 0, 1, 0], [0, 1, 0, 1]):
        x = jnp.concatenate([
            jnp.asarray(rng.normal(0, 0.2, 6), F32),
            jnp.asarray(rng.normal(0, 0.05, 3), F32) + jnp.array([0, 0, 0.63], F32),
            jnp.asarray(rng.normal(0, 0.1, 3), F32),
            DJ + jnp.asarray(rng.normal(0, 0.1, 10), F32),
        ])
        u = jnp.asarray(rng.normal(0, 20.0, 22), F32)
        fl = jnp.asarray(flags, F32)
        fpr = jnp.asarray(rng.normal(0, 0.3, (4, 3)), F32)
        fvr = jnp.asarray(rng.normal(0, 0.3, (4, 3)), F32)
        ref = ocp.knot_linearization_fused_ad(m, params, x, u, x + 0.01, fl, fpr, fvr, dt)
        fast = ocp.knot_linearization_fused(m, params, x, u, x + 0.01, fl, fpr, fvr, dt)
        for a, b in zip(ref, fast):
            scale = float(jnp.max(jnp.abs(a))) + 1.0
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=1e-4 * scale, rtol=1e-4)


def test_fused_merit_matches_naive(setup):
    """stage_merit_fused == stage_cost_value + rk2_step + eq_constraints."""
    m, settings, params, qnom = setup
    rng = np.random.default_rng(4)
    dt = 0.015
    x = jnp.concatenate([jnp.asarray(rng.normal(0, 0.1, 6), F32), qnom])
    u = jnp.asarray(rng.normal(0, 10.0, 22), F32)
    fl = jnp.asarray([1, 0, 1, 0], F32)
    fpr = jnp.asarray(rng.normal(0, 0.3, (4, 3)), F32)
    fvr = jnp.asarray(rng.normal(0, 0.3, (4, 3)), F32)
    cost, xnext, eq_res = ocp.stage_merit_fused(m, params, x, u, x, fl, fpr, fvr, dt)
    cost_ref = ocp.stage_cost_value(m, params, x, u, x, fl, fpr, fvr)
    xnext_ref = sqp.rk2_step(m, x, u, dt)
    g, mask = ocp.eq_constraints(m, params, x, u, fl, fpr, fvr)
    np.testing.assert_allclose(float(cost), float(cost_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(xnext), np.asarray(xnext_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(eq_res), np.asarray(g * mask), atol=1e-5)


def _stance_bundle(m, settings, params, qnom):
    x0 = jnp.concatenate([jnp.zeros(6, F32), qnom])
    sched = ms.tile_template(ms.STANCE_GAIT(), -0.8, 2.4)
    target = tg.cmd_vel_to_target(jnp.zeros(4, F32), x0, 0.0, 0.8,
                                  tg.default_cmd_vel_config())
    state = mpc_mod.init_mpc_state(m, settings)
    bundle, _, _, _ = mpc_mod.prepare_references(
        m, settings, swp.default_swing_config(), state.planner, sched, target,
        0.0, x0, jnp.zeros(6, F32), DJ)
    return x0, bundle


def test_sqp_stance_converges(setup):
    """Warm-started re-solves drive constraint violation to ~0 with full
    steps, forces sum to the robot weight (KKT-residual assert analog)."""
    m, settings, params, qnom = setup
    x0, bundle = _stance_bundle(m, settings, params, qnom)
    xs, us = sqp.initializer_trajectories(m, settings, bundle, x0)
    sol = sqp.solve(m, settings, params, bundle, x0, xs, us)
    for _ in range(2):
        sol = sqp.solve(m, settings, params, bundle, x0, sol.states, sol.inputs[:-1])
    assert float(sol.constraint_violation) < 1e-3
    assert float(sol.step_size) >= 0.5
    fz = np.asarray(sol.inputs[0, 2:12:3])
    np.testing.assert_allclose(fz.sum(), 12.5869 * 9.81, rtol=0.05)
    # base stays near the commanded height over the horizon
    assert float(jnp.abs(sol.states[:, 8] - 0.63).max()) < 0.03


def test_sqp_batch_vmap(setup):
    """Scenario batching: vmapped solves must match per-scenario solves."""
    m, settings, params, qnom = setup
    x0, bundle = _stance_bundle(m, settings, params, qnom)
    xs, us = sqp.initializer_trajectories(m, settings, bundle, x0)
    B = 3
    x0s = jnp.tile(x0[None], (B, 1)).at[:, 8].add(jnp.array([0.0, 0.01, -0.01]))
    bsolve = jax.vmap(lambda xi: sqp.solve(m, settings, params, bundle, xi, xs, us))
    sols = bsolve(x0s)
    s0 = sqp.solve(m, settings, params, bundle, x0s[1], xs, us)
    np.testing.assert_allclose(
        np.asarray(sols.states[1]), np.asarray(s0.states), atol=1e-5
    )


def test_wbc_eom_and_cone(setup):
    """WBC solution satisfies the EoM equality and friction pyramid."""
    m, settings, params, qnom = setup
    from hunter_bipedal_control_tpu.models.centroidal import q_v_to_rbd_state
    from hunter_bipedal_control_tpu.models.dynamics import mass_matrix, nle

    x_des = jnp.concatenate([jnp.zeros(6, F32), qnom])
    u_des = ocp.weight_compensating_input(m, jnp.ones(4, F32), 22, F32)
    rbd = q_v_to_rbd_state(m, qnom, jnp.zeros(16, F32))
    wp = wbc_mod.default_wbc_params()
    ws = wbc_mod.init_wbc_state()
    x, ws = wbc_mod.wbc_update(m, wp, ws, x_des, u_des, rbd,
                               jnp.ones(4, F32), jnp.asarray(False))
    a, f, tau = x[0:16], x[16:28], x[28:38]
    M = mass_matrix(m, qnom)
    h = nle(m, qnom, jnp.zeros(16, F32))
    from hunter_bipedal_control_tpu.models.kinematics import contact_jacobians, fk
    J = contact_jacobians(m, fk(m, qnom))[:, 0:3, :].reshape(12, 16)
    S = jnp.zeros((10, 16), F32).at[:, 6:].set(jnp.eye(10, dtype=F32))
    res = M @ a + h - J.T @ f - S.T @ tau
    assert float(jnp.abs(res).max()) < 5e-2, "EoM violated"
    fz = f.reshape(4, 3)[:, 2]
    assert float(fz.min()) > -1e-3, "negative normal force"
    np.testing.assert_allclose(float(fz.sum()), 12.5869 * 9.81, rtol=0.05)
    ft = jnp.abs(f.reshape(4, 3)[:, 0:2]).max(axis=1)
    assert bool(jnp.all(ft <= 0.7 * fz + 1e-3)), "friction pyramid violated"
    assert float(jnp.abs(tau).max()) <= 60.0 + 1e-3


def test_wbc_stance_mode(setup):
    m, settings, params, qnom = setup
    from hunter_bipedal_control_tpu.models.centroidal import q_v_to_rbd_state

    x_des = jnp.concatenate([jnp.zeros(6, F32), qnom])
    u_des = jnp.zeros(22, F32)
    rbd = q_v_to_rbd_state(m, qnom, jnp.zeros(16, F32))
    wp = wbc_mod.default_wbc_params()
    ws = wbc_mod.init_wbc_state()
    x, _ = wbc_mod.wbc_update(m, wp, ws, x_des, u_des, rbd,
                              jnp.ones(4, F32), jnp.asarray(True))
    # stance task: base acceleration ~ 0
    assert float(jnp.abs(x[0:6]).max()) < 0.5


def test_wbc_fallback_to_last_solution(setup):
    """An unacceptable QP (rejected by the residual gate, or non-finite
    inputs) must return the LAST accepted solution, not the bad one
    (WeightedWbc.cpp:57-64 parity; VERDICT r1 weak #6)."""
    m, settings, params, qnom = setup
    from hunter_bipedal_control_tpu.models.centroidal import q_v_to_rbd_state

    x_des = jnp.concatenate([jnp.zeros(6, F32), qnom])
    u_des = ocp.weight_compensating_input(m, jnp.ones(4, F32), 22, F32)
    rbd = q_v_to_rbd_state(m, qnom, jnp.zeros(16, F32))
    wp = wbc_mod.default_wbc_params()
    ws = wbc_mod.init_wbc_state()
    x1, ws = wbc_mod.wbc_update(m, wp, ws, x_des, u_des, rbd,
                                jnp.ones(4, F32), jnp.asarray(False))
    assert bool(ws.has_last)

    # residual gate rejects everything -> last solution returned verbatim
    wp_reject = wp._replace(qp_accept_tol=0.0)
    x2, ws2 = wbc_mod.wbc_update(m, wp_reject, ws, x_des, u_des, rbd,
                                 jnp.ones(4, F32), jnp.asarray(False))
    np.testing.assert_array_equal(np.asarray(x2), np.asarray(x1))

    # non-finite measurement -> non-finite QP -> same fallback
    rbd_bad = rbd.at[16].set(jnp.nan)
    x3, _ = wbc_mod.wbc_update(m, wp, ws, x_des, u_des, rbd_bad,
                               jnp.ones(4, F32), jnp.asarray(False))
    np.testing.assert_array_equal(np.asarray(x3), np.asarray(x1))

    # with NO last solution, the fallback is the zero (damping-only) vector
    x4, _ = wbc_mod.wbc_update(m, wp, wbc_mod.init_wbc_state(), x_des, u_des,
                               rbd_bad, jnp.ones(4, F32), jnp.asarray(False))
    np.testing.assert_array_equal(np.asarray(x4), np.zeros(38, np.float32))


def test_kalman_static_convergence(setup):
    """Standing still with correct kinematics: estimated velocity -> 0,
    height -> consistent with foot radius."""
    m, settings, params, qnom = setup
    kp = kalman.default_kalman_params()
    ks = kalman.init_kalman_state()
    zyx = jnp.zeros(3, F32)
    quat = jnp.array([0., 0., 0., 1.], F32)
    accel_local = jnp.array([0., 0., 9.81], F32)
    step = jax.jit(lambda ks: kalman.kalman_update(
        m, kp, ks, zyx, DJ, jnp.zeros(10, F32), jnp.zeros(3, F32), quat,
        accel_local, jnp.ones(4, F32), 0.002))
    for _ in range(200):
        ks, pos, vel = step(ks)
    assert float(jnp.abs(vel).max()) < 1e-2
    # base height ~ 0.63 + footRadius - foot z at default pose (~0.001)
    assert abs(float(pos[2]) - 0.65) < 0.03


def test_model_linesearch_matches_exhaustive(setup):
    """The model-preselected line search (2 exact merit rollouts) accepts the
    same steps as the exhaustive 6-candidate search on the warm-started MPC
    path, and converges identically on stance."""
    m, settings, params, qnom = setup
    x0, bundle = _stance_bundle(m, settings, params, qnom)
    xs, us = sqp.initializer_trajectories(m, settings, bundle, x0)
    s_ex = settings._replace(linesearch="exhaustive")
    s_md = settings._replace(linesearch="model")

    sol_ex = sqp.solve(m, s_ex, params, bundle, x0, xs, us)
    sol_md = sqp.solve(m, s_md, params, bundle, x0, xs, us)
    assert float(sol_md.step_size) == float(sol_ex.step_size)
    np.testing.assert_allclose(np.asarray(sol_md.states),
                               np.asarray(sol_ex.states), atol=1e-6)

    # warm-started re-solves: both reach the same fixed point
    for _ in range(2):
        sol_ex = sqp.solve(m, s_ex, params, bundle, x0, sol_ex.states,
                           sol_ex.inputs[:-1])
        sol_md = sqp.solve(m, s_md, params, bundle, x0, sol_md.states,
                           sol_md.inputs[:-1])
    assert float(sol_md.constraint_violation) < 1e-3
    np.testing.assert_allclose(np.asarray(sol_md.states),
                               np.asarray(sol_ex.states), atol=1e-4)


def test_model_linesearch_walking(setup):
    """Model line search on the full walking MPC step (trot schedule, swing
    refs, IK joint refs): same accepted step and matching trajectories."""
    m, settings, params, qnom = setup
    pcfg = swp.default_swing_config(F32)
    x0 = jnp.concatenate([jnp.zeros(6, F32), qnom])
    sched = ms.tile_template(ms.TROT_GAIT(), -settings.horizon, 4 * settings.horizon)
    target = tg.cmd_vel_to_target(
        jnp.array([0.25, 0., 0., 0.], F32), x0, 0.0, settings.horizon,
        tg.default_cmd_vel_config(nj=10, dtype=F32))

    def run(s):
        state = mpc_mod.init_mpc_state(m, s)
        sol, state, _ = mpc_mod.mpc_step(
            m, s, params, pcfg, state, sched, target, 0.0, x0,
            jnp.zeros(6, F32), DJ)
        sol2, _, _ = mpc_mod.mpc_step(
            m, s, params, pcfg, state, sched, target, 0.01, sol.states[1],
            jnp.zeros(6, F32), DJ)
        return sol, sol2

    sol_ex, sol2_ex = run(settings._replace(linesearch="exhaustive"))
    sol_md, sol2_md = run(settings._replace(linesearch="model"))
    assert float(sol_md.step_size) == float(sol_ex.step_size)
    assert float(sol2_md.step_size) == float(sol2_ex.step_size)
    np.testing.assert_allclose(np.asarray(sol2_md.states),
                               np.asarray(sol2_ex.states), atol=1e-4)
