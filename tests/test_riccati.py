"""Sequential vs associative-scan Riccati equivalence."""
import jax
import jax.numpy as jnp
import numpy as np

from hunter_bipedal_control_tpu.solver.riccati import (
    StageLQ,
    backward_associative,
    backward_scan,
)


def _random_lq(N=25, nx=8, nu=5, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda s: jnp.asarray(rng.standard_normal(s))
    A = mk((N, nx, nx)) * 0.3 + jnp.eye(nx)[None]
    B = mk((N, nx, nu)) * 0.5
    d = mk((N, nx)) * 0.1
    Qxx = jax.vmap(lambda x: x @ x.T + 0.5 * jnp.eye(nx))(mk((N, nx, nx)))
    Qww = jax.vmap(lambda x: x @ x.T + 1.0 * jnp.eye(nu))(mk((N, nu, nu)))
    Qwx = mk((N, nu, nx)) * 0.2
    return StageLQ(A, B, d, Qxx, Qww, Qwx, mk((N, nx)), mk((N, nu)))


def test_associative_matches_sequential_f64():
    lq = _random_lq()
    nx = lq.A.shape[1]
    S0, s0 = jnp.zeros((nx, nx)), jnp.zeros(nx)
    K1, k1, S1, ss1 = backward_scan(lq, S0, s0, 0.0, use_ns=False)
    K2, k2, S2, ss2 = backward_associative(lq, S0, s0, 0.0)
    # associative path recovers gains through NS solves: f32-grade accuracy
    np.testing.assert_allclose(np.asarray(S1), np.asarray(S2), atol=1e-9)
    np.testing.assert_allclose(np.asarray(ss1), np.asarray(ss2), atol=1e-10)
    np.testing.assert_allclose(np.asarray(K1), np.asarray(K2), atol=5e-4)
    np.testing.assert_allclose(np.asarray(k1), np.asarray(k2), atol=5e-4)


def test_ns_scan_matches_lu_scan():
    lq = _random_lq(seed=7)
    nx = lq.A.shape[1]
    S0, s0 = jnp.zeros((nx, nx)), jnp.zeros(nx)
    K1, k1, S1, _ = backward_scan(lq, S0, s0, 1e-8, use_ns=False)
    K2, k2, S2, _ = backward_scan(lq, S0, s0, 1e-8, use_ns=True)
    np.testing.assert_allclose(np.asarray(K1), np.asarray(K2), atol=5e-5)
    np.testing.assert_allclose(np.asarray(S1), np.asarray(S2), atol=5e-4)


def test_gj_scan_matches_lu_scan():
    """riccati_solver='gj' (no-pivot tableau solve) tracks the LU oracle."""
    lq = _random_lq(seed=11)
    nx = lq.A.shape[1]
    S0, s0 = jnp.zeros((nx, nx)), jnp.zeros(nx)
    K1, k1, S1, _ = backward_scan(lq, S0, s0, 1e-8, use_ns=False)
    K2, k2, S2, _ = backward_scan(lq, S0, s0, 1e-8, solver="gj")
    np.testing.assert_allclose(np.asarray(K1), np.asarray(K2), atol=1e-8)
    np.testing.assert_allclose(np.asarray(S1), np.asarray(S2), atol=1e-7)


def test_gj_solve_matches_linalg():
    from hunter_bipedal_control_tpu.ops.linalg import gj_solve

    rng = np.random.default_rng(5)
    A = rng.standard_normal((7, 12, 12))
    A = A @ np.swapaxes(A, -1, -2) + 3.0 * np.eye(12)
    b = rng.standard_normal((7, 12, 4))
    x = gj_solve(jnp.asarray(A), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(A, b),
                               rtol=1e-9, atol=1e-9)
    xv = gj_solve(jnp.asarray(A), jnp.asarray(b[..., 0]))
    np.testing.assert_allclose(np.asarray(xv), np.linalg.solve(A, b)[..., 0],
                               rtol=1e-9, atol=1e-9)


def test_associative_f32_stable():
    lq = jax.tree.map(lambda a: a.astype(jnp.float32), _random_lq(N=60, seed=3))
    nx = lq.A.shape[1]
    S0 = jnp.zeros((nx, nx), jnp.float32)
    s0 = jnp.zeros(nx, jnp.float32)
    K1, k1, _, _ = backward_scan(lq, S0, s0, 1e-6)
    K2, k2, _, _ = backward_associative(lq, S0, s0, 1e-6)
    assert bool(jnp.isfinite(K2).all())
    # f32 NS floor: ~5e-3 relative on O(10) gains — the SQP line search +
    # warm-started resolves absorb this (validated by the full-solver test)
    np.testing.assert_allclose(np.asarray(K1), np.asarray(K2), atol=0.06)


def test_solver_with_parallel_riccati(hunter_model_f32):
    """Full SQP with the parallel Riccati converges like the sequential one."""
    from hunter_bipedal_control_tpu.gait import mode_schedule as ms
    from hunter_bipedal_control_tpu.ocp import problem as ocp
    from hunter_bipedal_control_tpu.refs import swing_planner as swp, targets as tg
    from hunter_bipedal_control_tpu.solver import mpc as mpc_mod, sqp

    F32 = jnp.float32
    m = hunter_model_f32
    dj = jnp.array([0.10, 0., 0.40, 0.93, 0.53, -0.10, 0., -0.40, 0.93, -0.53], F32)
    qnom = jnp.concatenate([jnp.array([0., 0., 0.63], F32), jnp.zeros(3, F32), dj])
    params = ocp.make_input_cost(m, ocp.default_ocp_params(m), qnom)
    x0 = jnp.concatenate([jnp.zeros(6, F32), qnom])
    sched = ms.tile_template(ms.STANCE_GAIT(), -0.8, 2.4)
    target = tg.cmd_vel_to_target(jnp.zeros(4, F32), x0, 0.0, 0.8,
                                  tg.default_cmd_vel_config())
    for par in (False, True):
        settings = sqp.SqpSettings(riccati_parallel=par)
        st = mpc_mod.init_mpc_state(m, settings)
        bundle, _, _, _ = mpc_mod.prepare_references(
            m, settings, swp.default_swing_config(), st.planner, sched, target,
            0.0, x0, jnp.zeros(6, F32), dj)
        xs, us = sqp.initializer_trajectories(m, settings, bundle, x0)
        sol = sqp.solve(m, settings, params, bundle, x0, xs, us)
        for _ in range(2):
            sol = sqp.solve(m, settings, params, bundle, x0, sol.states,
                            sol.inputs[:-1])
        assert float(sol.constraint_violation) < 1e-3, f"parallel={par}"
