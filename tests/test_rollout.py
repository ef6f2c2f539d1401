"""TimeTriggeredRollout integrators (solver/rollout.py).

Parity: the reference's rollout block configures ODE45 with
AbsTol 1e-5 / RelTol 1e-3 (task.info:131-140); the TPU build's bounded
adaptive DoPri5(4) must (a) hit reference tolerances against a fine-step
ground truth, (b) actually adapt (fewer accepted steps for easy dynamics),
and (c) arrive via the .info loader."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hunter_bipedal_control_tpu.models.centroidal import flow_map
from hunter_bipedal_control_tpu.models.robot import load_model
from hunter_bipedal_control_tpu.ocp.problem import weight_compensating_input
from hunter_bipedal_control_tpu.solver.rollout import (
    RolloutSettings, _dopri_substeps, ode45_step, rk4_step, rollout_step)
from hunter_bipedal_control_tpu.solver.sqp import rk2_step


@pytest.fixture(scope="module")
def model():
    return load_model(dtype=jnp.float64)


def _walk_state_input(model, dtype=jnp.float64):
    dj = jnp.array([0.10, 0., 0.40, 0.93, 0.53, -0.10, 0., -0.40, 0.93, -0.53],
                   dtype)
    q = jnp.concatenate([jnp.array([0., 0., 0.63], dtype), jnp.zeros(3, dtype), dj])
    x = jnp.concatenate([jnp.array([0.3, 0.02, 0., 0., 0.01, 0.], dtype), q])
    u = weight_compensating_input(model, jnp.ones(4, dtype), 22, dtype)
    u = u.at[12:].set(0.3)  # nonzero joint velocities
    return x, u


def _ground_truth(model, x, u, dt, n=256):
    h = dt / n

    def body(xk, _):
        return rk4_step(model, xk, u, h), None

    return jax.jit(lambda x0: jax.lax.scan(body, x0, None, length=n)[0])(x)


def test_ode45_meets_reference_tolerance(model):
    x, u = _walk_state_input(model)
    dt = 0.1
    ref = _ground_truth(model, x, u, dt)
    out = jax.jit(lambda x_: ode45_step(model, x_, u, dt))(x)
    scale = 1e-5 + 1e-3 * np.abs(np.asarray(ref))
    err = np.abs(np.asarray(out) - np.asarray(ref)) / scale
    assert np.all(np.isfinite(np.asarray(out)))
    # local tolerance 1e-5/1e-3; allow accumulation over the interval
    assert err.max() < 5.0, err.max()
    # and it must beat a single RK2 step over the same interval
    rk2 = rk2_step(model, x, u, dt)
    assert (np.abs(np.asarray(out) - np.asarray(ref)).max()
            < np.abs(np.asarray(rk2) - np.asarray(ref)).max())


def test_ode45_adapts_step_count(model):
    x, u = _walk_state_input(model)
    f = lambda xk: flow_map(model, xk, u)  # noqa: E731

    s = RolloutSettings(max_substeps=16)
    _, t_hard, acc_hard = _dopri_substeps(f, x, jnp.asarray(0.1), s)
    # loose tolerance -> fewer accepted slots needed for the same interval
    s_loose = RolloutSettings(abs_tol=1e-2, rel_tol=1e-1, max_substeps=16)
    _, t_easy, acc_easy = _dopri_substeps(f, x, jnp.asarray(0.1), s_loose)
    assert float(t_hard) == pytest.approx(0.1, abs=1e-9)
    assert float(t_easy) == pytest.approx(0.1, abs=1e-9)
    assert int(acc_easy.sum()) <= int(acc_hard.sum())


def test_ode45_vmaps(model):
    x, u = _walk_state_input(model)
    xs = jnp.stack([x, x + 0.01, x - 0.01])
    out = jax.jit(jax.vmap(lambda x_: ode45_step(model, x_, u, 0.03)))(xs)
    assert out.shape == xs.shape and bool(jnp.isfinite(out).all())


def test_rollout_step_dispatch(model):
    x, u = _walk_state_input(model)
    for kind in ("ODE45", "RK4", "RK2"):
        out = rollout_step(model, x, u, 0.015,
                           RolloutSettings(integrator=kind))
        assert bool(jnp.isfinite(out).all()), kind
    with pytest.raises(ValueError):
        rollout_step(model, x, u, 0.015, RolloutSettings(integrator="EULER"))


def test_rollout_settings_from_info(model):
    from hunter_bipedal_control_tpu.utils.config import load_task_config

    m32 = load_model()
    cfg = load_task_config(
        m32, "/root/reference/legged_controllers/config/hunter/task.info")
    assert cfg.rollout.integrator == "ODE45"
    assert cfg.rollout.abs_tol == pytest.approx(1e-5)
    assert cfg.rollout.rel_tol == pytest.approx(1e-3)
    assert cfg.rollout.time_step == pytest.approx(0.015)
    assert cfg.rollout.max_steps_per_second == pytest.approx(10000.0)
    assert cfg.ddp.integrator == "ODE45"


@pytest.mark.slow
def test_ddp_solves_with_ode45(model):
    """DdpSettings.integrator='ODE45' runs the SLQ solve end to end.
    slow tier: the 2-alpha x 5-knot x 4-slot DoPri rollout graph is a
    multi-minute CPU compile."""
    from hunter_bipedal_control_tpu.gait import mode_schedule as ms
    from hunter_bipedal_control_tpu.ocp import problem as ocp
    from hunter_bipedal_control_tpu.refs import swing_planner as swp
    from hunter_bipedal_control_tpu.refs import targets as tg
    from hunter_bipedal_control_tpu.solver import ddp, mpc as mpc_mod, sqp

    dtype = jnp.float32
    m = load_model(dtype=dtype)
    N = 5
    settings = sqp.SqpSettings(n_intervals=N, horizon=0.075, lin_backend="dense")
    dj = jnp.array([0.10, 0., 0.40, 0.93, 0.53, -0.10, 0., -0.40, 0.93, -0.53],
                   dtype)
    qnom = jnp.concatenate([jnp.array([0., 0., 0.63], dtype),
                            jnp.zeros(3, dtype), dj])
    params = ocp.make_input_cost(m, ocp.default_ocp_params(m, dtype), qnom)
    x0 = jnp.concatenate([jnp.zeros(6, dtype), qnom])
    sched = ms.tile_template(ms.STANCE_GAIT(), -1.0, 4.0)
    target = tg.cmd_vel_to_target(jnp.zeros(4, dtype), x0, 0.0, 0.075,
                                  tg.default_cmd_vel_config(dtype=dtype))
    bundle, _, _, _ = mpc_mod.prepare_references(
        m, settings, swp.default_swing_config(dtype),
        swp.init_planner_state(dtype), sched, target, 0.0, x0,
        jnp.zeros(6, dtype), dj)
    xs0, us0 = sqp.initializer_trajectories(m, settings, bundle, x0)
    dset = ddp.DdpSettings(n_intervals=N, horizon=0.075, integrator="ODE45",
                           max_substeps=4, alphas=(1.0, 0.25))
    sol = ddp.solve(m, dset, params, bundle, x0, xs0, us0)
    assert bool(jnp.isfinite(sol.cost))
    assert bool(jnp.isfinite(sol.states).all())
