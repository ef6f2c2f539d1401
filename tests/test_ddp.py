"""SLQ/DDP solver: feasible iterates, stance balance quality."""
import jax
import pytest
import jax.numpy as jnp
import numpy as np

from hunter_bipedal_control_tpu.gait import mode_schedule as ms
from hunter_bipedal_control_tpu.ocp import problem as ocp
from hunter_bipedal_control_tpu.refs import swing_planner as swp, targets as tg
from hunter_bipedal_control_tpu.solver import ddp, mpc as mpc_mod, sqp

# closed-loop / sweep compile-heavy module -> slow tier (fast: -m 'not slow')
pytestmark = pytest.mark.slow

F32 = jnp.float32
DJ = jnp.array([0.10, 0., 0.40, 0.93, 0.53, -0.10, 0., -0.40, 0.93, -0.53], F32)


def test_ddp_stance(hunter_model_f32):
    m = hunter_model_f32
    qnom = jnp.concatenate([jnp.array([0., 0., 0.63], F32), jnp.zeros(3, F32), DJ])
    params = ocp.make_input_cost(m, ocp.default_ocp_params(m), qnom)
    x0 = jnp.concatenate([jnp.zeros(6, F32), qnom])
    sched = ms.tile_template(ms.STANCE_GAIT(), -0.8, 2.4)
    target = tg.cmd_vel_to_target(jnp.zeros(4, F32), x0, 0.0, 0.8,
                                  tg.default_cmd_vel_config())
    sqp_settings = sqp.SqpSettings()
    state = mpc_mod.init_mpc_state(m, sqp_settings)
    bundle, _, _, _ = mpc_mod.prepare_references(
        m, sqp_settings, swp.default_swing_config(), state.planner, sched,
        target, 0.0, x0, jnp.zeros(6, F32), DJ)
    xs, us = sqp.initializer_trajectories(m, sqp_settings, bundle, x0)

    # SLQ runs warm-started in MPC (the reference's usage; cold single
    # shooting over 0.8 s of floating-base dynamics diverges for classic
    # DDP as well) — warm start from a couple of SQP solves
    warm = sqp.solve(m, sqp_settings, params, bundle, x0, xs, us)
    for _ in range(2):
        warm = sqp.solve(m, sqp_settings, params, bundle, x0, warm.states,
                         warm.inputs[:-1])

    settings = ddp.DdpSettings(n_iterations=2)
    sol = ddp.solve(m, settings, params, bundle, x0, warm.states,
                    warm.inputs[:-1])
    assert bool(jnp.isfinite(sol.states).all())
    # full steps accepted, equality constraints held
    assert float(sol.step_size) >= 0.5
    assert float(sol.constraint_violation) < 1e-3
    # single shooting: the trajectory is dynamically feasible by construction
    def defect(k):
        return sol.states[k + 1] - sqp.rk2_step(
            m, sol.states[k], sol.inputs[k], settings.horizon / settings.n_intervals)
    defects = jax.vmap(defect)(jnp.arange(settings.n_intervals))
    assert float(jnp.abs(defects).max()) < 1e-4
    # stance quality: base stays near height, forces near weight
    assert float(jnp.abs(sol.states[:, 8] - 0.63).max()) < 0.05
    fz = np.asarray(sol.inputs[0, 2:12:3]).sum()
    np.testing.assert_allclose(fz, 12.5869 * 9.81, rtol=0.15)
