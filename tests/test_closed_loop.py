"""End-to-end closed loop against the dummy backend (SURVEY.md §4: the
reference's MRT dummy-loop pattern — solve, integrate the solver's own
dynamics, feed back)."""
import jax
import pytest
import jax.numpy as jnp
import numpy as np

from hunter_bipedal_control_tpu.models.robot import load_model
from hunter_bipedal_control_tpu.ocp import problem as ocp
from hunter_bipedal_control_tpu.refs import swing_planner as swp, targets as tg
from hunter_bipedal_control_tpu.runtime import loop as rloop
from hunter_bipedal_control_tpu.runtime.controller import default_gains
from hunter_bipedal_control_tpu.solver import sqp
from hunter_bipedal_control_tpu.wbc.wbc import default_wbc_params

# closed-loop / sweep compile-heavy module -> slow tier (fast: -m 'not slow')
pytestmark = pytest.mark.slow

F32 = jnp.float32
DJ = jnp.array([0.10, 0., 0.40, 0.93, 0.53, -0.10, 0., -0.40, 0.93, -0.53], F32)


def test_stance_then_walk(hunter_model_f32):
    m = hunter_model_f32
    settings = sqp.SqpSettings()
    qnom = jnp.concatenate([jnp.array([0., 0., 0.63], F32), jnp.zeros(3, F32), DJ])
    params = ocp.make_input_cost(m, ocp.default_ocp_params(m), qnom)
    x0 = jnp.concatenate([jnp.zeros(6, F32), qnom])
    st = rloop.init_loop_state(m, settings, x0)

    NP = 60  # 0.6 s
    cmds = np.zeros((NP, 4), np.float32)
    cmds[20:, 0] = 0.35
    run = jax.jit(
        lambda st, c: rloop.run_dummy_loop(
            m, settings, params, swp.default_swing_config(), default_wbc_params(),
            default_gains(), tg.default_cmd_vel_config(), rloop.LoopConfig(),
            st, c, NP, DJ,
        )
    )
    fin, telem = run(st, jnp.asarray(cmds))
    z = np.asarray(telem["base_z"])
    vx = np.asarray(telem["x"][:, 0])
    gait = np.asarray(telem["gait_level"])
    # base height never leaves a sane band
    assert z.min() > 0.55 and z.max() < 0.72, (z.min(), z.max())
    # gait switched to trot after the command ramp
    assert gait[-1] == 1
    # forward velocity responds toward the command (slew ramp means the
    # robot is still accelerating at the end of this short window)
    assert vx[-1] > 0.05
    # no emergency stop, finite everything
    assert not bool(fin.emergency_stop)
    assert np.isfinite(np.asarray(telem["x"])).all()
    # MPC violations: small in steady state (a transient spike at the gait
    # switch is expected with 1 SQP iteration/solve, as in the reference)
    viol = np.asarray(telem["violation"])
    assert np.median(viol[10:]) < 0.01
    assert viol[-5:].max() < 0.05
