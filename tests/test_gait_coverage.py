"""Closed-loop coverage of the remaining gait families (standing trot,
flying trot) on the dummy backend — gait.info parity beyond plain trot."""
import jax
import pytest
import jax.numpy as jnp
import numpy as np

from hunter_bipedal_control_tpu.gait import adaptive, mode_schedule as ms
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


def _run_fixed_gait(model, template, n_periods=25, vx=0.3):
    settings = sqp.SqpSettings()
    qnom = jnp.concatenate([jnp.array([0., 0., 0.63], F32), jnp.zeros(3, F32), DJ])
    params = ocp.make_input_cost(model, ocp.default_ocp_params(model), qnom)
    x0 = jnp.concatenate([jnp.zeros(6, F32), qnom])
    st = rloop.init_loop_state(model, settings, x0)
    # pin the schedule to the requested gait (bypass adaptive switching by
    # pre-tiling far beyond the run window)
    sched = ms.tile_template(template, -2.4, 60.0)
    st = st._replace(gait=st.gait._replace(schedule=sched,
                                           gait_level=jnp.asarray(1, jnp.int32),
                                           vel_history=jnp.full(50, 10.0, F32),
                                           hist_count=jnp.asarray(50, jnp.int32)))
    cmds = np.zeros((n_periods, 4), np.float32)
    cmds[3:, 0] = vx
    run = jax.jit(lambda s, c: rloop.run_dummy_loop(
        model, settings, params, swp.default_swing_config(), default_wbc_params(),
        default_gains(), tg.default_cmd_vel_config(), rloop.LoopConfig(),
        s, c, n_periods, DJ))
    fin, telem = run(st, jnp.asarray(cmds))
    return fin, telem


def test_standing_trot_closed_loop(hunter_model_f32):
    fin, telem = _run_fixed_gait(hunter_model_f32, ms.STANDING_TROT_GAIT())
    x = np.asarray(telem["x"])
    assert np.isfinite(x).all()
    assert 0.55 < x[:, 8].min() and x[:, 8].max() < 0.72
    assert not bool(fin.emergency_stop)


def test_flying_trot_closed_loop(hunter_model_f32):
    fin, telem = _run_fixed_gait(hunter_model_f32, ms.FLYING_TROT_GAIT())
    x = np.asarray(telem["x"])
    assert np.isfinite(x).all()
    # flight phases allow more height excursion, but the loop must stay sane
    assert 0.5 < x[:, 8].min() and x[:, 8].max() < 0.8
    assert not bool(fin.emergency_stop)
