"""Physics-in-the-loop closed loop: the sim-backend analog of the
reference's MuJoCo/Gazebo operation, with KF estimation in the loop."""
import jax
import pytest
import jax.numpy as jnp
import numpy as np

from hunter_bipedal_control_tpu.backends.fullorder import (
    default_sim_params,
    init_sim_state,
    sim_step,
)
from hunter_bipedal_control_tpu.estim.contact import default_contact_params
from hunter_bipedal_control_tpu.estim.kalman import default_kalman_params
from hunter_bipedal_control_tpu.ocp import problem as ocp
from hunter_bipedal_control_tpu.refs import swing_planner as swp, targets as tg
from hunter_bipedal_control_tpu.runtime import loop as rloop, sim_loop
from hunter_bipedal_control_tpu.runtime.controller import JointCommand, default_gains
from hunter_bipedal_control_tpu.solver import sqp
from hunter_bipedal_control_tpu.wbc.wbc import default_wbc_params

# closed-loop / sweep compile-heavy module -> slow tier (fast: -m 'not slow')
pytestmark = pytest.mark.slow

F32 = jnp.float32
DJ = jnp.array([0.10, 0., 0.40, 0.93, 0.53, -0.10, 0., -0.40, 0.93, -0.53], F32)


def test_physics_pd_stand(hunter_model_f32):
    """Plain PD against gravity: finite, grounded, weight supported."""
    m = hunter_model_f32
    sp = default_sim_params()
    q0 = jnp.concatenate([jnp.array([0., 0., 0.624], F32), jnp.zeros(3, F32), DJ])
    st = init_sim_state(q0)
    cmd = JointCommand(pos_des=DJ, vel_des=jnp.zeros(10, F32),
                       kp=jnp.full(10, 40., F32), kd=jnp.full(10, 2., F32),
                       tau_ff=jnp.zeros(10, F32))
    step = jax.jit(lambda s: sim_step(m, sp, s, cmd))
    for _ in range(250):  # 0.5 s
        st = step(st)
    assert bool(jnp.isfinite(st.q).all())
    assert 0.45 < float(st.q[2]) < 0.70
    np.testing.assert_allclose(
        float(st.contact_forces[:, 2].sum()), 12.5869 * 9.81, rtol=0.25
    )


def test_sim_loop_stance_balance(hunter_model_f32):
    """Estimator-in-the-loop stance balance (BASELINE config 1)."""
    m = hunter_model_f32
    settings = sqp.SqpSettings()
    qnom = jnp.concatenate([jnp.array([0., 0., 0.63], F32), jnp.zeros(3, F32), DJ])
    params = ocp.make_input_cost(m, ocp.default_ocp_params(m), qnom)
    q0 = jnp.concatenate([jnp.array([0., 0., 0.624], F32), jnp.zeros(3, F32), DJ])
    st = sim_loop.init_sim_loop_state(m, settings, q0)
    NP = 40  # 0.4 s
    cmds = jnp.zeros((NP, 4), F32)
    run = jax.jit(lambda st, c: sim_loop.run_sim_loop(
        m, settings, params, swp.default_swing_config(), default_wbc_params(),
        default_gains(), tg.default_cmd_vel_config(), default_kalman_params(),
        default_contact_params(), default_sim_params(), rloop.LoopConfig(),
        st, c, NP, DJ))
    fin, telem = run(st, cmds)
    z = np.asarray(telem["base_z"])
    q = np.asarray(telem["q"])
    assert np.isfinite(q).all()
    assert z.min() > 0.58 and z.max() < 0.68, (z.min(), z.max())
    # orientation stays upright
    assert np.abs(q[:, 3:6]).max() < 0.15
    assert not bool(fin.emergency_stop)
    # ground supports the robot
    fz = np.asarray(telem["contact_fz"]).sum(axis=1)
    np.testing.assert_allclose(fz[5:].mean(), 12.5869 * 9.81, rtol=0.15)


def test_sim_loop_trot_walk_physics(hunter_model_f32):
    """In-place trot on the FULL physics backend (config 2 with physics):
    the loop must step stably, not just balance in stance."""
    from hunter_bipedal_control_tpu.gait.mode_schedule import TROT_GAIT, tile_template

    m = hunter_model_f32
    settings = sqp.SqpSettings()
    qnom = jnp.concatenate([jnp.array([0., 0., 0.63], F32), jnp.zeros(3, F32), DJ])
    params = ocp.make_input_cost(m, ocp.default_ocp_params(m), qnom)
    q0 = jnp.concatenate([jnp.array([0., 0., 0.624], F32), jnp.zeros(3, F32), DJ])
    st = sim_loop.init_sim_loop_state(m, settings, q0)
    trot = tile_template(TROT_GAIT(), -0.8, 3.2)
    st = st._replace(gait=st.gait._replace(schedule=trot,
                                           gait_level=jnp.asarray(1, jnp.int32)))
    NP = 30  # 0.3 s = one full trot cycle
    cmds = jnp.zeros((NP, 4), F32)
    run = jax.jit(lambda s, c: sim_loop.run_sim_loop(
        m, settings, params, swp.default_swing_config(), default_wbc_params(),
        default_gains(), tg.default_cmd_vel_config(), default_kalman_params(),
        default_contact_params(), default_sim_params(), rloop.LoopConfig(),
        s, c, NP, DJ))
    fin, telem = run(st, cmds)
    q = np.asarray(telem["q"])
    z = np.asarray(telem["base_z"])
    assert np.isfinite(q).all()
    assert not bool(fin.emergency_stop)
    assert z.min() > 0.55 and z.max() < 0.70, (z.min(), z.max())
    assert np.abs(q[:, 3:5]).max() < 0.15
