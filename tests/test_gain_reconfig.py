"""Live PD-gain reconfiguration (dynamic_reconfigure parity).

Reference: rqt dynamic_reconfigure -> LeggedController::dynamicParamCallback
(LeggedController.cpp:433-447) updates the 9 joint-group gains of
cfg/Tutorials.cfg mid-run.  TPU-native, GainConfig is a pytree of traced
scalars: swapping a new config into the jitted tick must (a) change the
emitted hybrid command gains on the very next tick and (b) NOT retrace."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hunter_bipedal_control_tpu.gait import mode_schedule as ms
from hunter_bipedal_control_tpu.models.centroidal import q_v_to_rbd_state
from hunter_bipedal_control_tpu.models.robot import load_model
from hunter_bipedal_control_tpu.runtime.controller import (
    GAIN_LIMITS, control_tick, default_gains, reconfigure_gains)
from hunter_bipedal_control_tpu.solver import mpc as mpc_mod, sqp
from hunter_bipedal_control_tpu.wbc.wbc import default_wbc_params, init_wbc_state

F32 = jnp.float32
DJ = jnp.array([0.10, 0., 0.40, 0.93, 0.53, -0.10, 0., -0.40, 0.93, -0.53], F32)


def test_reconfigure_clamps_to_cfg_ranges():
    g = default_gains()
    g2 = reconfigure_gains(g, kp_big_stance=70.0, kd_feet=500.0,
                           kp_position=-5.0)
    assert float(g2.kp_big_stance) == pytest.approx(70.0)
    assert float(g2.kd_feet) == pytest.approx(GAIN_LIMITS["kd_feet"][1])
    assert float(g2.kp_position) == pytest.approx(0.0)
    # untouched fields carried over
    assert float(g2.kd_big) == float(g.kd_big)
    with pytest.raises(ValueError):
        reconfigure_gains(g, kp_nonsense=1.0)


def test_live_gain_swap_no_retrace():
    m = load_model(dtype=F32)
    settings = sqp.SqpSettings(n_intervals=6, horizon=0.1, lin_backend="dense")
    q0 = jnp.concatenate([jnp.array([0., 0., 0.63], F32), jnp.zeros(3, F32), DJ])
    x0 = jnp.concatenate([jnp.zeros(6, F32), q0])
    rbd = q_v_to_rbd_state(m, q0, jnp.zeros(16, F32))
    sched = ms.tile_template(ms.STANCE_GAIT(), -1.0, 4.0)
    sol = sqp.SqpSolution(
        times=jnp.linspace(0, 0.1, 7).astype(F32),
        states=jnp.tile(x0[None], (7, 1)),
        inputs=jnp.zeros((7, 22), F32),
        cost=jnp.asarray(0.0, F32),
        constraint_violation=jnp.asarray(0.0, F32),
        step_size=jnp.asarray(1.0, F32),
    )

    traces = 0

    def tick(gains, wbc_state):
        nonlocal traces
        traces += 1
        out, wbc_state = control_tick(
            m, default_wbc_params(), gains, wbc_state, sol, sched,
            jnp.asarray(0.0, F32), x0, rbd, DJ, jnp.asarray(False),
            jnp.asarray(False), 0.002)
        return out.command, wbc_state

    tick_j = jax.jit(tick)
    g1 = default_gains()
    cmd1, st = tick_j(g1, init_wbc_state(F32))
    kp1 = np.asarray(cmd1.kp)
    # all-stance gain schedule: big joints 40, small joints 30
    # (LeggedController.cpp:224-247 joint grouping)
    assert set(np.round(kp1).tolist()) == {30.0, 40.0}
    assert traces == 1

    g2 = reconfigure_gains(g1, kp_big_stance=70.0, kp_small_stance=55.0)
    cmd2, _ = tick_j(g2, st)
    kp2 = np.asarray(cmd2.kp)
    assert np.allclose(kp2[kp1 == 40.0], 70.0)
    assert np.allclose(kp2[kp1 == 30.0], 55.0)
    assert traces == 1, "gain swap must not retrace the jitted tick"
