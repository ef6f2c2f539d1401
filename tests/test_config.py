"""Config system: .info parsing + drop-in loading of reference config files."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from hunter_bipedal_control_tpu.utils import info

REF = "/root/reference/legged_controllers/config/hunter"


def test_info_roundtrip():
    text = """
; comment
model
{
  gain   20
  flag   true
  name   hello
}
Q
{
  scaling 2.0
  (0,0) 1.5
  (1,1) 2.5
}
list
{
  [0] alpha
  [1] beta
}
"""
    t = info.loads(text)
    assert info.get(t, "model.gain") == 20
    assert info.get(t, "model.flag") is True
    assert info.get(t, "model.name") == "hello"
    M = info.get_matrix(t, "Q")
    np.testing.assert_allclose(M, [[3.0, 0], [0, 5.0]])
    assert info.get_list(t, "list") == ["alpha", "beta"]
    # dump and re-parse
    t2 = info.loads(info.dumps(t))
    assert info.get(t2, "model.gain") == 20


@pytest.mark.skipif(not os.path.exists(REF), reason="reference configs absent")
def test_load_reference_task_info(hunter_model_f32):
    from hunter_bipedal_control_tpu.utils.config import load_task_config

    cfg = load_task_config(
        hunter_model_f32,
        os.path.join(REF, "task.info"),
        os.path.join(REF, "reference.info"),
        os.path.join(REF, "gait.info"),
    )
    assert cfg.sqp.n_intervals == 53
    assert cfg.sqp.horizon == 0.8
    assert cfg.sqp.n_iterations == 1
    np.testing.assert_allclose(float(cfg.ocp.friction_coeff), 0.7)
    np.testing.assert_allclose(float(cfg.ocp.Q[8, 8]), 500.0)
    np.testing.assert_allclose(float(cfg.ocp.Q[0, 0]), 13.0)
    np.testing.assert_allclose(float(cfg.wbc.swing_kp), 160.0)
    np.testing.assert_allclose(float(cfg.wbc.weight_swing), 100.0)
    np.testing.assert_allclose(float(cfg.kalman.foot_radius), 0.02)
    np.testing.assert_allclose(float(cfg.contact.contact_threshold), 75.0)
    np.testing.assert_allclose(float(cfg.swing.swing_height), 0.04)
    np.testing.assert_allclose(float(cfg.cmd_vel.com_height), 0.63)
    np.testing.assert_allclose(
        np.asarray(cfg.default_joints),
        [0.10, 0., 0.40, 0.93, 0.53, -0.10, 0., -0.40, 0.93, -0.53], atol=1e-7)
    assert set(cfg.gaits) == {"stance", "trot", "standing_trot", "flying_trot"}
    assert int(cfg.gaits["trot"].n_modes) == 2
    np.testing.assert_allclose(float(cfg.gaits["flying_trot"].duration), 0.4)
    # initial state from task.info
    np.testing.assert_allclose(float(cfg.initial_state[8]), 0.63)
    # R got mapped through the foot jacobian (joint block nonzero)
    assert float(jnp.abs(cfg.ocp.R[12:, 12:]).max()) > 0.0
    # ddp + ipm settings parity (LeggedInterface.cpp:93-95)
    assert cfg.sqp.g_max == 1e-2 and cfg.sqp.g_min == 1e-6
    assert cfg.ddp.n_iterations == 1
    assert cfg.ddp.hess_reg == 1e-5 and cfg.ddp.min_step == 1e-2
    assert cfg.ipm.n_iterations == 1
    assert cfg.ipm.g_max == 10.0
    assert cfg.ipm.initial_barrier == 1e-4
    assert cfg.ipm.barrier_decrease_factor == 0.2
    assert cfg.ipm.barrier_superlinear_power == 1.5
    assert cfg.ipm.fraction_to_boundary == 0.995
    assert cfg.ipm.initial_slack_margin_rate == 1e-2
