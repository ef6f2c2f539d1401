"""EndEffectorLinearConstraint / XYLimitConstraint parity + teleop mapping."""
import jax
import jax.numpy as jnp
import numpy as np

F32 = jnp.float32
DJ = jnp.array([0.10, 0., 0.40, 0.93, 0.53, -0.10, 0., -0.40, 0.93, -0.53], F32)


def _xu(dtype=F32):
    x = jnp.concatenate([
        jnp.array([0.1, -0.05, 0.02, 0.01, 0.0, 0.03], dtype),
        jnp.array([0.0, 0.0, 0.63], dtype), jnp.array([0.02, -0.01, 0.1], dtype), DJ.astype(dtype),
    ])
    u = 0.1 * jnp.sin(jnp.arange(22, dtype=dtype))
    return x, u


def test_ee_linear_matches_fd(hunter_model_f32):
    """AD linearization of the generic EE constraint matches finite differences."""
    from hunter_bipedal_control_tpu.ocp import ee_linear as eel

    m = hunter_model_f32
    x, u = _xu()
    cfg = eel.EeLinearConfig(
        b=jnp.array([0.3, -0.2], F32),
        Ax=jnp.array([[1.0, 2.0, 0.5], [0.0, -1.0, 3.0]], F32),
        Av=jnp.array([[0.2, 0.0, 1.0], [1.0, 0.5, 0.0]], F32),
        active=jnp.ones(2, F32),
    )
    g, Jx, Ju = eel.ee_linear_linearization(m, cfg, 1, x, u)
    eps = 1e-4
    for i in [0, 3, 8, 14]:
        gp = eel.ee_linear_value(m, cfg, 1, x.at[i].add(eps), u)
        gm = eel.ee_linear_value(m, cfg, 1, x.at[i].add(-eps), u)
        np.testing.assert_allclose(np.asarray(Jx[:, i]), np.asarray((gp - gm) / (2 * eps)),
                                   atol=2e-2, rtol=2e-2)
    for i in [0, 5, 13]:
        gp = eel.ee_linear_value(m, cfg, 1, x, u.at[i].add(eps))
        gm = eel.ee_linear_value(m, cfg, 1, x, u.at[i].add(-eps))
        np.testing.assert_allclose(np.asarray(Ju[:, i]), np.asarray((gp - gm) / (2 * eps)),
                                   atol=2e-2, rtol=2e-2)


def test_normal_velocity_config_matches_ocp(hunter_model_f32):
    """The generic normal-velocity config reproduces the fused OCP equality
    row 3 for a swing foot (same math, two formulations)."""
    from hunter_bipedal_control_tpu.ocp import ee_linear as eel
    from hunter_bipedal_control_tpu.ocp import problem as ocp

    m = hunter_model_f32
    x, u = _xu()
    params = ocp.default_ocp_params(m, F32)
    foot_pos_ref = jnp.tile(jnp.array([0.05, 0.1, 0.03], F32), (4, 1))
    foot_vel_ref = jnp.tile(jnp.array([0.0, 0.0, 0.2], F32), (4, 1))
    flags = jnp.array([0.0, 1.0, 1.0, 1.0], F32)  # L_toe swings

    g_eq, mask = ocp.eq_constraints(m, params, x, u, flags, foot_pos_ref, foot_vel_ref)
    cfg = eel.normal_velocity_config(
        foot_pos_ref[0, 2], foot_vel_ref[0, 2], float(params.position_error_gain))
    g = eel.ee_linear_value(m, cfg, 0, x, u)
    # foot 0 rows are [f=0 (3 rows, swing), normal-vel]; row 3 == generic row
    np.testing.assert_allclose(float(g[0]), float(g_eq[3]), atol=1e-5)
    assert float(mask[3]) == 1.0


def test_xy_limit_ramp_gating():
    """eeXYLimitConConfig ramp values/gates (LeggedRobotPreComputation.cpp:121-143)."""
    from hunter_bipedal_control_tpu.ocp import ee_linear as eel

    ss = jnp.array([1.0, 1.3], F32)  # t0=1.0, t3=1.3 -> t2=1.2
    # lift-off window
    c = eel.xy_limit_config(ss, 1.05)
    np.testing.assert_allclose(float(c.b[0]), 10.0 * 20.0 * 0.05, rtol=1e-5)
    assert float(c.Av[0, 0]) == -10.0 and float(c.Av[1, 1]) == -10.0
    np.testing.assert_allclose(np.asarray(c.active), [1, 1, 0, 0])
    # touch-down window
    c = eel.xy_limit_config(ss, 1.25)
    np.testing.assert_allclose(float(c.b[2]), 10.0 * 20.0 * (1.25 - 1.3), rtol=1e-5)
    assert float(c.Av[2, 0]) == 10.0 and float(c.Av[3, 1]) == 10.0
    np.testing.assert_allclose(np.asarray(c.active), [0, 0, 1, 1])
    # outside the swing window everything is off
    c = eel.xy_limit_config(ss, 2.0)
    np.testing.assert_allclose(np.asarray(c.active), [0, 0, 0, 0])
    np.testing.assert_allclose(np.asarray(c.b), np.zeros(4), atol=1e-7)


def test_teleop_default_matches_joy_yaml():
    """Hand-coded defaults == parsing the reference's own joy.yaml."""
    import os
    from hunter_bipedal_control_tpu.runtime import teleop

    ref = "/root/reference/legged_controllers/config/joy.yaml"
    if not os.path.exists(ref):
        import pytest
        pytest.skip("reference tree not mounted")
    parsed = teleop.load_joy_yaml(ref)
    default = teleop.default_teleop_config()
    assert parsed == default


def test_teleop_mapping_semantics():
    from hunter_bipedal_control_tpu.runtime import teleop

    cfg = teleop.default_teleop_config()
    axes = np.zeros(8)
    axes[1] = 1.0   # full forward stick
    axes[3] = -0.5  # half yaw
    buttons = np.zeros(8, np.int32)

    # deadman (button 4) not held -> no cmd_vel
    cmd = teleop.evaluate(cfg, axes, buttons)
    np.testing.assert_allclose(cmd.cmd_vel, 0.0)
    assert not cmd.set_walk and not cmd.emergency_stop

    buttons[4] = 1
    cmd = teleop.evaluate(cfg, axes, buttons)
    np.testing.assert_allclose(cmd.cmd_vel, [0.3, 0.0, 0.0, -0.75])

    buttons[5] = 1  # set_walk trigger (deadman 5 + button 5)
    buttons[3] = 1  # emergency stop
    cmd = teleop.evaluate(cfg, axes, buttons)
    assert cmd.set_walk and cmd.emergency_stop
    # stance_switch needs BOTH deadman buttons 5 and 0
    assert not cmd.stance_switch
    buttons[0] = 1
    assert teleop.evaluate(cfg, axes, buttons).stance_switch

    np.testing.assert_allclose(teleop.keyboard_cmd_vel("w"), [0.35, 0, 0, 0])
    np.testing.assert_allclose(teleop.keyboard_cmd_vel("x"), [0, 0, 0, 0])


def test_body_rotation_target():
    """bodyRotationToTargetTrajectories parity: z slews toward comHeight by at
    most change_limit; attitude jumps to target; xy held."""
    import jax.numpy as jnp
    from hunter_bipedal_control_tpu.refs import targets as tg

    cfg = tg.default_cmd_vel_config()
    x = jnp.zeros(22, jnp.float32).at[6].set(0.4).at[7].set(-0.2).at[8].set(0.5)
    eul = jnp.array([0.3, 0.1, -0.05], jnp.float32)
    t = tg.body_rotation_to_target(eul, x, 0.0, cfg, time_to_target=2.0)
    s0, s1 = np.asarray(t.states[0]), np.asarray(t.states[1])
    # z moved by exactly +change_limit (0.5 -> 0.63 clipped to 0.05); the
    # reference uses the SAME clipped z for the target state too
    # (TargetTrajectoriesPublisher.cpp:134-155 -> :61-86; advisor fix r1)
    np.testing.assert_allclose(s0[8], 0.55, atol=1e-6)
    np.testing.assert_allclose(s1[8], 0.55, atol=1e-6)
    np.testing.assert_allclose(s0[9:12], [0.3, 0.1, -0.05], atol=1e-6)
    np.testing.assert_allclose(s0[6:8], [0.4, -0.2], atol=1e-6)
    np.testing.assert_allclose(s1[6:8], [0.4, -0.2], atol=1e-6)
    assert float(t.times[0]) == 0.0 and float(t.times[-1]) == 2.0
    # cmd_pos wrapper is the same trajectory
    t2 = tg.cmd_pos_to_target(eul, x, 0.0, cfg, time_to_target=2.0)
    np.testing.assert_allclose(np.asarray(t2.states), np.asarray(t.states))
