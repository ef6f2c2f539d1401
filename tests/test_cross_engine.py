"""Cross-engine plant calibration: the in-graph `fullorder` plant vs real
MuJoCo on the same controller and scenario (VERDICT r1 #1 — 'the JAX
fullorder plant calibrated so base-z / contact-force traces agree within
documented bands').  Bands recorded in docs/DESIGN.md."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

F32 = jnp.float32
DJ = [0.10, 0., 0.40, 0.93, 0.53, -0.10, 0., -0.40, 0.93, -0.53]
WEIGHT = 12.5869 * 9.81


@pytest.mark.slow
def test_stance_traces_agree(hunter_model_f32):
    """1.0 s stance hold on both engines: settled base height, total
    vertical contact force, and attitude agree within documented bands."""
    from hunter_bipedal_control_tpu.backends.fullorder import default_sim_params
    from hunter_bipedal_control_tpu.estim.contact import default_contact_params
    from hunter_bipedal_control_tpu.estim.kalman import default_kalman_params
    from hunter_bipedal_control_tpu.ocp import problem as ocp
    from hunter_bipedal_control_tpu.refs import swing_planner as swp, targets as tg
    from hunter_bipedal_control_tpu.runtime import loop as rloop, sim_loop
    from hunter_bipedal_control_tpu.runtime.controller import default_gains
    from hunter_bipedal_control_tpu.runtime.mj_loop import MjClosedLoop, Segment
    from hunter_bipedal_control_tpu.solver import sqp
    from hunter_bipedal_control_tpu.wbc.wbc import default_wbc_params

    m = hunter_model_f32
    settings = sqp.SqpSettings()
    dj = jnp.asarray(DJ, F32)
    qnom = jnp.concatenate([jnp.array([0., 0., 0.63], F32), jnp.zeros(3, F32),
                            dj])
    params = ocp.make_input_cost(m, ocp.default_ocp_params(m), qnom)

    # --- fullorder (in-graph) plant ---
    q0 = jnp.concatenate([jnp.array([0., 0., 0.63], F32), jnp.zeros(3, F32),
                          dj])
    st = sim_loop.init_sim_loop_state(m, settings, q0)
    cmds = jnp.zeros((100, 4), F32)
    run = jax.jit(lambda st, c: sim_loop.run_sim_loop(
        m, settings, params, swp.default_swing_config(), default_wbc_params(),
        default_gains(), tg.default_cmd_vel_config(), default_kalman_params(),
        default_contact_params(), default_sim_params(), rloop.LoopConfig(),
        st, c, 100, dj))
    fin, telem = run(st, cmds)
    z_fo = np.asarray(telem["base_z"])
    fz_fo = np.asarray(telem["contact_fz"]).sum(axis=1)
    q_fo = np.asarray(telem["q"])

    # --- MuJoCo plant, same controller + scenario ---
    loop = MjClosedLoop()
    tm = loop.run([Segment(1.0, (0., 0., 0., 0.), set_walk=False)])
    z_mj = tm["base_z"]
    fz_mj = tm["contact_fz"].sum(axis=1)
    q_mj = tm["q"]

    # settled comparisons over the last 0.3 s
    z_fo_s, z_mj_s = z_fo[-30:].mean(), z_mj[-150:].mean()
    fz_fo_s, fz_mj_s = fz_fo[-30:].mean(), fz_mj[-150:].mean()
    # documented bands (docs/DESIGN.md "Cross-engine calibration"):
    # round-5 sole-drop geometry (SimParams.sole_drop: the sole-box bottom
    # sits 1.19 cm below the toe/heel frames in hunter.xml) closed the
    # round-2 ~3 cm split to 1.55-1.69 cm (z_fo=0.632, z_mj=0.649).  The
    # remainder is CONTROLLER-EQUILIBRIUM posture, not contact modeling:
    # tripling the contact stiffness moves it only 1.4 mm (static
    # penetration is ~1.5 mm at 31 N/point), and each engine's stance
    # override settles its own joint posture.  Band tightened 0.035->0.02.
    assert abs(z_fo_s - z_mj_s) < 0.02           # geometry-explained band
    np.testing.assert_allclose(fz_fo_s, WEIGHT, rtol=0.10)
    np.testing.assert_allclose(fz_mj_s, WEIGHT, rtol=0.10)
    assert np.abs(q_fo[-30:, 3:5]).max() < 0.05  # both level
    assert np.abs(q_mj[-150:, 3:5]).max() < 0.05
    # estimator-side agreement: each loop's KF height stays consistent with
    # its own ground truth (the stance override regulates toward the
    # CURRENT estimate, so absolute height is a physics equilibrium, not a
    # command) — the 3 cm split is geometry, not estimation drift
    est_z_mj = tm["x_est"][-150:, 8].mean()
    assert abs(est_z_mj - z_mj_s) < 0.03
    assert np.asarray(telem["est_pos_err"])[-30:].max() < 0.03
    # neither trips
    assert not bool(fin.emergency_stop) and not bool(loop.estop)
