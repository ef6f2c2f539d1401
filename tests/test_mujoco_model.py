"""Cross-engine golden tests of the model library against MuJoCo 3.10.

The reference's ground truth is MuJoCo (mujoco/src/main.cc:243-430 simulating
mujoco/model/hunter/hunter.xml) and Pinocchio (legged_wbc/src/WbcBase.cpp:
85-116).  Here every core algorithm — FK, frame placements, mass matrix,
inverse dynamics / nonlinear effects, centroidal momentum, forward dynamics —
is checked against MuJoCo's own mj_* implementations ON IDENTICAL PARAMETERS
(the RobotModel is built from the parsed mjModel via models/mjcf.py), at
randomized configurations.  A separate test bounds the URDF-vs-MJCF parameter
drift (the two ship slightly different base inertials).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

mujoco = pytest.importorskip("mujoco")

from hunter_bipedal_control_tpu.models import mjcf
from hunter_bipedal_control_tpu.models.centroidal import (
    centroidal_momentum_matrix,
    com_position,
)
from hunter_bipedal_control_tpu.models.dynamics import (
    forward_dynamics,
    inverse_dynamics,
    mass_matrix,
    nle,
)
from hunter_bipedal_control_tpu.models.kinematics import contact_positions, fk
from hunter_bipedal_control_tpu.models.robot import load_model


@pytest.fixture(scope="module")
def mj_pair():
    """(RobotModel built from the MJCF, raw mjModel with pure rigid-body
    dynamics: no armature/damping/frictionloss, no contact)."""
    model = mjcf.model_from_mjcf()
    m = mjcf.load_mj_model()
    m.dof_armature[:] = 0.0
    m.dof_damping[:] = 0.0
    m.dof_frictionloss[:] = 0.0
    # random configurations can self-collide the leg geoms / sit at joint
    # limits — disable constraint forces for the pure rigid-body comparison
    m.opt.disableflags |= (mujoco.mjtDisableBit.mjDSBL_CONTACT
                           | mujoco.mjtDisableBit.mjDSBL_LIMIT)
    return model, m


def _random_qv(model, rng, scale_v=0.7):
    q = np.concatenate([
        rng.randn(3) * 0.5 + [0.0, 0.0, 0.7],
        rng.randn(3) * 0.4,
        rng.uniform(np.asarray(model.joint_lower), np.asarray(model.joint_upper)),
    ])
    v = rng.randn(16) * scale_v
    return q, v


SITE_ORDER = ["leg_l_f1_site", "leg_r_f1_site", "leg_l_f2_site", "leg_r_f2_site"]


def test_mj_free_joint_conventions(mj_pair):
    """Pin down the qpos/qvel conventions v_to_mj relies on: linear qvel is
    the world-frame position derivative, angular qvel is body-local."""
    _, m = mj_pair
    rng = np.random.RandomState(0)
    qpos = np.zeros(m.nq)
    qpos[2] = 0.7
    qpos[3:7] = [0.9, 0.1, 0.3, 0.27]
    qpos[3:7] /= np.linalg.norm(qpos[3:7])
    qvel = rng.randn(m.nv) * 0.3
    dt = 1e-7
    q2 = qpos.copy()
    mujoco.mj_integratePos(m, q2, qvel, dt)

    assert np.allclose((q2[0:3] - qpos[0:3]) / dt, qvel[0:3], atol=1e-6)

    def qmul(a, b):
        w1, x1, y1, z1 = a
        w2, x2, y2, z2 = b
        return np.array([
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ])

    dq = (q2[3:7] - qpos[3:7]) / dt
    conj = qpos[3:7] * np.array([1.0, -1, -1, -1])
    om_body = 2 * qmul(conj, dq)[1:]
    assert np.allclose(om_body, qvel[3:6], atol=1e-5)


def test_qv_roundtrip(mj_pair):
    model, _ = mj_pair
    rng = np.random.RandomState(3)
    q, v = _random_qv(model, rng)
    q2, v2 = mjcf.mj_to_q_v(mjcf.q_to_mj(q), mjcf.v_to_mj(q, v))
    np.testing.assert_allclose(q2, q, atol=1e-12)
    np.testing.assert_allclose(v2, v, atol=1e-12)


def test_fk_against_mujoco(mj_pair):
    """Contact-point and link positions vs mj site/body kinematics
    (ref uses Pinocchio FK the same way, WbcBase.cpp:85-116)."""
    model, m = mj_pair
    d = mujoco.MjData(m)
    rng = np.random.RandomState(11)
    site_ids = [mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_SITE, n) for n in SITE_ORDER]
    body_ids = [mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_BODY, n)
                for n in model.link_names]
    for _ in range(10):
        q, _ = _random_qv(model, rng)
        d.qpos[:] = mjcf.q_to_mj(q)
        mujoco.mj_forward(m, d)
        kin = fk(model, jnp.asarray(q))
        pc = np.asarray(contact_positions(model, kin))
        assert np.abs(pc - d.site_xpos[site_ids]).max() < 1e-12
        assert np.abs(np.asarray(kin.p) - d.xpos[body_ids]).max() < 1e-12
        Rw = d.xmat[body_ids].reshape(-1, 3, 3)
        assert np.abs(np.asarray(kin.R) - Rw).max() < 1e-12


def test_mass_matrix_against_mujoco(mj_pair):
    """M(q) vs mj_fullM through the velocity map T: M_ours = T' M_mj T
    (crba parity, WbcBase.cpp:88)."""
    model, m = mj_pair
    d = mujoco.MjData(m)
    rng = np.random.RandomState(7)
    for _ in range(10):
        q, v = _random_qv(model, rng)
        d.qpos[:] = mjcf.q_to_mj(q)
        d.qvel[:] = mjcf.v_to_mj(q, v)
        mujoco.mj_forward(m, d)
        Mfull = np.zeros((m.nv, m.nv))
        mujoco.mj_fullM(m, d, Mfull)
        T = mjcf.velocity_map_to_mj(q)
        M_ours = np.asarray(mass_matrix(model, jnp.asarray(q)))
        assert np.abs(M_ours - T.T @ Mfull @ T).max() < 1e-12


def test_inverse_dynamics_and_nle_against_mujoco(mj_pair):
    """tau(q,v,a) vs mj_inverse and nle vs qfrc_bias, with the exact
    coordinate-rate correction a_mj = T a + Tdot v (Tdot by AD).
    RNEA/nonLinearEffects parity (WbcBase.cpp:89, StateEstimateBase.cpp:
    158-171)."""
    model, m = mj_pair
    d = mujoco.MjData(m)
    rng = np.random.RandomState(13)
    for _ in range(10):
        q, v = _random_qv(model, rng)
        a = rng.randn(16) * 0.5
        qj, vj = jnp.asarray(q), jnp.asarray(v)
        T, Tdot = jax.jvp(mjcf.velocity_map_to_mj_jnp, (qj,), (vj,))
        T, Tdot = np.asarray(T), np.asarray(Tdot)

        d.qpos[:] = mjcf.q_to_mj(q)
        d.qvel[:] = mjcf.v_to_mj(q, v)
        d.qacc[:] = T @ a + Tdot @ v
        mujoco.mj_inverse(m, d)
        tau_ours = np.asarray(inverse_dynamics(model, qj, vj, jnp.asarray(a)))
        scale = 1.0 + np.abs(d.qfrc_inverse).max()
        assert np.abs(tau_ours - T.T @ d.qfrc_inverse).max() / scale < 1e-10

        mujoco.mj_forward(m, d)
        Mfull = np.zeros((m.nv, m.nv))
        mujoco.mj_fullM(m, d, Mfull)
        h_ours = np.asarray(nle(model, qj, vj))
        h_map = T.T @ (d.qfrc_bias + Mfull @ (Tdot @ v))
        assert np.abs(h_ours - h_map).max() / scale < 1e-10


def test_centroidal_momentum_against_mujoco(mj_pair):
    """A(q) v vs MuJoCo subtree momentum: linear = m * v_com, angular =
    subtree_angmom about the CoM (ocs2_centroidal_model CMM parity)."""
    model, m = mj_pair
    d = mujoco.MjData(m)
    rng = np.random.RandomState(17)
    for _ in range(10):
        q, v = _random_qv(model, rng)
        d.qpos[:] = mjcf.q_to_mj(q)
        d.qvel[:] = mjcf.v_to_mj(q, v)
        mujoco.mj_forward(m, d)
        mujoco.mj_subtreeVel(m, d)
        kin = fk(model, jnp.asarray(q))
        h = np.asarray(centroidal_momentum_matrix(model, kin)) @ v
        lin_mj = m.body_subtreemass[1] * d.subtree_linvel[1]
        assert np.abs(h[0:3] - lin_mj).max() < 1e-10
        assert np.abs(h[3:6] - d.subtree_angmom[1]).max() < 1e-10
        com_ours = np.asarray(com_position(model, kin))
        assert np.abs(com_ours - d.subtree_com[1]).max() < 1e-12


def test_forward_dynamics_against_mujoco(mj_pair):
    """Contact-free forward dynamics: our a(q,v,tau) vs mj_forward qacc,
    mapped back through T (a_ours = T^{-1}(a_mj - Tdot v))."""
    model, m = mj_pair
    d = mujoco.MjData(m)
    rng = np.random.RandomState(19)
    for _ in range(5):
        q, v = _random_qv(model, rng)
        tau_j = rng.randn(10) * 5.0
        qj, vj = jnp.asarray(q), jnp.asarray(v)
        T, Tdot = jax.jvp(mjcf.velocity_map_to_mj_jnp, (qj,), (vj,))
        T, Tdot = np.asarray(T), np.asarray(Tdot)

        d.qpos[:] = mjcf.q_to_mj(q)
        d.qvel[:] = mjcf.v_to_mj(q, v)
        d.qfrc_applied[:] = 0.0
        d.ctrl[:] = tau_j
        mujoco.mj_forward(m, d)
        a_mj = d.qacc.copy()

        tau_gen = np.zeros(16)
        tau_gen[6:] = tau_j
        # generalized force maps as f_ours = T^T f_mj; actuation is pure
        # joint torque so it is T-invariant (T has identity joint block)
        a_back = np.linalg.solve(T, a_mj - Tdot @ v)
        # strict check: OUR inverse dynamics of MUJOCO's acceleration must
        # reproduce the applied torque exactly
        tau_rt = np.asarray(
            inverse_dynamics(model, qj, vj, jnp.asarray(a_back)))
        assert np.abs(tau_rt - tau_gen).max() / (1.0 + np.abs(tau_j).max()) < 1e-8
        # direct FD check is looser: forward_dynamics carries a 1e-9
        # Tikhonov shift, which the ~2e-6 ankle inertia amplifies to ~5e-4
        # relative in the ankle rows
        a_ours = np.asarray(
            forward_dynamics(model, qj, vj, jnp.asarray(tau_gen)))
        scale = 1.0 + np.abs(a_mj).max()
        assert np.abs(a_ours - a_back).max() / scale < 2e-3


def test_urdf_vs_mjcf_parameters(mj_pair):
    """Bound the parameter drift between the two shipped models.  The only
    real difference is the base inertial: the URDF merges a 10 g imu link
    the MJCF comments out (hunter.xml:52-55)."""
    model, _ = mj_pair
    urdf = load_model(dtype=jnp.float64)
    assert model.joint_names == urdf.joint_names
    assert model.link_names == urdf.link_names
    np.testing.assert_allclose(
        np.asarray(model.joint_axis), np.asarray(urdf.joint_axis), atol=0)
    np.testing.assert_allclose(
        np.asarray(model.joint_origin_pos), np.asarray(urdf.joint_origin_pos),
        atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(model.joint_lower), np.asarray(urdf.joint_lower), atol=1e-12)
    mass_diff = np.abs(np.asarray(model.link_mass) - np.asarray(urdf.link_mass))
    assert mass_diff[0] == pytest.approx(0.010001, abs=1e-6)  # the imu link
    assert mass_diff[1:].max() < 1e-5  # MJCF rounds masses to ~6 digits
    assert np.abs(np.asarray(model.link_com) - np.asarray(urdf.link_com)).max() < 2e-5
    assert np.abs(np.asarray(model.link_inertia)
                  - np.asarray(urdf.link_inertia)).max() < 1e-5
