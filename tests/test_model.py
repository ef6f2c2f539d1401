"""Model library checks: FK/Jacobian/dynamics consistency.

Strategy (SURVEY.md §4): numeric derivative checks (AD vs finite
difference along trajectories) + physical invariants (symmetry, skew
property of Mdot-2C, momentum consistency), which pin down the math
without a Pinocchio installation.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hunter_bipedal_control_tpu.models import centroidal, dynamics, kinematics, spatial


def rand_qv(model, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(
        np.concatenate(
            [
                rng.uniform(-0.5, 0.5, 3),
                rng.uniform(-0.4, 0.4, 3),
                rng.uniform(np.array(model.joint_lower), np.array(model.joint_upper)),
            ]
        )
    )
    v = jnp.asarray(rng.uniform(-1.0, 1.0, model.nv))
    return q, v


DEFAULT_JOINTS = jnp.array([0.10, 0.00, 0.40, 0.93, 0.53, -0.10, 0.00, -0.40, 0.93, -0.53])


def test_default_pose_feet_near_ground(hunter_model):
    """At the reference default pose (task.info:154-183, base z=0.63) the
    toe/heel contact points must sit near the ground plane."""
    q = jnp.concatenate([jnp.array([0.0, 0.0, 0.63]), jnp.zeros(3), DEFAULT_JOINTS])
    kin = kinematics.fk(hunter_model, q)
    pc = kinematics.contact_positions(hunter_model, kin)
    assert pc.shape == (4, 3)
    # feet near z=0 (the configured stance); legs near-mirror-symmetric (the
    # URDF itself carries small left/right asymmetries, e.g. leg_r3 origin y)
    np.testing.assert_allclose(np.asarray(pc[:, 2]), 0.0, atol=0.06)
    np.testing.assert_allclose(np.asarray(pc[0, [0, 2]]), np.asarray(pc[1, [0, 2]]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(pc[0, 1]), -np.asarray(pc[1, 1]), atol=5e-3)


def test_jacobian_vs_finite_difference(hunter_model):
    model = hunter_model
    q, v = rand_qv(model, 1)
    J = kinematics.contact_jacobians(model, kinematics.fk(model, q))
    eps = 1e-7
    pos = lambda q_: kinematics.contact_positions(model, kinematics.fk(model, q_))
    for k in range(model.nv):
        dq = jnp.zeros(model.nv).at[k].set(eps)
        fd = (pos(q + dq) - pos(q - dq)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(J[:, 0:3, k]), np.asarray(fd), atol=1e-6)


def test_jacobian_dot_matches_fd(hunter_model):
    model = hunter_model
    q, v = rand_qv(model, 2)
    Jd = kinematics.contact_jacobians_dot(model, q, v)
    eps = 1e-6
    Jf = lambda q_: kinematics.contact_jacobians(model, kinematics.fk(model, q_))
    fd = (Jf(q + eps * v) - Jf(q - eps * v)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(Jd), np.asarray(fd), atol=1e-5)


def test_mass_matrix_symmetric_pd(hunter_model):
    model = hunter_model
    q, _ = rand_qv(model, 3)
    M = dynamics.mass_matrix(model, q)
    np.testing.assert_allclose(np.asarray(M), np.asarray(M.T), atol=1e-10)
    w = np.linalg.eigvalsh(np.asarray(M))
    assert w.min() > 1e-8
    # top-left block is total mass * I (world-frame base translation)
    np.testing.assert_allclose(
        np.asarray(M[0:3, 0:3]), float(model.total_mass) * np.eye(3), atol=1e-9
    )


def test_coriolis_property(hunter_model):
    """Mdot - 2C skew-symmetric and nle == C v + g."""
    model = hunter_model
    q, v = rand_qv(model, 4)
    C = dynamics.coriolis_matrix(model, q, v)
    Mdot = jax.jvp(lambda q_: dynamics.mass_matrix(model, q_), (q,), (v,))[1]
    S = np.asarray(Mdot - C - C.T)
    np.testing.assert_allclose(S, -S.T, atol=1e-9)
    np.testing.assert_allclose(np.asarray(S), np.zeros_like(S), atol=1e-9)

    h = dynamics.nle(model, q, v)
    np.testing.assert_allclose(
        np.asarray(h), np.asarray(C @ v + dynamics.gravity_vector(model, q)), atol=1e-9
    )


def test_gravity_vector_structure(hunter_model):
    model = hunter_model
    q, _ = rand_qv(model, 5)
    g = dynamics.gravity_vector(model, q)
    np.testing.assert_allclose(
        np.asarray(g[0:3]), [0.0, 0.0, 9.81 * float(model.total_mass)], atol=1e-9
    )


def test_cmm_linear_rows_equal_com_jacobian(hunter_model):
    model = hunter_model
    q, v = rand_qv(model, 6)
    kin = kinematics.fk(model, q)
    A = centroidal.centroidal_momentum_matrix(model, kin)
    dcom = jax.jacfwd(
        lambda q_: centroidal.com_position(model, kinematics.fk(model, q_))
    )(q)
    np.testing.assert_allclose(
        np.asarray(A[0:3]), float(model.total_mass) * np.asarray(dcom), atol=1e-9
    )


def test_momentum_consistency_along_trajectory(hunter_model):
    """d/dt (sum_i m_i p_ci) == linear rows of A v (finite-diff check)."""
    model = hunter_model
    q, v = rand_qv(model, 7)
    kin = kinematics.fk(model, q)
    A = centroidal.centroidal_momentum_matrix(model, kin)
    h = A @ v
    eps = 1e-6

    def plin(q_):
        k = kinematics.fk(model, q_)
        return (model.link_mass[:, None] * k.com_w).sum(0)

    fd = (plin(q + eps * v) - plin(q - eps * v)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(h[0:3]), np.asarray(fd), atol=1e-6)


def test_centroidal_roundtrip(hunter_model):
    """x -> (q, v) -> rbd -> x roundtrip (mapping + rbd conversions)."""
    model = hunter_model
    q, v = rand_qv(model, 8)
    kin = kinematics.fk(model, q)
    A = centroidal.centroidal_momentum_matrix(model, kin)
    h_norm = (A @ v) / model.total_mass
    x = jnp.concatenate([h_norm, q])
    u = jnp.concatenate([jnp.zeros(12), v[6:]])
    v_rec = centroidal.state_input_to_v(model, x, u)
    np.testing.assert_allclose(np.asarray(v_rec), np.asarray(v), atol=1e-8)

    rbd = centroidal.q_v_to_rbd_state(model, q, v)
    x_rec = centroidal.rbd_state_to_centroidal(model, rbd)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-8)


def test_flow_map_momentum_rate(hunter_model):
    """hdot from flow map equals net wrench about CoM / m."""
    model = hunter_model
    q, v = rand_qv(model, 9)
    kin = kinematics.fk(model, q)
    A = centroidal.centroidal_momentum_matrix(model, kin)
    h_norm = (A @ v) / model.total_mass
    x = jnp.concatenate([h_norm, q])
    rng = np.random.default_rng(10)
    forces = jnp.asarray(rng.uniform(-30, 30, (4, 3)))
    u = jnp.concatenate([forces.reshape(-1), v[6:]])
    xdot = centroidal.flow_map(model, x, u)
    m = float(model.total_mass)
    np.testing.assert_allclose(
        np.asarray(xdot[0:3]), np.asarray(forces.sum(0) / m + jnp.array([0, 0, -9.81])), atol=1e-9
    )
    # base pose rate must equal the true base velocity
    np.testing.assert_allclose(np.asarray(xdot[6:12]), np.asarray(v[0:6]), atol=1e-8)
    np.testing.assert_allclose(np.asarray(xdot[12:]), np.asarray(v[6:]), atol=1e-12)


def test_flow_map_linearization_fd(hunter_model):
    model = hunter_model
    q, v = rand_qv(model, 11)
    kin = kinematics.fk(model, q)
    A = centroidal.centroidal_momentum_matrix(model, kin)
    x = jnp.concatenate([(A @ v) / model.total_mass, q])
    u = jnp.concatenate([jnp.asarray(np.random.default_rng(12).uniform(-20, 20, 12)), v[6:]])
    f, dfdx, dfdu = centroidal.flow_map_linearization(model, x, u)
    eps = 1e-7
    for k in range(0, x.shape[0], 5):
        dx = jnp.zeros_like(x).at[k].set(eps)
        fd = (centroidal.flow_map(model, x + dx, u) - centroidal.flow_map(model, x - dx, u)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(dfdx[:, k]), np.asarray(fd), atol=1e-5)
    for k in range(0, u.shape[0], 5):
        du = jnp.zeros_like(u).at[k].set(eps)
        fd = (centroidal.flow_map(model, x, u + du) - centroidal.flow_map(model, x, u - du)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(dfdu[:, k]), np.asarray(fd), atol=1e-5)


def test_base_kinematics_consistency(hunter_model):
    model = hunter_model
    q, v = rand_qv(model, 13)
    kin = kinematics.fk(model, q)
    A = centroidal.centroidal_momentum_matrix(model, kin)
    x = jnp.concatenate([(A @ v) / model.total_mass, q])
    u = jnp.concatenate([jnp.zeros(12), v[6:]])
    bk = centroidal.base_kinematics_from_centroidal(model, x, u)
    np.testing.assert_allclose(np.asarray(bk.pose), np.asarray(q[0:6]), atol=1e-12)
    np.testing.assert_allclose(np.asarray(bk.velocity[0:3]), np.asarray(v[0:3]), atol=1e-8)
    omega = spatial.global_angular_velocity_from_euler_rates(q[3:6], v[3:6])
    np.testing.assert_allclose(np.asarray(bk.velocity[3:6]), np.asarray(omega), atol=1e-8)


def test_rotation_utils():
    rng = np.random.default_rng(14)
    zyx = jnp.asarray(rng.uniform(-1, 1, 3))
    R = spatial.rotation_zyx(zyx)
    np.testing.assert_allclose(np.asarray(R @ R.T), np.eye(3), atol=1e-12)
    # quaternion roundtrip
    quat = spatial.zyx_to_quat(zyx)
    np.testing.assert_allclose(np.asarray(spatial.quat_to_zyx(quat)), np.asarray(zyx), atol=1e-10)
    # euler rate map inverse
    w = jnp.asarray(rng.uniform(-1, 1, 3))
    dz = spatial.euler_rates_from_global_angular_velocity(zyx, w)
    np.testing.assert_allclose(
        np.asarray(spatial.global_angular_velocity_from_euler_rates(zyx, dz)),
        np.asarray(w),
        atol=1e-10,
    )
    # log3 of axis-angle
    axis = jnp.array([0.0, 0.0, 1.0])
    Rz = spatial.axis_angle_rotation(axis, 0.3)
    np.testing.assert_allclose(np.asarray(spatial.log3(Rz)), [0, 0, 0.3], atol=1e-10)


def test_vmap_batching(hunter_model_f32):
    """The whole model stack vmaps (the TPU scaling axis)."""
    model = hunter_model_f32
    B = 8
    rng = np.random.default_rng(15)
    qs = jnp.asarray(
        np.concatenate(
            [rng.uniform(-0.3, 0.3, (B, 6)), rng.uniform(-0.5, 0.5, (B, model.nj))], axis=1
        ),
        dtype=jnp.float32,
    )
    M = jax.vmap(lambda q: dynamics.mass_matrix(model, q))(qs)
    assert M.shape == (B, model.nv, model.nv)
    pc = jax.vmap(lambda q: kinematics.contact_positions(model, kinematics.fk(model, q)))(qs)
    assert pc.shape == (B, 4, 3)
