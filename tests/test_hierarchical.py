"""Hierarchical WBC tests — generalizing the reference's only gtest
(legged_wbc/test/HoQp_test.cpp:18-55): random task hierarchies must satisfy
higher-priority equality tasks exactly and keep inequality residuals
bounded; the product-path hierarchical WBC must satisfy EoM + cone."""
import jax.numpy as jnp
import numpy as np

from hunter_bipedal_control_tpu.wbc.hierarchical import (
    hierarchical_wbc_update,
    solve_hierarchy,
)
from hunter_bipedal_control_tpu.wbc.wbc import WbcState, default_wbc_params, init_wbc_state
from hunter_bipedal_control_tpu.ocp import problem as ocp

F32 = jnp.float32
DJ = jnp.array([0.10, 0., 0.40, 0.93, 0.53, -0.10, 0., -0.40, 0.93, -0.53], F32)


def test_hoqp_two_level_property():
    """HoQp_test parity: level-1 equality exact; level-2 solved in its null
    space without disturbing level 1; inequalities respected."""
    rng = np.random.default_rng(0)
    n = 12
    A1 = jnp.asarray(rng.standard_normal((4, n)), F32)
    b1 = jnp.asarray(rng.standard_normal(4), F32)
    D1 = jnp.asarray(rng.standard_normal((3, n)), F32)
    f1 = jnp.asarray(rng.standard_normal(3) + 3.0, F32)
    A2 = jnp.asarray(rng.standard_normal((6, n)), F32)
    b2 = jnp.asarray(rng.standard_normal(6), F32)

    x = solve_hierarchy([(A1, b1, D1, f1), (A2, b2, None, None)], n)
    x = np.asarray(x, np.float64)
    # level 1 equality satisfied (feasible: 4 eqs in 12 vars)
    assert np.abs(np.asarray(A1) @ x - np.asarray(b1)).max() < 1e-3
    # inequalities hold
    assert (np.asarray(D1) @ x - np.asarray(f1)).max() < 1e-3
    # level 2 improved vs the level-1-only solution
    x1 = solve_hierarchy([(A1, b1, D1, f1)], n)
    r2 = np.linalg.norm(np.asarray(A2) @ x - np.asarray(b2))
    r2_base = np.linalg.norm(np.asarray(A2) @ np.asarray(x1, np.float64) - np.asarray(b2))
    assert r2 <= r2_base + 1e-5


def test_hierarchical_wbc_product_path(hunter_model_f32):
    m = hunter_model_f32
    from hunter_bipedal_control_tpu.models.centroidal import q_v_to_rbd_state
    from hunter_bipedal_control_tpu.models.dynamics import mass_matrix, nle
    from hunter_bipedal_control_tpu.models.kinematics import contact_jacobians, fk

    qnom = jnp.concatenate([jnp.array([0., 0., 0.63], F32), jnp.zeros(3, F32), DJ])
    x_des = jnp.concatenate([jnp.zeros(6, F32), qnom])
    u_des = ocp.weight_compensating_input(m, jnp.ones(4, F32), 22, F32)
    rbd = q_v_to_rbd_state(m, qnom, jnp.zeros(16, F32))
    wp = default_wbc_params()
    x, _ = hierarchical_wbc_update(m, wp, init_wbc_state(), x_des, u_des, rbd,
                                   jnp.ones(4, F32), jnp.asarray(False))
    a, f, tau = x[0:16], x[16:28], x[28:38]
    M = mass_matrix(m, qnom)
    h = nle(m, qnom, jnp.zeros(16, F32))
    J = contact_jacobians(m, fk(m, qnom))[:, 0:3, :].reshape(12, 16)
    S = jnp.zeros((10, 16), F32).at[:, 6:].set(jnp.eye(10, dtype=F32))
    res = M @ a + h - J.T @ f - S.T @ tau
    # f32 projector cascade: sub-Newton EoM residual (gravity scale is 123 N)
    assert float(jnp.abs(res).max()) < 0.5, "EoM violated"
    fz = f.reshape(4, 3)[:, 2]
    assert float(fz.min()) > -0.5
    np.testing.assert_allclose(float(fz.sum()), 12.5869 * 9.81, rtol=0.1)
    # stance feet: no-contact-motion => foot accel ~ 0 (v=0 so dJ v = 0)
    foot_acc = (J @ a).reshape(4, 3)
    assert float(jnp.abs(foot_acc).max()) < 0.5
