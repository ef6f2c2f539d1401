"""Whole-body dynamics quantities via Lagrangian automatic differentiation.

TPU-native replacement for the Pinocchio algorithms the reference calls:
``crba`` (mass matrix), ``nonLinearEffects``, ``getCoriolisMatrix``,
``computeGeneralizedGravity`` (legged_wbc/src/WbcBase.cpp:88-90,
legged_estimation/src/StateEstimateBase.cpp:158-171).

Instead of porting Featherstone recursions, the mass matrix is assembled as
M(q) = sum_k J_k^T I_k J_k over link-CoM Jacobians (composite rigid body in
closed form — all small dense matmuls that fuse and batch on the MXU), and
every velocity-dependent term is derived *exactly* from M via AD:

    nle(q, v)       = d(M v)/dq . v - dT/dq + dV/dq        (Euler-Lagrange)
    C(q, v)         = Christoffel contraction of dM/dq      (satisfies Mdot = C + C^T)
    g(q)            = dV/dq

This replaces the CppADCodeGen pipeline of the reference with jax.jacfwd /
jvp and keeps everything shape-static for vmap/pjit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .kinematics import fk, link_com_jacobians
from .robot import GRAVITY, RobotModel


def mass_matrix(model: RobotModel, q: jnp.ndarray) -> jnp.ndarray:
    """(nv, nv) joint-space inertia matrix (crba equivalent)."""
    kin = fk(model, q)
    J = link_com_jacobians(model, kin)          # (L, 6, nv)
    Jlin, Jang = J[:, 0:3, :], J[:, 3:6, :]
    # world-frame rotational inertia per link
    Iw = jnp.einsum("kij,kjl,kml->kim", kin.R, model.link_inertia, kin.R)  # (L,3,3)
    M = jnp.einsum("k,kiv,kiw->vw", model.link_mass, Jlin, Jlin)
    M = M + jnp.einsum("kiv,kij,kjw->vw", Jang, Iw, Jang)
    return M


def kinetic_energy(model: RobotModel, q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * v @ mass_matrix(model, q) @ v


def potential_energy(model: RobotModel, q: jnp.ndarray) -> jnp.ndarray:
    kin = fk(model, q)
    return GRAVITY * jnp.sum(model.link_mass * kin.com_w[:, 2])


def gravity_vector(model: RobotModel, q: jnp.ndarray) -> jnp.ndarray:
    """(nv,) generalized gravity g(q) (computeGeneralizedGravity equivalent)."""
    return jax.grad(lambda q_: potential_energy(model, q_))(q)


def nle(model: RobotModel, q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(nv,) nonlinear effects C(q,v)v + g(q)  (pinocchio::nonLinearEffects)."""
    dMv = jax.jvp(lambda q_: mass_matrix(model, q_) @ v, (q,), (v,))[1]
    dTdq = jax.grad(lambda q_: kinetic_energy(model, q_, v))(q)
    return dMv - dTdq + gravity_vector(model, q)


def coriolis_matrix(model: RobotModel, q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(nv, nv) Coriolis matrix with C(q,v)v = coriolis forces and
    Mdot = C + C^T (the property the momentum observer relies on,
    StateEstimateBase.cpp:165-176)."""
    dM = jax.jacfwd(lambda q_: mass_matrix(model, q_))(q)  # (i,j,k) = dM_ij/dq_k
    term1 = jnp.einsum("ijk,k->ij", dM, v)
    term2 = jnp.einsum("ikj,k->ij", dM, v)
    term3 = jnp.einsum("jki,k->ij", dM, v)
    return 0.5 * (term1 + term2 - term3)


def inverse_dynamics(model: RobotModel, q, v, a) -> jnp.ndarray:
    """(nv,) generalized forces tau = M a + nle (RNEA equivalent)."""
    return mass_matrix(model, q) @ a + nle(model, q, v)


def forward_dynamics(model: RobotModel, q, v, tau_gen) -> jnp.ndarray:
    """(nv,) generalized accelerations given total generalized force
    (actuation + external) — used by the full-order physics backend."""
    M = mass_matrix(model, q)
    rhs = tau_gen - nle(model, q, v)
    # small dense SPD solve; Cholesky maps well to batched TPU linalg
    L = jnp.linalg.cholesky(M + 1e-9 * jnp.eye(M.shape[0], dtype=M.dtype))
    y = jax.scipy.linalg.solve_triangular(L, rhs, lower=True)
    return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)
