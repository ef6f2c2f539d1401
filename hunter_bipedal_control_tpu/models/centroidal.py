"""Full centroidal dynamics model (OCS2 ``FullCentroidalDynamics`` parity).

State / input layout — identical to the reference MPC
(legged_controllers/config/hunter/task.info:154-183, 219-253):

    x (12+nj) = [ h_com/m : normalized centroidal momentum (lin 3, ang 3);
                  base pose: p_xyz (3), theta_zyx (3);
                  joint angles (nj) ]
    u (3*nc+nj) = [ contact forces world frame (nc*3); joint velocities (nj) ]

This module replaces ocs2_centroidal_model (PinocchioCentroidalDynamicsAD,
CentroidalModelPinocchioMapping, CentroidalModelRbdConversions — usage at
legged_interface/src/dynamics/LeggedRobotDynamicsAD.cpp:46-74,
legged_controllers/src/LeggedController.cpp:336,
legged_wbc/src/WbcBase.cpp:124-135).  Derivatives come from jax.jacfwd
instead of CppAD codegen.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .kinematics import KinData, contact_positions, fk, link_com_jacobians
from .robot import GRAVITY, RobotModel
from .spatial import euler_rate_map_zyx


def com_position(model: RobotModel, kin: KinData) -> jnp.ndarray:
    return (model.link_mass[:, None] * kin.com_w).sum(0) / model.total_mass


def centroidal_momentum_matrix(model: RobotModel, kin: KinData) -> jnp.ndarray:
    """(6, nv) CMM A(q): h_com = A v, h about the whole-body CoM, rows
    [linear momentum; angular momentum]."""
    J = link_com_jacobians(model, kin)                  # (L,6,nv)
    Jlin, Jang = J[:, 0:3, :], J[:, 3:6, :]
    Iw = jnp.einsum("kij,kjl,kml->kim", kin.R, model.link_inertia, kin.R)
    p_com = com_position(model, kin)
    r = kin.com_w - p_com[None, :]                      # (L,3)
    A_lin = jnp.einsum("k,kiv->iv", model.link_mass, Jlin)
    # angular: I_w * Jang + m * r x Jlin
    rx = jnp.stack(
        [
            jnp.stack([jnp.zeros_like(r[:, 0]), -r[:, 2], r[:, 1]], axis=-1),
            jnp.stack([r[:, 2], jnp.zeros_like(r[:, 0]), -r[:, 0]], axis=-1),
            jnp.stack([-r[:, 1], r[:, 0], jnp.zeros_like(r[:, 0])], axis=-1),
        ],
        axis=1,
    )  # (L,3,3)
    A_ang = jnp.einsum("kij,kjv->iv", Iw, Jang) + jnp.einsum(
        "k,kij,kjv->iv", model.link_mass, rx, Jlin
    )
    return jnp.concatenate([A_lin, A_ang], axis=0)


# ---------------------------------------------------------------------------
# state accessors
# ---------------------------------------------------------------------------

def state_to_q(x: jnp.ndarray) -> jnp.ndarray:
    """Generalized coordinates from centroidal state (mapping
    ``getPinocchioJointPosition``)."""
    return x[6:]


def joint_angles(x: jnp.ndarray, nj: int) -> jnp.ndarray:
    return x[12:12 + nj]


def joint_velocities(u: jnp.ndarray, nj: int) -> jnp.ndarray:
    return u[u.shape[0] - nj:]


def contact_forces(u: jnp.ndarray, nc: int) -> jnp.ndarray:
    return u[: 3 * nc].reshape(nc, 3)


def base_block_solve(model: RobotModel, Ab: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Solve A_b x = rhs exploiting the exact structure of the CMM base
    block: pure base translation produces zero angular momentum about the
    CoM (sum_k m_k r_k = 0), so

        A_b = [[m I3, A12], [0, A22]]

    is block upper-triangular and the solve reduces to one closed-form 3x3
    inverse — no LU/pivoting anywhere in the flow-map hot path.  rhs may be
    (6,) or (6, k)."""
    from ..ops.linalg import inv3

    vec = rhs.ndim == 1
    if vec:
        rhs = rhs[:, None]
    A12 = Ab[0:3, 3:6]
    A22 = Ab[3:6, 3:6]
    x2 = inv3(A22) @ rhs[3:6]
    x1 = (rhs[0:3] - A12 @ x2) / model.total_mass
    x = jnp.concatenate([x1, x2], axis=0)
    return x[:, 0] if vec else x


def base_velocity_from_momentum(model: RobotModel, kin: KinData, h_norm: jnp.ndarray,
                                vj: jnp.ndarray) -> jnp.ndarray:
    """(6,) [dp_base; dtheta_zyx] solving A_b v_b = m h_norm - A_j v_j
    (mapping ``getPinocchioJointVelocity``)."""
    A = centroidal_momentum_matrix(model, kin)
    Ab, Aj = A[:, 0:6], A[:, 6:]
    rhs = model.total_mass * h_norm - Aj @ vj
    return base_block_solve(model, Ab, rhs)


def state_input_to_v(model: RobotModel, x: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Full generalized velocity v = [v_base(6); vj] from (x, u)."""
    q = state_to_q(x)
    kin = fk(model, q)
    vj = joint_velocities(u, model.nj)
    vb = base_velocity_from_momentum(model, kin, x[0:6], vj)
    return jnp.concatenate([vb, vj])


# ---------------------------------------------------------------------------
# flow map  x_dot = f(x, u)
# ---------------------------------------------------------------------------

def flow_map(model: RobotModel, x: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Centroidal dynamics (PinocchioCentroidalDynamicsAD::getValue parity)."""
    nc, nj = model.num_contacts, model.nj
    q = state_to_q(x)
    kin = fk(model, q)
    forces = contact_forces(u, nc)                      # (nc,3) world
    vj = joint_velocities(u, nj)

    p_com = com_position(model, kin)
    p_c = contact_positions(model, kin)                 # (nc,3)

    m = model.total_mass
    hdot_lin = forces.sum(0) / m + jnp.array([0.0, 0.0, -GRAVITY], dtype=x.dtype)
    hdot_ang = jnp.cross(p_c - p_com[None, :], forces).sum(0) / m

    vb = base_velocity_from_momentum(model, kin, x[0:6], vj)
    return jnp.concatenate([hdot_lin, hdot_ang, vb, vj])


def flow_map_linearization(model: RobotModel, x: jnp.ndarray, u: jnp.ndarray):
    """(f, dfdx, dfdu) — replaces the CppAD-generated Jacobians
    (LeggedRobotDynamicsAD.cpp:66-71)."""
    f = flow_map(model, x, u)
    dfdx = jax.jacfwd(lambda x_: flow_map(model, x_, u))(x)
    dfdu = jax.jacfwd(lambda u_: flow_map(model, x, u_))(u)
    return f, dfdx, dfdu


# ---------------------------------------------------------------------------
# base kinematics for the WBC desired side
# (CentroidalModelRbdConversions::computeBaseKinematicsFromCentroidalModel,
#  called at legged_wbc/src/WbcBase.cpp:134-135 with zero joint accelerations)
# ---------------------------------------------------------------------------

class BaseKinematics(NamedTuple):
    pose: jnp.ndarray          # (6,) [p_xyz, theta_zyx]
    velocity: jnp.ndarray      # (6,) [dp world, omega world]
    acceleration: jnp.ndarray  # (6,) [ddp world, domega world]


def base_kinematics_from_centroidal(model: RobotModel, x: jnp.ndarray,
                                    u: jnp.ndarray) -> BaseKinematics:
    nj = model.nj

    def vb_fn(x_):
        q = state_to_q(x_)
        kin = fk(model, q)
        return base_velocity_from_momentum(model, kin, x_[0:6], joint_velocities(u, nj))

    vb = vb_fn(x)
    xdot = flow_map(model, x, u)
    # d/dt v_b along the flow (zero joint accelerations: u held fixed)
    vb_dot = jax.jvp(vb_fn, (x,), (xdot,))[1]

    theta = x[9:12]
    E = euler_rate_map_zyx(theta)
    omega = E @ vb[3:6]
    Edot = jax.jvp(euler_rate_map_zyx, (theta,), (vb[3:6],))[1]
    omega_dot = E @ vb_dot[3:6] + Edot @ vb[3:6]

    pose = x[6:12]
    vel = jnp.concatenate([vb[0:3], omega])
    acc = jnp.concatenate([vb_dot[0:3], omega_dot])
    return BaseKinematics(pose=pose, velocity=vel, acceleration=acc)


# ---------------------------------------------------------------------------
# rbd-state conversions (CentroidalModelRbdConversions)
# rbdState (2*(6+nj)) = [theta_zyx(3), p(3), qj(nj), omega_world(3), dp(3), dqj(nj)]
# (layout per legged_estimation StateEstimateBase.cpp:73-106)
# ---------------------------------------------------------------------------

def rbd_state_to_centroidal(model: RobotModel, rbd: jnp.ndarray) -> jnp.ndarray:
    """computeCentroidalStateFromRbdModel (LeggedController.cpp:336)."""
    from .spatial import euler_rates_from_global_angular_velocity

    nj = model.nj
    ngc = 6 + nj
    theta = rbd[0:3]
    pos = rbd[3:6]
    qj = rbd[6:6 + nj]
    omega = rbd[ngc:ngc + 3]
    dp = rbd[ngc + 3:ngc + 6]
    dqj = rbd[ngc + 6:ngc + 6 + nj]

    q = jnp.concatenate([pos, theta, qj])
    v = jnp.concatenate([dp, euler_rates_from_global_angular_velocity(theta, omega), dqj])
    kin = fk(model, q)
    A = centroidal_momentum_matrix(model, kin)
    h_norm = (A @ v) / model.total_mass
    return jnp.concatenate([h_norm, pos, theta, qj])


def q_v_to_rbd_state(model: RobotModel, q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    from .spatial import global_angular_velocity_from_euler_rates

    nj = model.nj
    omega = global_angular_velocity_from_euler_rates(q[3:6], v[3:6])
    return jnp.concatenate([q[3:6], q[0:3], q[6:], omega, v[0:3], v[6:]])
