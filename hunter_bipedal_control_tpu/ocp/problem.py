"""The NMPC optimal-control problem: costs, soft constraints, equality
constraints — fixed-shape, mask-activated, Gauss-Newton quadratics.

Parity map (reference -> here):
  - base tracking cost (LeggedRobotQuadraticTrackingCost.h:42-120, u_nom =
    weight-compensating forces utils.h:73-93)      -> tracking terms
  - friction cone soft constraint (FrictionConeConstraint.cpp:70-236 with
    relaxed barrier mu=0.1 delta=5, task.info:255-262) -> cone rows
  - xy swing soft constraint (XYReferenceConstraintCppAd + QuadraticPenalty
    weight 20, LeggedRobotPreComputation.cpp:108-119)  -> xy rows
  - joint pos/vel + force limit soft constraints
    (LeggedInterface::getLimitConstraints :317-357)    -> limit rows
  - zeroForce / zeroVelocity / normalVelocity equality constraints
    (LeggedInterface.cpp:141-147, 433-446;
     LeggedRobotPreComputation.cpp:96-107)             -> eq_constraints

Mode-dependent structure ("hard parts", SURVEY.md §7.4) is realized as
masked fixed-size rows: every knot always carries 16 equality rows and 36
soft rows; contact flags toggle which rows are live.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.centroidal import (
    contact_forces,
    joint_velocities,
    state_input_to_v,
    state_to_q,
)
from ..models.kinematics import (
    _skew_batch,
    contact_jacobians,
    contact_positions,
    fk,
    link_com_jacobians,
)
from ..models.robot import GRAVITY, RobotModel
from . import penalties

NUM_FEET = 4
N_EQ_PER_FOOT = 4
N_EQ = NUM_FEET * N_EQ_PER_FOOT  # 16


class OcpParams(NamedTuple):
    """All task.info-derived weights (defaults = hunter task.info)."""

    Q: jnp.ndarray                 # (nx, nx)
    R: jnp.ndarray                 # (nu, nu) joint-space mapped
    friction_coeff: jnp.ndarray    # 0.7
    cone_regularization: jnp.ndarray  # 25.0
    cone_mu: jnp.ndarray           # 0.1
    cone_delta: jnp.ndarray        # 5.0
    swing_weight: jnp.ndarray      # 20.0
    position_error_gain: jnp.ndarray  # 20 (normal vel constraint)
    xy_position_gain: jnp.ndarray  # 3 (xy + zero-vel z gain)
    stance_z_ref: jnp.ndarray      # 0.02 (zero velocity z target)
    pos_limit_mu: jnp.ndarray
    pos_limit_delta: jnp.ndarray
    vel_limit_mu: jnp.ndarray
    vel_limit_delta: jnp.ndarray
    force_limit_mu: jnp.ndarray
    force_limit_delta: jnp.ndarray
    force_z_max: jnp.ndarray       # 350
    joint_lower: jnp.ndarray       # (nj,)
    joint_upper: jnp.ndarray
    joint_vel_limit: jnp.ndarray
    # self-collision soft constraint (LeggedInterface.cpp:452-490): None
    # mirrors the reference's empty collisionPairs list (task.info:270-287);
    # set to an ocp.self_collision.CollisionConfig to enable.  The solver
    # adds the state-only relaxed-barrier term at its linearization/merit
    # call sites (solver/sqp.py).
    collision: object = None


def default_ocp_params(model: RobotModel, dtype=jnp.float32) -> OcpParams:
    nj = model.nj
    nx = 12 + nj
    nu = 3 * NUM_FEET + nj
    # Q diag per task.info:186-217
    qdiag = np.concatenate(
        [np.full(6, 13.0), [500.0, 500.0, 500.0, 100.0, 500.0, 500.0], np.full(nj, 10.0)]
    )
    Q = jnp.asarray(np.diag(qdiag), dtype)
    R = jnp.asarray(np.diag(np.full(nu, 1e-3 * 5.0)), dtype)  # placeholder; see make_input_cost
    return OcpParams(
        Q=Q,
        R=R,
        friction_coeff=jnp.asarray(0.7, dtype),
        cone_regularization=jnp.asarray(25.0, dtype),
        cone_mu=jnp.asarray(0.1, dtype),
        cone_delta=jnp.asarray(5.0, dtype),
        swing_weight=jnp.asarray(20.0, dtype),
        position_error_gain=jnp.asarray(20.0, dtype),
        xy_position_gain=jnp.asarray(3.0, dtype),
        stance_z_ref=jnp.asarray(0.02, dtype),
        pos_limit_mu=jnp.asarray(1.0, dtype),
        pos_limit_delta=jnp.asarray(0.1, dtype),
        vel_limit_mu=jnp.asarray(1.0, dtype),
        vel_limit_delta=jnp.asarray(0.1, dtype),
        force_limit_mu=jnp.asarray(0.1, dtype),
        force_limit_delta=jnp.asarray(1.0, dtype),
        force_z_max=jnp.asarray(350.0, dtype),
        joint_lower=model.joint_lower.astype(dtype),
        joint_upper=model.joint_upper.astype(dtype),
        joint_vel_limit=model.joint_vel_limit.astype(dtype),
    )


def make_input_cost(model: RobotModel, params: OcpParams, q_nominal: jnp.ndarray) -> OcpParams:
    """initializeInputCostWeight (LeggedInterface.cpp:263-290): map the
    task-space R (12 force + 12 foot-velocity-relative-to-base weights,
    task.info:219-253) into joint space via the foot Jacobian at the nominal
    configuration."""
    dtype = params.Q.dtype
    nj = model.nj
    kin = fk(model, q_nominal)
    J = contact_jacobians(model, kin)          # (4,6,nv)
    # stack linear rows of the two *toe* frames' 6D jacobians as in the
    # reference (numThreeDofContacts entries of 3 rows each)
    base2feet = jnp.concatenate([J[i, 0:3, 6:] for i in range(NUM_FEET)], axis=0)  # (12, nj)
    r_force = jnp.asarray(np.diag(np.full(12, 1e-3 * 5.0)), dtype)
    r_eevel = jnp.asarray(np.diag(np.full(12, 1e-3 * 2000.0)), dtype)
    r_joint = base2feet.T @ r_eevel @ base2feet
    R = jnp.zeros((12 + nj, 12 + nj), dtype)
    R = R.at[0:12, 0:12].set(r_force)
    R = R.at[12:, 12:].set(r_joint)
    return params._replace(R=R)


def weight_compensating_input(model: RobotModel, contact_flags, nu, dtype):
    """utils.h:73-93 — distribute m g over stance feet z-forces."""
    n_stance = jnp.maximum(contact_flags.sum(), 1.0)
    fz = model.total_mass * GRAVITY / n_stance
    u = jnp.zeros(nu, dtype)
    forces = jnp.zeros((NUM_FEET, 3), dtype).at[:, 2].set(fz * contact_flags)
    return u.at[0 : 3 * NUM_FEET].set(forces.reshape(-1))


# ---------------------------------------------------------------------------
# equality constraints (projected in the solver)
# ---------------------------------------------------------------------------

def eq_constraints(model: RobotModel, params: OcpParams, x, u, contact_flags,
                   foot_pos_ref, foot_vel_ref):
    """(g (16,), mask (16,)) per-knot equality constraints.

    Per foot i (4 rows):
        rows 0:3  stance -> v_foot + [0,0,g_z*(p_z - z_ref)] = 0   (zeroVelocity)
                  swing  -> f_i = 0                                 (zeroForce)
        row  3    swing  -> v_z - vref_z + g_n*(p_z - pref_z) = 0   (normalVelocity)
                  stance -> masked
    """
    nc, nj = NUM_FEET, model.nj
    q = state_to_q(x)
    v = state_input_to_v(model, x, u)
    kin = fk(model, q)
    p_c = contact_positions(model, kin)                       # (4,3)
    J = contact_jacobians(model, kin)                         # (4,6,nv)
    v_c = jnp.einsum("cij,j->ci", J[:, 0:3, :], v)            # (4,3)
    f = contact_forces(u, nc)                                 # (4,3)

    zero_vel = v_c + jnp.concatenate(
        [jnp.zeros((nc, 2), x.dtype),
         (params.xy_position_gain * (p_c[:, 2] - params.stance_z_ref))[:, None]],
        axis=1,
    )  # (4,3)
    normal_vel = (
        v_c[:, 2] - foot_vel_ref[:, 2]
        + params.position_error_gain * (p_c[:, 2] - foot_pos_ref[:, 2])
    )  # (4,)

    flag = contact_flags[:, None]
    rows03 = jnp.where(flag > 0.5, zero_vel, f)               # (4,3)
    row3 = jnp.where(contact_flags > 0.5, 0.0, normal_vel)    # (4,)
    g = jnp.concatenate([rows03, row3[:, None]], axis=1).reshape(-1)  # (16,)
    mask = jnp.concatenate(
        [jnp.ones((nc, 3), x.dtype), jnp.where(contact_flags > 0.5, 0.0, 1.0)[:, None]],
        axis=1,
    ).reshape(-1)
    return g, mask


# ---------------------------------------------------------------------------
# soft constraint rows + penalties
# ---------------------------------------------------------------------------

def _soft_rows(model: RobotModel, params: OcpParams, x, u, foot_pos_ref, foot_vel_ref):
    """All soft-constraint row values h (36,) for GGN."""
    nc, nj = NUM_FEET, model.nj
    f = contact_forces(u, nc)
    cone = params.friction_coeff * f[:, 2] - jnp.sqrt(
        f[:, 0] ** 2 + f[:, 1] ** 2 + params.cone_regularization
    )  # (4,)

    q = state_to_q(x)
    v = state_input_to_v(model, x, u)
    kin = fk(model, q)
    p_c = contact_positions(model, kin)
    J = contact_jacobians(model, kin)
    v_c = jnp.einsum("cij,j->ci", J[:, 0:3, :], v)
    xy = (
        v_c[:, 0:2] - foot_vel_ref[:, 0:2]
        + params.xy_position_gain * (p_c[:, 0:2] - foot_pos_ref[:, 0:2])
    ).reshape(-1)  # (8,)

    qj = x[12 : 12 + nj]
    vj = joint_velocities(u, nj)
    fz = f[:, 2]
    return jnp.concatenate([cone, xy, qj, vj, fz])  # 4+8+nj+nj+4


def _soft_penalty_terms(model, params: OcpParams, h, contact_flags):
    """(p, dp, d2p, mask) for each soft row given row values h."""
    nj = model.nj
    i0, i1, i2, i3 = 4, 12, 12 + nj, 12 + 2 * nj

    p_cone, d_cone, dd_cone = penalties.relaxed_barrier(
        h[0:i0], params.cone_mu, params.cone_delta
    )
    p_xy, d_xy, dd_xy = penalties.quadratic(h[i0:i1], params.swing_weight)
    p_pos, d_pos, dd_pos = penalties.double_sided_relaxed_barrier(
        h[i1:i2], params.joint_lower, params.joint_upper,
        params.pos_limit_mu, params.pos_limit_delta,
    )
    p_vel, d_vel, dd_vel = penalties.double_sided_relaxed_barrier(
        h[i2:i3], -params.joint_vel_limit, params.joint_vel_limit,
        params.vel_limit_mu, params.vel_limit_delta,
    )
    p_f, d_f, dd_f = penalties.double_sided_relaxed_barrier(
        h[i3:], 0.0, params.force_z_max, params.force_limit_mu, params.force_limit_delta
    )

    p = jnp.concatenate([p_cone, p_xy, p_pos, p_vel, p_f])
    dp = jnp.concatenate([d_cone, d_xy, d_pos, d_vel, d_f])
    d2p = jnp.concatenate([dd_cone, dd_xy, dd_pos, dd_vel, dd_f])

    swing = 1.0 - contact_flags
    mask = jnp.concatenate(
        [
            contact_flags,                      # cone: stance only
            jnp.repeat(swing, 2),               # xy: swing only
            jnp.ones(2 * nj, h.dtype),          # limits always
            jnp.ones(4, h.dtype),               # force z always
        ]
    )
    return p, dp, d2p, mask


# ---------------------------------------------------------------------------
# stage cost: value + Gauss-Newton quadratic
# ---------------------------------------------------------------------------

def stage_cost_value(model: RobotModel, params: OcpParams, x, u, x_nom,
                     contact_flags, foot_pos_ref, foot_vel_ref):
    """Scalar stage cost (for line-search merit)."""
    nu = u.shape[0]
    u_nom = weight_compensating_input(model, contact_flags, nu, x.dtype)
    dx = x - x_nom
    du = u - u_nom
    base = 0.5 * dx @ params.Q @ dx + 0.5 * du @ params.R @ du
    h = _soft_rows(model, params, x, u, foot_pos_ref, foot_vel_ref)
    p, _, _, mask = _soft_penalty_terms(model, params, h, contact_flags)
    return base + jnp.sum(mask * p)


def stage_quadratic(model: RobotModel, params: OcpParams, x, u, x_nom,
                    contact_flags, foot_pos_ref, foot_vel_ref):
    """Gauss-Newton quadratic model of the stage cost:
        (cost, qx, qu, Qxx, Quu, Qux)
    Penalty Hessians use p'' J^T J (PSD; OCS2's Gauss-Newton choice)."""
    h = _soft_rows(model, params, x, u, foot_pos_ref, foot_vel_ref)
    Jx, Ju = jax.jacfwd(
        lambda x_, u_: _soft_rows(model, params, x_, u_, foot_pos_ref, foot_vel_ref),
        argnums=(0, 1),
    )(x, u)
    return _assemble_quadratic(model, params, x, u, x_nom, contact_flags, h, Jx, Ju)


def _assemble_quadratic(model, params: OcpParams, x, u, x_nom, contact_flags,
                        h, Jx, Ju):
    nu = u.shape[0]
    u_nom = weight_compensating_input(model, contact_flags, nu, x.dtype)
    dx = x - x_nom
    du = u - u_nom
    p, dp, d2p, mask = _soft_penalty_terms(model, params, h, contact_flags)
    w1 = mask * dp
    w2 = mask * d2p

    cost = 0.5 * dx @ params.Q @ dx + 0.5 * du @ params.R @ du + jnp.sum(mask * p)
    qx = params.Q @ dx + Jx.T @ w1
    qu = params.R @ du + Ju.T @ w1
    Qxx = params.Q + jnp.einsum("ri,r,rj->ij", Jx, w2, Jx)
    Quu = params.R + jnp.einsum("ri,r,rj->ij", Ju, w2, Ju)
    Qux = jnp.einsum("ri,r,rj->ij", Ju, w2, Jx)
    return cost, qx, qu, Qxx, Quu, Qux


# ---------------------------------------------------------------------------
# fused per-knot evaluation: flow map + equality rows + soft rows share one
# FK/CMM graph and are differentiated in a single jacfwd pass (the hot path
# of the SQP linearization)
# ---------------------------------------------------------------------------

N_SOFT = None  # computed per model in combined_rows


def combined_rows(model: RobotModel, params: OcpParams, x, u, contact_flags,
                  foot_pos_ref, foot_vel_ref):
    """(flow (nx,), g_eq (16,) masked, eq_mask (16,), soft_h (4+8+2nj+4,))
    with all kinematic subexpressions shared."""
    from ..models.centroidal import (
        base_velocity_from_momentum,
        com_position,
    )

    nc, nj = NUM_FEET, model.nj
    q = state_to_q(x)
    kin = fk(model, q)
    forces = contact_forces(u, nc)
    vj = joint_velocities(u, nj)
    p_com = com_position(model, kin)
    p_c = contact_positions(model, kin)
    J = contact_jacobians(model, kin)

    vb = base_velocity_from_momentum(model, kin, x[0:6], vj)
    v = jnp.concatenate([vb, vj])
    v_c = jnp.einsum("cij,j->ci", J[:, 0:3, :], v)

    # flow map
    m = model.total_mass
    hdot_lin = forces.sum(0) / m + jnp.array([0.0, 0.0, -GRAVITY], dtype=x.dtype)
    hdot_ang = jnp.cross(p_c - p_com[None, :], forces).sum(0) / m
    flow = jnp.concatenate([hdot_lin, hdot_ang, vb, vj])

    # equality rows (see eq_constraints)
    zero_vel = v_c + jnp.concatenate(
        [jnp.zeros((nc, 2), x.dtype),
         (params.xy_position_gain * (p_c[:, 2] - params.stance_z_ref))[:, None]],
        axis=1,
    )
    normal_vel = (
        v_c[:, 2] - foot_vel_ref[:, 2]
        + params.position_error_gain * (p_c[:, 2] - foot_pos_ref[:, 2])
    )
    flag = contact_flags[:, None]
    rows03 = jnp.where(flag > 0.5, zero_vel, forces)
    row3 = jnp.where(contact_flags > 0.5, 0.0, normal_vel)
    g = jnp.concatenate([rows03, row3[:, None]], axis=1).reshape(-1)
    eq_mask = jnp.concatenate(
        [jnp.ones((nc, 3), x.dtype), jnp.where(contact_flags > 0.5, 0.0, 1.0)[:, None]],
        axis=1,
    ).reshape(-1)

    # soft rows (see _soft_rows)
    cone = params.friction_coeff * forces[:, 2] - jnp.sqrt(
        forces[:, 0] ** 2 + forces[:, 1] ** 2 + params.cone_regularization
    )
    xy = (
        v_c[:, 0:2] - foot_vel_ref[:, 0:2]
        + params.xy_position_gain * (p_c[:, 0:2] - foot_pos_ref[:, 0:2])
    ).reshape(-1)
    soft = jnp.concatenate([cone, xy, x[12:12 + nj], vj, forces[:, 2]])
    return flow, g * eq_mask, eq_mask, soft


def stage_merit_fused(model: RobotModel, params: OcpParams, x, u, x_nom,
                      contact_flags, foot_pos_ref, foot_vel_ref, dt):
    """(stage cost, RK2 next state, masked eq residual) in ONE shared
    kinematics pass plus the unavoidable second flow evaluation of RK2 —
    the line-search merit hot path (2 FK passes per knot instead of the 4
    a naive stage_cost_value + rk2_step + eq_constraints composition costs)."""
    from ..models.centroidal import flow_map as _fm

    nu = u.shape[0]
    flow, g_masked, _, soft = combined_rows(
        model, params, x, u, contact_flags, foot_pos_ref, foot_vel_ref
    )
    u_nom = weight_compensating_input(model, contact_flags, nu, x.dtype)
    dx = x - x_nom
    du = u - u_nom
    p, _, _, mask = _soft_penalty_terms(model, params, soft, contact_flags)
    cost = 0.5 * dx @ params.Q @ dx + 0.5 * du @ params.R @ du + jnp.sum(mask * p)

    k2 = _fm(model, x + dt * flow, u)
    xnext = x + 0.5 * dt * (flow + k2)
    return cost, xnext, g_masked


def _soft_penalty_terms_last(model, params: OcpParams, h, contact_flags):
    """Axis-last variant of _soft_penalty_terms: h (..., ns),
    contact_flags (..., nc) -> (p, dp, d2p, mask) each (..., ns)."""
    nj = model.nj
    i0, i1, i2, i3 = 4, 12, 12 + nj, 12 + 2 * nj

    p_cone, d_cone, dd_cone = penalties.relaxed_barrier(
        h[..., 0:i0], params.cone_mu, params.cone_delta
    )
    p_xy, d_xy, dd_xy = penalties.quadratic(h[..., i0:i1], params.swing_weight)
    p_pos, d_pos, dd_pos = penalties.double_sided_relaxed_barrier(
        h[..., i1:i2], params.joint_lower, params.joint_upper,
        params.pos_limit_mu, params.pos_limit_delta,
    )
    p_vel, d_vel, dd_vel = penalties.double_sided_relaxed_barrier(
        h[..., i2:i3], -params.joint_vel_limit, params.joint_vel_limit,
        params.vel_limit_mu, params.vel_limit_delta,
    )
    p_f, d_f, dd_f = penalties.double_sided_relaxed_barrier(
        h[..., i3:], 0.0, params.force_z_max, params.force_limit_mu,
        params.force_limit_delta,
    )
    cat = lambda *ts: jnp.concatenate(ts, axis=-1)
    p = cat(p_cone, p_xy, p_pos, p_vel, p_f)
    dp = cat(d_cone, d_xy, d_pos, d_vel, d_f)
    d2p = cat(dd_cone, dd_xy, dd_pos, dd_vel, dd_f)
    swing = 1.0 - contact_flags
    ones = jnp.ones_like(h[..., 0:1])
    mask = cat(contact_flags, jnp.repeat(swing, 2, axis=-1),
               jnp.broadcast_to(ones, h[..., : 2 * nj].shape),
               jnp.broadcast_to(ones, h[..., :4].shape))
    return p, dp, d2p, mask


def weight_compensating_input_batch(model: RobotModel, contact_flags, nu):
    """Axis-last batched utils.h:73-93: contact_flags (..., nc) -> (..., nu)."""
    n_stance = jnp.maximum(contact_flags.sum(-1, keepdims=True), 1.0)
    fz = model.total_mass * GRAVITY / n_stance * contact_flags     # (..., nc)
    zero = jnp.zeros_like(fz)
    forces = jnp.stack([zero, zero, fz], axis=-1).reshape(*fz.shape[:-1], -1)
    rest = jnp.zeros((*fz.shape[:-1], nu - 3 * NUM_FEET), fz.dtype)
    return jnp.concatenate([forces, rest], axis=-1)


def stage_merit_batch(model: RobotModel, params: OcpParams, xs, us, x_nom,
                      contact_flags, foot_pos_ref, foot_vel_ref, dt):
    """Batch-polymorphic stage_merit_fused over any leading axes, on the
    scalarized SoA core (models/soa.py): the line-search merit hot path runs
    as full-width elementwise vector ops instead of padded (3,)/(3,3) tiles.
    Oracle-tested against stage_merit_fused."""
    from ..models import soa

    flow, g_masked, _, soft = soa.combined_rows_arrays(
        model, params, xs, us, contact_flags, foot_pos_ref, foot_vel_ref
    )
    nu = us.shape[-1]
    u_nom = weight_compensating_input_batch(model, contact_flags, nu)
    dx = xs - x_nom
    du = us - u_nom
    p, _, _, mask = _soft_penalty_terms_last(model, params, soft, contact_flags)
    cost = (
        0.5 * jnp.einsum("...i,ij,...j->...", dx, params.Q, dx)
        + 0.5 * jnp.einsum("...i,ij,...j->...", du, params.R, du)
        + jnp.sum(mask * p, axis=-1)
    )
    k2 = soa.flow_arrays(model, xs + dt * flow, us)
    xnext = xs + 0.5 * dt * (flow + k2)
    return cost, xnext, g_masked


def knot_linearization_batch(model: RobotModel, params: OcpParams, xs, us,
                             x_nom, flags, fpr, fvr, dt):
    """Batch-polymorphic knot_linearization_fused on the scalarized SoA core
    (models/soa.py): the FK/CMM/dual chain runs as full-width elementwise
    vector ops over ANY leading batch axes (scenario x knot), with only the
    dense 22-dim algebra (RK2 sensitivity, GGN quadratics) left to batched
    MXU matmuls.  Same outputs as vmapped knot_linearization_fused;
    oracle-tested against knot_linearization_fused_ad."""
    from ..models import soa

    ing = soa.linearization_arrays(model, params, xs, us, flags, fpr, fvr)
    S = xs.shape[:-1]
    nx = xs.shape[-1]
    nu = us.shape[-1]
    nc, nj = NUM_FEET, model.nj
    nq = nx - 6
    dtype = xs.dtype
    m = float(model.total_mass)

    def z(*sh):
        return jnp.zeros(S + sh, dtype)

    def bcast(a, *sh):
        return jnp.broadcast_to(jnp.asarray(a, dtype), S + sh)

    flow0, g0 = ing["flow0"], ing["g0"]
    eq_mask, soft0 = ing["eq_mask"], ing["soft0"]
    Vh, Vv, dvb = ing["Vh"], ing["Vv"], ing["dvb"]
    Jc, Jcdot = ing["Jc"], ing["Jcdot"]
    p_c, p_com = ing["p_c"], ing["p_com"]
    forces = us[..., : 3 * nc].reshape(*S, nc, 3)

    H = jnp.einsum("...cij,...jk->...cik", Jc[..., 0:6], Vh)       # (...,nc,3,6)
    W = jnp.einsum("...cij,...jk->...cik", Jc[..., 0:6], Vv) + Jc[..., 6:]
    dvc = Jcdot + jnp.einsum("...cij,...jk->...cik", Jc[..., 0:6], dvb)

    # Jcom = dp_com/dq: [I | A12/m-block is inside dvb path; rebuild from Jc
    # is wrong] — use the weighted CMM linear rows via the identity
    # A_lin = m Jcom; its pos block is I and the rest comes with the
    # ingredients through dvb?  Cheaper: hdot_ang derivative directly:
    # d/dq sum_i (p_ci - p_com) x f_i = -sum_i skew(f_i) (Jc_i - Jcom).
    # sum_i skew(f_i) Jcom = skew(sum f) Jcom; Jcom = A_lin/m with
    # A_lin cols assembled in the SoA pass — exported as ing["Jcom"].
    Jcom = ing["Jcom"]                                              # (...,3,nq)

    def skew_b(v):
        zz = jnp.zeros_like(v[..., 0])
        return jnp.stack([
            jnp.stack([zz, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], zz, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], zz], axis=-1),
        ], axis=-2)

    dhdot_ang = -jnp.einsum(
        "...cab,...cbv->...av", skew_b(forces), Jc - Jcom[..., None, :, :]
    ) / m                                                           # (...,3,nq)

    # ---- q-column blocks ----
    gxy = params.xy_position_gain
    gn = params.position_error_gain
    stance3 = (flags > 0.5)[..., None, None]                        # (...,nc,1,1)
    swing1 = (flags < 0.5)[..., None]                               # (...,nc,1)
    zv_q = dvc + jnp.concatenate(
        [z(nc, 2, nq), gxy * Jc[..., 2:3, :]], axis=-2)
    nvel_q = dvc[..., 2, :] + gn * Jc[..., 2, :]                    # (...,nc,nq)
    Jq_eq = jnp.concatenate(
        [jnp.where(stance3, zv_q, 0.0),
         jnp.where(swing1, nvel_q, 0.0)[..., None, :]], axis=-2
    ).reshape(*S, N_EQ, nq)
    xy_q = (dvc[..., 0:2, :] + gxy * Jc[..., 0:2, :]).reshape(*S, 2 * nc, nq)
    qj_q = bcast(np.concatenate([np.zeros((nj, 6)), np.eye(nj)], axis=1), nj, nq)
    Jq_soft = jnp.concatenate(
        [z(nc, nq), xy_q, qj_q, z(nj, nq), z(nc, nq)], axis=-2)
    Jq_flow = jnp.concatenate(
        [z(3, nq), dhdot_ang, dvb, z(nj, nq)], axis=-2)

    # ---- h-column blocks ----
    flow_h = jnp.concatenate([z(6, 6), Vh, z(nj, 6)], axis=-2)
    eq_h = jnp.concatenate(
        [jnp.where(stance3, H, 0.0),
         jnp.where(swing1, H[..., 2, :], 0.0)[..., None, :]], axis=-2
    ).reshape(*S, N_EQ, 6)
    soft_h = jnp.concatenate(
        [z(nc, 6), H[..., 0:2, :].reshape(*S, 2 * nc, 6), z(2 * nj + nc, 6)],
        axis=-2)

    Jx_f = jnp.concatenate([flow_h, Jq_flow], axis=-1)              # (...,nx,nx)
    C = jnp.concatenate([eq_h, Jq_eq], axis=-1)                     # (...,16,nx)
    Jsoft_x = jnp.concatenate([soft_h, Jq_soft], axis=-1)

    # ---- u-column blocks (same structure as knot_linearization_fused) ----
    dang = jnp.moveaxis(skew_b(p_c - p_com[..., None, :]), -3, -2).reshape(
        *S, 3, 3 * nc) / m
    flow_f = jnp.concatenate(
        [bcast(np.tile(np.eye(3) / m, (1, nc)), 3, 3 * nc), dang,
         z(6 + nj, 3 * nc)], axis=-2)
    flow_vj = jnp.concatenate(
        [z(6, nj), Vv, bcast(np.eye(nj), nj, nj)], axis=-2)
    flow_u = jnp.concatenate([flow_f, flow_vj], axis=-1)

    sel_f = np.einsum("ci,jk->cjik", np.eye(nc), np.eye(3)).reshape(nc, 3, 3 * nc)
    eq03_f = jnp.where(stance3, 0.0, bcast(sel_f, nc, 3, 3 * nc))
    eq_f = jnp.concatenate([eq03_f, z(nc, 1, 3 * nc)], axis=-2).reshape(
        *S, N_EQ, 3 * nc)
    eq03_vj = jnp.where(stance3, W, 0.0)
    eq3_vj = jnp.where(swing1, W[..., 2, :], 0.0)
    eq_vj = jnp.concatenate([eq03_vj, eq3_vj[..., None, :]], axis=-2).reshape(
        *S, N_EQ, nj)
    eq_u = jnp.concatenate([eq_f, eq_vj], axis=-1)

    s_cone = jnp.sqrt(forces[..., 0] ** 2 + forces[..., 1] ** 2
                      + params.cone_regularization)                 # (...,nc)
    cone_df = jnp.stack(
        [-forces[..., 0] / s_cone, -forces[..., 1] / s_cone,
         jnp.broadcast_to(params.friction_coeff, s_cone.shape).astype(dtype)],
        axis=-1)                                                    # (...,nc,3)
    cone_f = (cone_df[..., None, :] * jnp.eye(nc, dtype=dtype)[:, :, None]
              ).reshape(*S, nc, 3 * nc)
    fz_sel = (np.eye(nc)[:, :, None] * np.array([0.0, 0.0, 1.0])).reshape(
        nc, 3 * nc)
    soft_f = jnp.concatenate(
        [cone_f, z(2 * nc + 2 * nj, 3 * nc), bcast(fz_sel, nc, 3 * nc)],
        axis=-2)
    soft_vj = jnp.concatenate(
        [z(nc, nj), W[..., 0:2, :].reshape(*S, 2 * nc, nj), z(nj, nj),
         bcast(np.eye(nj), nj, nj), z(nc, nj)], axis=-2)
    soft_u = jnp.concatenate([soft_f, soft_vj], axis=-1)

    # ---- dense tail: RK2 sensitivity + exact RK2 primal + GGN quadratic ----
    eye_nx = jnp.eye(nx, dtype=dtype)
    A = eye_nx + dt * Jx_f + (0.5 * dt * dt) * jnp.einsum(
        "...ij,...jk->...ik", Jx_f, Jx_f)
    B = dt * flow_u + (0.5 * dt * dt) * jnp.einsum(
        "...ij,...jk->...ik", Jx_f, flow_u)

    k2 = soa.flow_arrays(model, xs + dt * flow0, us)
    xnext = xs + 0.5 * dt * (flow0 + k2)

    u_nom = weight_compensating_input_batch(model, flags, nu)
    dx = xs - x_nom
    du = us - u_nom
    p, dp, d2p, mask = _soft_penalty_terms_last(model, params, soft0, flags)
    w1 = mask * dp
    w2 = mask * d2p
    cost = (0.5 * jnp.einsum("...i,ij,...j->...", dx, params.Q, dx)
            + 0.5 * jnp.einsum("...i,ij,...j->...", du, params.R, du)
            + jnp.sum(mask * p, axis=-1))
    qx = jnp.einsum("...i,ij->...j", dx, params.Q) + jnp.einsum(
        "...ri,...r->...i", Jsoft_x, w1)
    qu = jnp.einsum("...i,ij->...j", du, params.R) + jnp.einsum(
        "...ri,...r->...i", soft_u, w1)
    Qxx = params.Q + jnp.einsum("...ri,...r,...rj->...ij", Jsoft_x, w2, Jsoft_x)
    Quu = params.R + jnp.einsum("...ri,...r,...rj->...ij", soft_u, w2, soft_u)
    Qux = jnp.einsum("...ri,...r,...rj->...ij", soft_u, w2, Jsoft_x)

    return xnext, A, B, cost, qx, qu, Qxx, Quu, Qux, g0, C, eq_u, eq_mask


def knot_linearization_fused_ad(model: RobotModel, params: OcpParams, x, u, x_nom,
                                contact_flags, foot_pos_ref, foot_vel_ref, dt):
    """Pure-AD oracle for `knot_linearization_fused`: one jacfwd over the
    full (x, u) input (nx+nu tangents).  Kept as the ground truth the
    structured fast path is unit-tested against."""
    nx = x.shape[0]
    nu = u.shape[0]

    def rows_fn(xu):
        flow, g, _, soft = combined_rows(
            model, params, xu[:nx], xu[nx:], contact_flags, foot_pos_ref, foot_vel_ref
        )
        return jnp.concatenate([flow, g, soft])

    xu = jnp.concatenate([x, u])
    flow0, g0, eq_mask, soft0 = combined_rows(
        model, params, x, u, contact_flags, foot_pos_ref, foot_vel_ref
    )
    Jall = jax.jacfwd(rows_fn)(xu)   # (nx+16+ns, nx+nu)
    Jflow = Jall[:nx]
    Jeq = Jall[nx:nx + N_EQ]
    Jsoft = Jall[nx + N_EQ:]

    return _finish_linearization(
        model, params, x, u, x_nom, contact_flags, dt,
        flow0, g0, eq_mask, soft0,
        Jflow[:, :nx], Jflow[:, nx:], Jeq[:, :nx], Jeq[:, nx:],
        Jsoft[:, :nx], Jsoft[:, nx:],
    )


def _finish_linearization(model, params, x, u, x_nom, contact_flags, dt,
                          flow0, g0, eq_mask, soft0,
                          Jx_f, Ju_f, C, D, Jsoft_x, Jsoft_u):
    """Shared tail: RK2 sensitivities + GGN quadratic.

    The RK2 sensitivity uses the frozen-Jacobian expansion
        A = I + dt Jx + dt^2/2 Jx^2,  B = dt Ju + dt^2/2 Jx Ju
    which matches the exact RK2 derivative to O(dt^2 ||dJ/dx||) — an inexact
    Newton step; the line-search merit uses the exact nonlinear defects, so
    convergence is preserved (standard multiple-shooting practice)."""
    nx = x.shape[0]
    A = (jnp.eye(nx, dtype=x.dtype) + dt * Jx_f
         + (0.5 * dt * dt) * (Jx_f @ Jx_f))
    B = dt * Ju_f + (0.5 * dt * dt) * (Jx_f @ Ju_f)

    # exact RK2 primal for the defect
    k1 = flow0
    from ..models.centroidal import flow_map as _fm
    k2 = _fm(model, x + dt * k1, u)
    xnext = x + 0.5 * dt * (k1 + k2)

    cost, qx, qu, Qxx, Quu, Qux = _assemble_quadratic(
        model, params, x, u, x_nom, contact_flags, soft0, Jsoft_x, Jsoft_u,
    )
    return xnext, A, B, cost, qx, qu, Qxx, Quu, Qux, g0, C, D, eq_mask


def knot_linearization_fused(model: RobotModel, params: OcpParams, x, u, x_nom,
                             contact_flags, foot_pos_ref, foot_vel_ref, dt):
    """Everything the SQP needs at one knot — the solver hot path.

    Structure-exploiting linearization — NO AD tangent fan-out at all.
    Every row of (flow, eq, soft) is *linear* in the normalized momentum
    h = x[0:6] and in the input u = [forces(12), vj(nj)] once the
    configuration q = x[6:] is fixed (the friction cone is the one
    u-nonlinearity, and it is closed-form), so the h/u Jacobian columns are
    assembled analytically from quantities of the same kinematics pass:

        vb = Ab(q)^-1 (m h - Aj(q) vj)   =>  dvb/dh = m Ab^-1 =: Vh,
                                             dvb/dvj = -Ab^-1 Aj =: Vv
        v_ci = J_i(q) [vb; vj]           =>  dv_ci/dh = J_i[:,:6] Vh =: H_i,
                                             dv_ci/dvj = J_i[:,:6] Vv + J_i[:,6:] =: W_i
        hdot_ang: d/df_i = skew(p_ci - p_com)/m;  cone: d/df analytic.

    The remaining q-columns (base euler + joints) are closed-form too —
    see the inline derivation below — so the whole 74x44 Jacobian costs
    roughly one extra kinematics tangent instead of the 44 (or even 13)
    a jacfwd pass needs.  This replaces the reference's CppAD codegen
    Jacobians (LeggedRobotDynamicsAD.cpp:46-74) at a fraction of the AD
    cost.  Exactness oracle: ``knot_linearization_fused_ad``."""
    from ..models.spatial import skew

    nx = x.shape[0]
    nu = u.shape[0]
    nc, nj = NUM_FEET, model.nj
    nq = nx - 6
    dtype = x.dtype
    h = x[0:6]
    q = x[6:]
    forces = contact_forces(u, nc)
    vj = joint_velocities(u, nj)

    # ---- primal + analytic-column ingredients (one kinematics pass) ----
    kin = fk(model, q)
    from ..models.centroidal import (
        base_block_solve,
        centroidal_momentum_matrix,
        com_position,
    )

    p_com = com_position(model, kin)
    p_c = contact_positions(model, kin)
    J = contact_jacobians(model, kin)
    Jlin = J[:, 0:3, :]                    # (nc, 3, 6+nj)
    Acmm = centroidal_momentum_matrix(model, kin)
    Ab, Aj = Acmm[:, 0:6], Acmm[:, 6:]
    m = model.total_mass
    rhs = jnp.concatenate(
        [(m * h - Aj @ vj)[:, None], m * jnp.eye(6, dtype=dtype), -Aj], axis=1
    )
    sol6 = base_block_solve(model, Ab, rhs)  # block-triangular, one 3x3 inv3
    vb = sol6[:, 0]
    Vh = sol6[:, 1:7]                      # (6, 6)
    Vv = sol6[:, 7:]                       # (6, nj)
    v = jnp.concatenate([vb, vj])
    v_c = jnp.einsum("cij,j->ci", Jlin, v)

    H = jnp.einsum("cik,kl->cil", Jlin[:, :, 0:6], Vh)                  # (nc,3,6)
    W = jnp.einsum("cik,kl->cil", Jlin[:, :, 0:6], Vv) + Jlin[:, :, 6:]  # (nc,3,nj)

    # ---- primal row values (mirrors combined_rows exactly) ----
    hdot_lin = forces.sum(0) / m + jnp.array([0.0, 0.0, -GRAVITY], dtype=dtype)
    hdot_ang = jnp.cross(p_c - p_com[None, :], forces).sum(0) / m
    flow0 = jnp.concatenate([hdot_lin, hdot_ang, vb, vj])

    zero_vel = v_c + jnp.concatenate(
        [jnp.zeros((nc, 2), dtype),
         (params.xy_position_gain * (p_c[:, 2] - params.stance_z_ref))[:, None]],
        axis=1,
    )
    normal_vel = (
        v_c[:, 2] - foot_vel_ref[:, 2]
        + params.position_error_gain * (p_c[:, 2] - foot_pos_ref[:, 2])
    )
    flag = contact_flags[:, None]
    rows03 = jnp.where(flag > 0.5, zero_vel, forces)
    row3 = jnp.where(contact_flags > 0.5, 0.0, normal_vel)
    eq_mask = jnp.concatenate(
        [jnp.ones((nc, 3), dtype), jnp.where(contact_flags > 0.5, 0.0, 1.0)[:, None]],
        axis=1,
    ).reshape(-1)
    g0 = jnp.concatenate([rows03, row3[:, None]], axis=1).reshape(-1) * eq_mask

    s_cone = jnp.sqrt(forces[:, 0] ** 2 + forces[:, 1] ** 2 + params.cone_regularization)
    cone = params.friction_coeff * forces[:, 2] - s_cone
    xy = (
        v_c[:, 0:2] - foot_vel_ref[:, 0:2]
        + params.xy_position_gain * (p_c[:, 0:2] - foot_pos_ref[:, 0:2])
    ).reshape(-1)
    soft0 = jnp.concatenate([cone, xy, x[12:12 + nj], vj, forces[:, 2]])

    # ---- analytic h (6) and u (nu) Jacobian columns ----
    eyeC = jnp.eye(nc, dtype=dtype)
    eye3 = jnp.eye(3, dtype=dtype)

    # flow rows: [hdot_lin(3); hdot_ang(3); vb(6); vj(nj)]
    flow_h = jnp.concatenate(
        [jnp.zeros((6, 6), dtype), Vh, jnp.zeros((nj, 6), dtype)], axis=0
    )
    dang_df = jnp.concatenate(
        [skew(p_c[i] - p_com) / m for i in range(nc)], axis=1
    )  # (3, 3*nc)
    flow_f = jnp.concatenate(
        [jnp.tile(eye3 / m, (1, nc)), dang_df,
         jnp.zeros((6 + nj, 3 * nc), dtype)], axis=0
    )
    flow_vj = jnp.concatenate(
        [jnp.zeros((6, nj), dtype), Vv, jnp.eye(nj, dtype=dtype)], axis=0
    )
    flow_u = jnp.concatenate([flow_f, flow_vj], axis=1)

    # eq rows (per foot: 3 + 1), where-selected like the primal values
    sel_f = jnp.einsum("ci,jk->cjik", eyeC, eye3).reshape(nc, 3, 3 * nc)  # foot force selectors
    stance3 = flag[:, :, None] > 0.5                                      # (nc,3,1) broadcast
    eq03_h = jnp.where(stance3, H, 0.0)                                   # (nc,3,6)
    eq03_f = jnp.where(stance3, 0.0, sel_f)                               # (nc,3,3nc)
    eq03_vj = jnp.where(stance3, W, 0.0)                                  # (nc,3,nj)
    swing1 = (contact_flags < 0.5)[:, None]
    eq3_h = jnp.where(swing1, H[:, 2, :], 0.0)                            # (nc,6)
    eq3_vj = jnp.where(swing1, W[:, 2, :], 0.0)                           # (nc,nj)
    eq_h = jnp.concatenate([eq03_h, eq3_h[:, None, :]], axis=1).reshape(N_EQ, 6)
    eq_f = jnp.concatenate(
        [eq03_f, jnp.zeros((nc, 1, 3 * nc), dtype)], axis=1
    ).reshape(N_EQ, 3 * nc)
    eq_vj = jnp.concatenate([eq03_vj, eq3_vj[:, None, :]], axis=1).reshape(N_EQ, nj)
    eq_u = jnp.concatenate([eq_f, eq_vj], axis=1)

    # soft rows: [cone(nc); xy(2nc); qj(nj); vj(nj); fz(nc)]
    cone_df = jnp.stack(
        [-forces[:, 0] / s_cone, -forces[:, 1] / s_cone,
         jnp.broadcast_to(params.friction_coeff, (nc,)).astype(dtype)], axis=1
    )  # (nc,3) d cone_i / d f_i
    # (nc, 3nc): row i carries cone_df[i] in its own foot's force block
    cone_f = (cone_df[:, None, :] * eyeC[:, :, None]).reshape(nc, 3 * nc)
    ns = soft0.shape[0]
    soft_h = jnp.concatenate(
        [jnp.zeros((nc, 6), dtype), H[:, 0:2, :].reshape(2 * nc, 6),
         jnp.zeros((2 * nj + nc, 6), dtype)], axis=0
    )
    soft_f = jnp.concatenate(
        [cone_f,
         jnp.zeros((2 * nc + 2 * nj, 3 * nc), dtype),
         (eyeC[:, :, None] * jnp.array([0.0, 0.0, 1.0], dtype)).reshape(nc, 3 * nc)],
        axis=0,
    )
    soft_vj = jnp.concatenate(
        [jnp.zeros((nc, nj), dtype), W[:, 0:2, :].reshape(2 * nc, nj),
         jnp.zeros((nj, nj), dtype), jnp.eye(nj, dtype=dtype),
         jnp.zeros((nc, nj), dtype)], axis=0
    )
    soft_u = jnp.concatenate([soft_f, soft_vj], axis=1)

    # ---- analytic base-position (3) columns ----
    gxy = params.xy_position_gain
    z_row = jnp.zeros((3, 3), dtype).at[2, 2].set(gxy)      # zero_vel z row
    eq03_pos = jnp.where(stance3, z_row[None], 0.0)          # (nc,3,3)
    eq3_pos = jnp.where(
        swing1, params.position_error_gain * jnp.array([0.0, 0.0, 1.0], dtype), 0.0
    )  # (nc,3)
    eq_pos = jnp.concatenate(
        [eq03_pos, eq3_pos[:, None, :]], axis=1
    ).reshape(N_EQ, 3)
    xy_pos = jnp.broadcast_to(
        jnp.array([[gxy, 0.0, 0.0], [0.0, gxy, 0.0]], dtype)[None], (nc, 2, 3)
    ).reshape(2 * nc, 3)
    soft_pos = jnp.concatenate(
        [jnp.zeros((nc, 3), dtype), xy_pos, jnp.zeros((2 * nj + nc, 3), dtype)],
        axis=0,
    )
    flow_pos = jnp.zeros((nx, 3), dtype)  # flow map is translation-invariant

    # ---- closed-form (euler, joint) Jacobian columns --------------------
    # Every row is velocity-level, so its q-dependence enters through world
    # positions (p_c, p_com -> primal Jacobians), through J(q) v̄ products,
    # and through A(q) v̄ inside the implicit vb solve.  Two exact identities
    # remove the AD tangent fan-out entirely:
    #
    # 1. MIXED-PARTIAL SYMMETRY.  The linear point-Jacobian rows are exact
    #    gradients of world positions in these coordinates (the euler
    #    columns -skew(p - p_b) E(θ) ARE ∂p/∂θ), so
    #        D_q[J_lin(q) v̄] = ∂²p · v̄ = d/dε J_lin(q + ε v̄)
    #    — ONE jvp along the primal generalized velocity v̄ replaces 13
    #    coordinate tangents, simultaneously for the contact points, the
    #    link CoMs, and A_lin = m ∂p_com/∂q.
    #
    # 2. ANGULAR-MOMENTUM BLOCK.  A_ang v̄ = Σ_k I_k^w ω_k + m_k r_k × v_ck
    #    is not integrable, but its q-Jacobian is closed-form in primal
    #    quantities: with ã_ki the i-th angular-Jacobian column of link k
    #    (dR_k/dq_i = skew(ã_ki) R_k),
    #        D_q[I_k^w ω_k]_i = ã_ki × h_k − I_k^w (ã_ki × ω_k)
    #                           + I_k^w ∂ω_k/∂q_i
    #    where ∂ω_k/∂q_i = a_i × (ω_k − ω_child(i)) for joint coordinates
    #    (only axes strictly below joint i rotate with it) and
    #    E_i × (ω_k − ω_base) + (∂E/∂θ_i) v̄_e for the euler coordinates.
    #
    # Then the implicit-function rule on Ab(q) vb = m h − Aj(q) vj gives
    # dvb = −Ab⁻¹ D_q[A v̄], and dv_c = D_q[J_c v̄] + J_c[:, :6] dvb.
    from ..models.spatial import euler_rate_map_zyx

    vbar = v

    def _vel_quants(q_):
        kin_ = fk(model, q_)
        return (
            centroidal_momentum_matrix(model, kin_),
            contact_jacobians(model, kin_)[:, 0:3, :],
            link_com_jacobians(model, kin_)[:, 0:3, :],
        )

    Adot, Jcdot, Jcomdot = jax.jvp(_vel_quants, (q,), (vbar,))[1]

    L = model.n_links
    Jcom_full = link_com_jacobians(model, kin)            # (L,6,nq)
    Jcomlin, Jang = Jcom_full[:, 0:3, :], Jcom_full[:, 3:6, :]
    omega = jnp.einsum("kiv,v->ki", Jang, vbar)           # (L,3)
    Iw = jnp.einsum("kij,kjl,kml->kim", kin.R, model.link_inertia, kin.R)
    hk = jnp.einsum("kij,kj->ki", Iw, omega)              # (L,3)
    vck = jnp.einsum("kiv,v->ki", Jcomlin, vbar)          # (L,3)
    A_lin = Acmm[0:3]
    Jcom_lin = A_lin / m                                  # ∂p_com/∂q
    r_com = kin.com_w - p_com[None]                       # (L,3)

    # ∂ω_k/∂q (L,3,nq): zero base-position block | euler | joints
    dE = jax.jacfwd(euler_rate_map_zyx)(q[3:6])           # (3,3,3), last = θ_i
    dEve = jnp.einsum("abi,b->ai", dE, vbar[3:6])         # (3, 3_i)
    w_e = jnp.cross(
        kin.E.T[None, :, :], (omega - omega[0][None])[:, None, :]
    ).transpose(0, 2, 1) + dEve[None]                     # (L,3,3)
    omc = omega[model.joint_child]                        # (nj,3)
    anc = jnp.asarray(model.ancestor_mask, dtype)         # (L,nj)
    w_j = (jnp.cross(kin.joint_axis_w[None, :, :],
                     omega[:, None, :] - omc[None, :, :])
           * anc[:, :, None]).transpose(0, 2, 1)          # (L,3,nj)
    w_q = jnp.concatenate([jnp.zeros((L, 3, 3), dtype), w_e, w_j], axis=2)

    # D_q[A_ang v̄] (3,nq)
    JangT = Jang.transpose(0, 2, 1)                       # (L,nq,3) = ã_ki
    t_rot = jnp.cross(JangT, hk[:, None, :]) - jnp.einsum(
        "kab,kvb->kva", Iw, jnp.cross(JangT, omega[:, None, :]))
    t_w = jnp.einsum("kab,kbv->kva", Iw, w_q)
    drv = (Jcomlin - Jcom_lin[None]).transpose(0, 2, 1)   # (L,nq,3)
    t_r = (jnp.cross(drv, vck[:, None, :])
           + jnp.cross(r_com[:, None, :], Jcomdot.transpose(0, 2, 1))
           ) * model.link_mass[:, None, None]
    dAang = (t_rot + t_w + t_r).sum(0).T                  # (3,nq)
    dAv = jnp.concatenate([Adot[0:3], dAang], axis=0)     # (6,nq) = D_q[A v̄]

    dvb = base_block_solve(model, Ab, -dAv)               # (6,nq)
    dvc = Jcdot + jnp.einsum("cik,kv->civ", Jlin[:, :, 0:6], dvb)  # (nc,3,nq)

    # flow rows: [0(3); d hdot_ang; dvb; 0(nj)]
    dhdot_ang = -jnp.einsum(
        "cab,cbv->av", _skew_batch(forces), Jlin - Jcom_lin[None]) / m
    Jq_flow = jnp.concatenate(
        [jnp.zeros((3, nq), dtype), dhdot_ang, dvb,
         jnp.zeros((nj, nq), dtype)], axis=0)

    # eq rows (where-selected like the primal; eq_mask zeros stance row3)
    zv_q = dvc + jnp.concatenate(
        [jnp.zeros((nc, 2, nq), dtype),
         params.xy_position_gain * Jlin[:, 2:3, :]], axis=1)
    nvel_q = dvc[:, 2, :] + params.position_error_gain * Jlin[:, 2, :]
    Jq_eq = jnp.concatenate(
        [jnp.where(stance3, zv_q, 0.0),
         jnp.where(swing1, nvel_q, 0.0)[:, None, :]], axis=1
    ).reshape(N_EQ, nq)

    # soft rows: [cone 0; xy; qj identity; vj 0; fz 0]
    xy_q = (dvc[:, 0:2, :]
            + params.xy_position_gain * Jlin[:, 0:2, :]).reshape(2 * nc, nq)
    qj_q = jnp.concatenate(
        [jnp.zeros((nj, 6), dtype), jnp.eye(nj, dtype=dtype)], axis=1)
    Jq_soft = jnp.concatenate(
        [jnp.zeros((nc, nq), dtype), xy_q, qj_q,
         jnp.zeros((nj + nc, nq), dtype)], axis=0)

    Jej_flow, Jej_eq, Jej_soft = Jq_flow[:, 3:], Jq_eq[:, 3:], Jq_soft[:, 3:]

    # ---- assemble full Jacobians: x = [h | pos | (euler, joints)], u ----
    Jx_f = jnp.concatenate([flow_h, flow_pos, Jej_flow], axis=1)
    C = jnp.concatenate([eq_h, eq_pos, Jej_eq], axis=1)
    Jsoft_x = jnp.concatenate([soft_h, soft_pos, Jej_soft], axis=1)

    return _finish_linearization(
        model, params, x, u, x_nom, contact_flags, dt,
        flow0, g0, eq_mask, soft0,
        Jx_f, flow_u, C, eq_u, Jsoft_x, soft_u,
    )
