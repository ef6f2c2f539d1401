"""Whole-body control: task formulation + weighted QP (batched, TPU-native).

Parity targets:
  - task formulation over 38 decision vars [accel(16), forces(12), tau(10)]:
    legged_wbc/src/WbcBase.cpp:28-413
  - single weighted QP with stacked constraints, stance-mode switch and
    last-solution fallback: legged_wbc/src/WeightedWbc.cpp:18-113
    (weights swing=100 baseAccel=1 contactForce=0, task.info:328-333)

The reference's per-mode variable-size task stacking becomes fixed-size
masked rows; qpOASES becomes the batched interior-point solver in
ops/qp.py.  One jitted function per tick; vmap for scenario batches.
(``compensateFriction`` exists in the reference but is never called —
WbcBase.cpp:340 has no call site; we expose the equivalent as an optional
post-step.)
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..models.centroidal import (
    base_kinematics_from_centroidal,
    state_to_q,
    state_input_to_v,
)
from ..models.dynamics import mass_matrix, nle
from ..models.kinematics import (
    base_jacobian,
    base_jacobian_dot,
    contact_jacobians,
    contact_jacobians_dot,
    contact_positions,
    fk,
)
from ..models.robot import RobotModel
from ..models.spatial import (
    euler_rates_from_global_angular_velocity,
    global_angular_velocity_from_euler_rates,
    rotation_zyx,
    rotation_error_in_world,
)
from ..ops.qp import solve_qp

NUM_FEET = 4
NV = 16
NF = 12
NJ = 10
NDEC = NV + NF + NJ  # 38


class WbcParams(NamedTuple):
    """task.info WBC blocks (:289-333)."""

    torque_limits: jnp.ndarray   # (5,) per-leg motor limits
    friction_coeff: jnp.ndarray  # 0.7
    swing_kp: jnp.ndarray        # 160
    swing_kd: jnp.ndarray        # 18
    base_accel_kp: jnp.ndarray   # 40 (xy task gains, unused by ref task but loaded)
    base_accel_kd: jnp.ndarray   # 4
    base_height_kp: jnp.ndarray  # 20
    base_height_kd: jnp.ndarray  # 3
    base_angular_kp: jnp.ndarray  # 20
    base_angular_kd: jnp.ndarray  # 3
    weight_swing: jnp.ndarray    # 100
    weight_base_accel: jnp.ndarray  # 1
    weight_contact_force: jnp.ndarray  # 0
    qp_iters: int = 18
    # relative primal-residual acceptance (scaled by the constraint rhs
    # magnitude); above it the last-solution fallback engages
    qp_accept_tol: float = 5e-3
    # warm-start the PDIP from the previous tick's PRIMAL (the qpOASES
    # setToMPC analog, WeightedWbc.cpp:44-55) and cut the fixed iteration
    # count; cold solves (first tick) share the trace.  Duals restart at
    # the cold interior init: carrying them poisons the solve when contact
    # flags flip between ticks — the masked-row slacks (bin=BIG) hold the
    # stale duals' barrier weight while the rows' meaning changed, and the
    # walking MuJoCo loop fell within 1 s of trot onset even at the full 18
    # iterations (round-3 bisect, docs/DESIGN.md); primal-only warm start
    # at 10 iterations walks indistinguishably from cold-18.
    qp_warm_start: bool = True
    qp_iters_warm: int = 10
    qp_warm_duals: bool = False


def default_wbc_params(dtype=jnp.float32) -> WbcParams:
    return WbcParams(
        torque_limits=jnp.asarray([28.0, 60.0, 60.0, 60.0, 28.0], dtype),
        friction_coeff=jnp.asarray(0.7, dtype),
        swing_kp=jnp.asarray(160.0, dtype),
        swing_kd=jnp.asarray(18.0, dtype),
        base_accel_kp=jnp.asarray(40.0, dtype),
        base_accel_kd=jnp.asarray(4.0, dtype),
        base_height_kp=jnp.asarray(20.0, dtype),
        base_height_kd=jnp.asarray(3.0, dtype),
        base_angular_kp=jnp.asarray(20.0, dtype),
        base_angular_kd=jnp.asarray(3.0, dtype),
        weight_swing=jnp.asarray(100.0, dtype),
        weight_base_accel=jnp.asarray(1.0, dtype),
        weight_contact_force=jnp.asarray(0.0, dtype),
    )


N_EQ_ROWS = NV + NF          # 28: EoM + swing zero-force
N_INEQ_ROWS = 2 * NJ + 5 * NUM_FEET  # 40: torque limits + friction pyramid


class WbcState(NamedTuple):
    last_solution: jnp.ndarray  # (38,)
    has_last: jnp.ndarray
    last_eq_dual: jnp.ndarray    # (28,) warm-start duals (setToMPC analog)
    last_ineq_dual: jnp.ndarray  # (40,)


def init_wbc_state(dtype=jnp.float32) -> WbcState:
    return WbcState(last_solution=jnp.zeros(NDEC, dtype),
                    has_last=jnp.asarray(False),
                    last_eq_dual=jnp.zeros(N_EQ_ROWS, dtype),
                    last_ineq_dual=jnp.ones(N_INEQ_ROWS, dtype))


def _measured_pipeline(model: RobotModel, rbd_measured):
    """WbcBase::updateMeasured (:70-117): q, v, M, nle, J, dJ, base J/dJ."""
    theta = rbd_measured[0:3]
    q = jnp.concatenate([rbd_measured[3:6], theta, rbd_measured[6:16]])
    euler_rates = euler_rates_from_global_angular_velocity(theta, rbd_measured[16:19])
    v = jnp.concatenate([rbd_measured[19:22], euler_rates, rbd_measured[22:32]])

    kin = fk(model, q)
    M = mass_matrix(model, q)
    h = nle(model, q, v)
    J = contact_jacobians(model, kin)[:, 0:3, :].reshape(NF, NV)
    dJ = contact_jacobians_dot(model, q, v)[:, 0:3, :].reshape(NF, NV)
    Jb = base_jacobian(model, kin)
    dJb = base_jacobian_dot(model, q, v)
    p_feet = contact_positions(model, kin)
    v_feet = (J @ v).reshape(NUM_FEET, 3)
    return q, v, M, h, J, dJ, Jb, dJb, p_feet, v_feet


def _desired_pipeline(model: RobotModel, x_des, u_des):
    """WbcBase::updateDesired (:119-136): desired foot pos/vel + base kin."""
    q_des = state_to_q(x_des)
    v_des = state_input_to_v(model, x_des, u_des)
    kin = fk(model, q_des)
    p_feet = contact_positions(model, kin)
    J = contact_jacobians(model, kin)[:, 0:3, :]
    v_feet = jnp.einsum("cij,j->ci", J, v_des)
    base_kin = base_kinematics_from_centroidal(model, x_des, u_des)
    return q_des, v_des, p_feet, v_feet, base_kin


def wbc_update(model: RobotModel, params: WbcParams, state: WbcState,
               x_des, u_des, rbd_measured, contact_flags, stance_mode):
    """WeightedWbc::update — returns (x (38,), new WbcState).

    contact_flags: (4,) float; stance_mode: bool scalar (the
    `setStanceMode` path, LeggedController.cpp:161-173)."""
    dtype = rbd_measured.dtype
    q, v, M, h, J, dJ, Jb, dJb, p_feet_m, v_feet_m = _measured_pipeline(model, rbd_measured)
    _, _, p_feet_d, v_feet_d, base_kin = _desired_pipeline(model, x_des, u_des)

    # ---------------- constraints ----------------
    # EoM: [M, -J^T, -S^T] z = -nle  (16 eq rows)
    S = jnp.zeros((NJ, NV), dtype).at[:, 6:].set(jnp.eye(NJ, dtype=dtype))
    A_eom = jnp.concatenate([M, -J.T, -S.T], axis=1)
    b_eom = -h

    # swing feet zero force (12 masked eq rows)
    swing = 1.0 - contact_flags
    A_zf = jnp.zeros((NF, NDEC), dtype)
    A_zf = A_zf.at[:, NV:NV + NF].set(jnp.diag(jnp.repeat(swing, 3)))
    b_zf = jnp.zeros(NF, dtype)

    Aeq = jnp.concatenate([A_eom, A_zf], axis=0)           # (28, 38)
    beq = jnp.concatenate([b_eom, b_zf])

    # torque limits (20 ineq rows)
    tl = jnp.tile(params.torque_limits, 2)
    D_tau = jnp.zeros((2 * NJ, NDEC), dtype)
    D_tau = D_tau.at[0:NJ, NV + NF:].set(jnp.eye(NJ, dtype=dtype))
    D_tau = D_tau.at[NJ:, NV + NF:].set(-jnp.eye(NJ, dtype=dtype))
    f_tau = jnp.concatenate([tl, tl])

    # friction pyramid per stance foot (20 masked ineq rows)
    mu = params.friction_coeff
    pyr = jnp.asarray(
        [[0.0, 0.0, -1.0], [1.0, 0.0, 0.0], [-1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, -1.0, 0.0]],
        dtype,
    )
    pyr = pyr.at[1:, 2].set(-mu)
    D_fr = jnp.zeros((5 * NUM_FEET, NDEC), dtype)
    for i in range(NUM_FEET):
        D_fr = D_fr.at[5 * i:5 * i + 5, NV + 3 * i:NV + 3 * i + 3].set(
            pyr * contact_flags[i]
        )
    f_fr = jnp.zeros(5 * NUM_FEET, dtype)

    Ain = jnp.concatenate([D_tau, D_fr], axis=0)           # (40, 38)
    bin_ = jnp.concatenate([f_tau, f_fr])

    # ---------------- weighted tasks ----------------
    # swing-leg tracking (12 rows, swing mask)  WbcBase.cpp:297-323
    accel_cmd = (
        params.swing_kp * (p_feet_d - p_feet_m) + params.swing_kd * (v_feet_d - v_feet_m)
    )  # (4,3)
    A_sw = jnp.zeros((NF, NDEC), dtype).at[:, 0:NV].set(J)
    b_sw = (accel_cmd - (dJ @ v).reshape(NUM_FEET, 3)).reshape(-1)
    w_sw = jnp.repeat(swing, 3) * jnp.sqrt(params.weight_swing)

    # base xy linear accel (2 rows)  :228-240
    A_xy = jnp.zeros((2, NDEC), dtype).at[0, 0].set(1.0).at[1, 1].set(1.0)
    b_xy = base_kin.acceleration[0:2]

    # base height (1 row)  :243-256
    A_hz = jnp.zeros((1, NDEC), dtype).at[0, 2].set(1.0)
    b_hz = (
        base_kin.acceleration[2]
        + params.base_height_kp * (base_kin.pose[2] - q[2])
        + params.base_height_kd * (base_kin.velocity[2] - v[2])
    )[None]

    # base angular (3 rows)  :259-290
    A_ang = jnp.zeros((3, NDEC), dtype).at[:, 0:NV].set(Jb[3:6])
    omega_meas = global_angular_velocity_from_euler_rates(q[3:6], v[3:6])
    R_meas = rotation_zyx(q[3:6])
    R_des = rotation_zyx(base_kin.pose[3:6])
    ang_err = rotation_error_in_world(R_des, R_meas)
    b_ang = (
        base_kin.acceleration[3:6]
        + params.base_angular_kp * ang_err
        + params.base_angular_kd * (base_kin.velocity[3:6] - omega_meas)
        - dJb[3:6] @ v
    )
    w_base = jnp.sqrt(params.weight_base_accel)

    # contact force tracking (12 rows)  :325-338
    A_cf = jnp.zeros((NF, NDEC), dtype).at[:, NV:NV + NF].set(jnp.eye(NF, dtype=dtype))
    b_cf = u_des[0:NF]
    w_cf = jnp.sqrt(params.weight_contact_force)

    # stance-mode replacement: zero base acceleration (6 rows)
    # (WeightedWbc::formulateStanceBaseAccelTask :83-94)
    A_st = jnp.zeros((6, NDEC), dtype).at[0:6, 0:6].set(jnp.eye(6, dtype=dtype))
    b_st = jnp.zeros(6, dtype)

    walk_w = jnp.where(stance_mode, 0.0, 1.0)
    stance_w = jnp.where(stance_mode, 1.0, 0.0) * w_base

    rows_A = jnp.concatenate(
        [
            A_sw * (walk_w * w_sw)[:, None],
            A_xy * walk_w * w_base,
            A_hz * walk_w * w_base,
            A_ang * walk_w * w_base,
            A_cf * walk_w * w_cf,
            A_st * stance_w,
        ],
        axis=0,
    )
    rows_b = jnp.concatenate(
        [
            b_sw * walk_w * w_sw,
            b_xy * walk_w * w_base,
            b_hz * walk_w * w_base,
            b_ang * walk_w * w_base,
            b_cf * walk_w * w_cf,
            b_st * stance_w,
        ]
    )

    H = rows_A.T @ rows_A + 1e-6 * jnp.eye(NDEC, dtype=dtype)
    g = -rows_A.T @ rows_b

    if params.qp_warm_start:
        # qpOASES setToMPC analog: restart the PDIP from the previous
        # tick's primal/duals (recentred inside solve_qp); the cold first
        # tick shares the trace via the where-selected defaults
        warm = state.has_last
        if params.qp_warm_duals:
            lam0 = jnp.where(warm, state.last_ineq_dual,
                             jnp.asarray(1.0, dtype))
            nu0 = jnp.where(warm, state.last_eq_dual,
                            jnp.asarray(0.0, dtype))
            # dtype-pinned: under jax_enable_x64 a python-float pair would
            # promote the PDIP scan carry to f64 and break the f32 trace
            margin = jnp.where(warm, jnp.asarray(1e-2, dtype),
                               jnp.asarray(1.0, dtype))
        else:
            lam0 = jnp.ones(N_INEQ_ROWS, dtype)
            nu0 = jnp.zeros(N_EQ_ROWS, dtype)
            margin = jnp.asarray(1.0, dtype)
        sol = solve_qp(
            H, g, Aeq, beq, Ain, bin_, n_iters=params.qp_iters_warm,
            x0=jnp.where(warm, state.last_solution, jnp.zeros(NDEC, dtype)),
            lam0=lam0, nu0=nu0, warm_margin=margin,
        )
    else:
        sol = solve_qp(H, g, Aeq, beq, Ain, bin_, n_iters=params.qp_iters)

    # acceptance mirrors qpOASES' status check (WeightedWbc.cpp:57-64): the
    # residual threshold scales with the constraint right-hand side (the EoM
    # rows carry nle forces of O(100) N) instead of a fixed absolute 1.0 —
    # a barely-converged QP on a small-magnitude problem now falls back to
    # the last solution rather than being trusted
    res_scale = 1.0 + jnp.maximum(jnp.abs(beq).max(), jnp.abs(bin_).max())
    ok = jnp.isfinite(sol.x).all() & (sol.primal_residual < params.qp_accept_tol * res_scale)
    x = jnp.where(ok & jnp.isfinite(sol.x).all(), sol.x,
                  jnp.where(state.has_last, state.last_solution, jnp.zeros(NDEC, dtype)))
    new_state = WbcState(
        last_solution=x,
        has_last=jnp.asarray(True),
        last_eq_dual=jnp.where(ok, sol.eq_dual, state.last_eq_dual),
        last_ineq_dual=jnp.where(ok, sol.ineq_dual, state.last_ineq_dual),
    )
    return x, new_state


def coulomb_friction_compensation(joint_vel, torques):
    """WbcBase::compensateFriction (:340-350) — defined but never invoked by
    the reference product path; provided for completeness."""
    sgn = jnp.sign(joint_vel)
    comp = jnp.where(jnp.abs(joint_vel) > 0.001, sgn * 0.2, 0.0)
    return torques + comp
