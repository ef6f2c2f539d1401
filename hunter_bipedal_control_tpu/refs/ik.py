"""Batched damped-least-squares leg inverse kinematics.

Parity target: legged_interface/src/foot_planner/InverseKinematics.cpp:20-267
— per-leg 5-DoF translation IK (QR solve, <=5 iterations, joint-limit clamp,
:36-127), rotation IK restricted to the translation null space (:135-231),
differential IK (:233-251) and foot FK (:253-267).

TPU-first differences: statically unrolled fixed iteration count with a
keep-if-improved update instead of data-dependent early exit, damped normal
equations instead of rank-revealing QR/LU (fixed shapes, batch-friendly),
and both legs solved simultaneously from one whole-body FK.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.kinematics import contact_jacobians, contact_positions, fk, frame_placements
from ..models.robot import RobotModel
from ..models.spatial import log3

MAX_IT = 5
STEP = 0.7
DAMP = 1e-6


def leg2index(leg: int) -> int:
    """First joint index of a leg (InverseKinematics::leg2index)."""
    return leg * 5


def foot_positions(model: RobotModel, q: jnp.ndarray) -> jnp.ndarray:
    """(2, 3) toe-frame positions for legs [L, R] (computeFootPos parity —
    the reference IK uses the toe contact frames 0,1)."""
    kin = fk(model, q)
    pc = contact_positions(model, kin)
    return pc[0:2]


def _toe_state(model: RobotModel, q):
    """Positions, rotations and 6x5 per-leg Jacobian blocks for both toes."""
    kin = fk(model, q)
    Rf, pf = frame_placements(model, kin)
    toes = model.contact_frame_ids[0:2]
    J = contact_jacobians(model, kin)[0:2]  # (2, 6, nv)
    Jl = jnp.stack([J[0, :, 6:11], J[1, :, 11:16]])  # (2, 6, 5) leg blocks
    return pf[toes], Rf[toes], Jl


def _damped_solve(J, err, damp=DAMP):
    """argmin ||J d - err||^2 + damp||d||^2 (QR-solve stand-in, fixed shape).
    The 5x5 SPD normal system is inverted by pivoted Gauss-Jordan — this
    sits on the MPC reference-generation hot path (calculateJointRef runs
    IK per 0.15 s sample), where XLA's row-sequential LU dominates on TPU."""
    from ..ops.linalg import gj_inverse

    A = J.T @ J + damp * jnp.eye(J.shape[1], dtype=J.dtype)
    return gj_inverse(A) @ (J.T @ err)


def translation_ik(model: RobotModel, q_init: jnp.ndarray, des_pos: jnp.ndarray,
                   max_it: int = MAX_IT):
    """Both legs' translation IK.  des_pos: (2, 3) desired toe positions.
    Returns q with both legs' joints updated (computeTranslationIK parity)."""
    lower = model.joint_lower
    upper = model.joint_upper

    def body(carry, _):
        q, best_q, best_err = carry
        p, _, Jl = _toe_state(model, q)
        err = p - des_pos  # (2,3)
        d = jax.vmap(lambda Jleg, e: _damped_solve(Jleg[0:3], e))(Jl, err)  # (2,5)
        qj = q[6:] + STEP * jnp.concatenate([-d[0], -d[1]])
        qj = jnp.clip(qj, lower, upper)
        q_new = q.at[6:].set(qj)
        p_new, _, _ = _toe_state(model, q_new)
        new_err = jnp.linalg.norm(p_new - des_pos, axis=1)  # (2,)
        improved = new_err < best_err
        # per-leg keep-if-improved
        qj_best = jnp.where(
            jnp.repeat(improved, 5), q_new[6:], best_q[6:]
        )
        best_q = best_q.at[6:].set(qj_best)
        best_err = jnp.minimum(new_err, best_err)
        return (q_new, best_q, best_err), None

    p0, _, _ = _toe_state(model, q_init)
    err0 = jnp.linalg.norm(p0 - des_pos, axis=1)
    # statically unrolled (max_it is 3-5): a lax.scan compiles to an XLA
    # while loop whose body boundary forces layout copies of the tiny
    # padded kinematics tensors
    carry = (q_init, q_init, err0)
    for _ in range(max_it):
        carry, _ = body(carry, None)
    _, best_q, _ = carry
    return best_q


def rotation_ik(model: RobotModel, q_init: jnp.ndarray, R_des: jnp.ndarray,
                max_it: int = MAX_IT):
    """Rotation IK in the null space of the translation Jacobian
    (computeRotationIK parity).  R_des: (3,3) world target applied to both
    toes (the reference passes one R_des for both legs)."""
    lower = model.joint_lower
    upper = model.joint_upper

    def rot_err(Rcur):
        return log3(R_des.T @ Rcur)

    def body(carry, _):
        q, best_q, best_err = carry
        p, R, Jl = _toe_state(model, q)

        def leg_step(Rleg, Jleg):
            # LOCAL-frame jacobians (reference uses pinocchio::LOCAL here)
            Jlin = Rleg.T @ Jleg[0:3]
            Jang = Rleg.T @ Jleg[3:6]
            # null-space projector of the translation jacobian
            from ..ops.linalg import inv3

            JJt = Jlin @ Jlin.T + DAMP * jnp.eye(3, dtype=Jlin.dtype)
            N = jnp.eye(5, dtype=Jlin.dtype) - Jlin.T @ (inv3(JJt) @ Jlin)
            e = rot_err(Rleg)
            w = _damped_solve(Jang @ N, e)
            return -N @ w, e

        d0, _ = leg_step(R[0], Jl[0])
        d1, _ = leg_step(R[1], Jl[1])
        qj = jnp.clip(q[6:] + STEP * jnp.concatenate([d0, d1]), lower, upper)
        q_new = q.at[6:].set(qj)
        _, R_new, _ = _toe_state(model, q_new)
        new_err = jnp.stack(
            [jnp.linalg.norm(rot_err(R_new[0])), jnp.linalg.norm(rot_err(R_new[1]))]
        )
        improved = new_err < best_err
        qj_best = jnp.where(jnp.repeat(improved, 5), q_new[6:], best_q[6:])
        best_q = best_q.at[6:].set(qj_best)
        best_err = jnp.minimum(new_err, best_err)
        return (q_new, best_q, best_err), None

    _, R0, _ = _toe_state(model, q_init)
    err0 = jnp.stack(
        [jnp.linalg.norm(rot_err(R0[0])), jnp.linalg.norm(rot_err(R0[1]))]
    )
    carry = (q_init, q_init, err0)  # unrolled: see translation_ik
    for _ in range(max_it):
        carry, _ = body(carry, None)
    _, best_q, _ = carry
    return best_q


def compute_ik(model: RobotModel, q_init: jnp.ndarray, des_pos: jnp.ndarray,
               R_des: jnp.ndarray, trans_it: int = MAX_IT,
               rot_it: int = MAX_IT) -> jnp.ndarray:
    """Translation IK then null-space rotation IK; returns (nj,) joint
    angles for both legs (computeIK parity, both legs fused).  The solver's
    reference-generation path passes reduced iteration counts (warm starts
    converge in 2-3 steps; the reference's early-exit usually fires there
    too)."""
    q = translation_ik(model, q_init, des_pos, trans_it)
    q = rotation_ik(model, q, R_des, rot_it)
    return q[6:].astype(q_init.dtype)


def differential_ik(model: RobotModel, q: jnp.ndarray, foot_vel: jnp.ndarray):
    """(nj,) joint velocities realizing desired toe 6D velocities
    (computeDIK parity).  foot_vel: (2, 6) [linear; angular] world."""
    _, _, Jl = _toe_state(model, q)
    d = jax.vmap(lambda Jleg, v: _damped_solve(Jleg, v))(Jl, foot_vel)
    return jnp.concatenate([d[0], d[1]])
