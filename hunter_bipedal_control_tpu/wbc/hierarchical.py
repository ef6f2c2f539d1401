"""Hierarchical WBC: strict-priority null-space QP cascade.

Parity target: legged_wbc/src/HierarchicalWbc.cpp:18-32 + HoQp.cpp:21-200 —
three strict priority levels:

    0: EoM + torque limits + friction cone + no-contact-motion
    1: base acceleration tracking
    2: contact-force tracking + swing-leg tracking

Each level solves a QP in the null space of all higher-priority equality
tasks, with slack variables on its inequality rows (HoQp's Z-matrix chain,
:157-168).  The reference computes the null-space basis by rank-revealing
LU (`fullPivLu().kernel()`); fixed shapes on TPU use the projector form
P = I - A^+ A instead (same subspace, no dynamic rank), with the projected
Hessian regularized on the constrained directions.

Slack handling: the reference augments each level's decision vector with
per-inequality slacks.  Here each level solves

    min_z ||A_l (x_prev + P_prev z) - b_l||^2 + w_s ||s||^2
    s.t.  D_all (x_prev + P_prev z) <= f_all + s,  s >= 0

with the batched interior-point solver over the fixed 38+slack variables.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..models.robot import RobotModel
from ..ops.qp import solve_qp
from .wbc import (
    NDEC,
    NF,
    NJ,
    NUM_FEET,
    NV,
    WbcParams,
    WbcState,
    _desired_pipeline,
    _measured_pipeline,
)


def _row_normalize(A, b=None):
    """Equilibrate rows (zero rows stay zero) — keeps the f32 normal
    equations of tall stacked task matrices well conditioned."""
    rn = jnp.linalg.norm(A, axis=1)
    scale = jnp.where(rn > 1e-9, 1.0 / jnp.maximum(rn, 1e-9), 0.0)
    An = A * scale[:, None]
    if b is None:
        return An
    return An, b * scale


def _pinv_projector(A, rel_tol=1e-4):
    """Null-space projector P = I - A^+ A and pseudo-inverse A^+, via an
    eigendecomposition of the equilibrated normal matrix with a hard
    rank threshold (the fixed-shape stand-in for the reference's
    rank-revealing ``fullPivLu().kernel()``, HoQp.cpp:157-168).  A smooth
    Tikhonov inverse leaks along near-null directions in f32 (partial
    projection), so a hard cut at ``rel_tol * max_eig`` is essential."""
    An = _row_normalize(A)
    G = An.T @ An  # (n, n) symmetric PSD
    w, V = jnp.linalg.eigh(G)
    w_max = jnp.maximum(w[-1], 1e-12)
    keep = w > rel_tol * w_max                       # row-space directions
    inv_w = jnp.where(keep, 1.0 / jnp.maximum(w, rel_tol * w_max), 0.0)
    null_mask = jnp.where(keep, 0.0, 1.0)
    P = (V * null_mask[None, :]) @ V.T               # null-space projector
    Apinv = (V * inv_w[None, :]) @ V.T @ An.T        # thresholded pinv
    return P, Apinv


def hierarchical_wbc_update(model: RobotModel, params: WbcParams, state: WbcState,
                            x_des, u_des, rbd_measured, contact_flags,
                            stance_mode):
    """HierarchicalWbc::update parity.  Returns (x (38,), new WbcState)."""
    dtype = rbd_measured.dtype
    q, v, M, h, J, dJ, Jb, dJb, p_feet_m, v_feet_m = _measured_pipeline(model, rbd_measured)
    _, _, p_feet_d, v_feet_d, base_kin = _desired_pipeline(model, x_des, u_des)

    swing = 1.0 - contact_flags
    S = jnp.zeros((NJ, NV), dtype).at[:, 6:].set(jnp.eye(NJ, dtype=dtype))

    # ---------- level 0 (equalities): EoM + no-contact-motion ----------
    A_eom = jnp.concatenate([M, -J.T, -S.T], axis=1)
    b_eom = -h
    # no-contact-motion (stance feet): J a = -dJ v   (WbcBase.cpp:169-188)
    A_ncm = jnp.zeros((NF, NDEC), dtype).at[:, 0:NV].set(
        J * jnp.repeat(contact_flags, 3)[:, None]
    )
    b_ncm = -(dJ @ v).reshape(-1) * jnp.repeat(contact_flags, 3)
    # swing-feet zero force as equality rows
    A_zf = jnp.zeros((NF, NDEC), dtype).at[:, NV:NV + NF].set(
        jnp.diag(jnp.repeat(swing, 3))
    )
    A0 = jnp.concatenate([A_eom, A_ncm, A_zf], axis=0)
    b0 = jnp.concatenate([b_eom, b_ncm, jnp.zeros(NF, dtype)])

    # level-0 inequalities: torque limits + friction pyramid
    tl = jnp.tile(params.torque_limits, 2)
    D_tau = jnp.zeros((2 * NJ, NDEC), dtype)
    D_tau = D_tau.at[0:NJ, NV + NF:].set(jnp.eye(NJ, dtype=dtype))
    D_tau = D_tau.at[NJ:, NV + NF:].set(-jnp.eye(NJ, dtype=dtype))
    f_tau = jnp.concatenate([tl, tl])
    mu = params.friction_coeff
    pyr = jnp.asarray(
        [[0.0, 0.0, -1.0], [1.0, 0.0, 0.0], [-1.0, 0.0, 0.0],
         [0.0, 1.0, 0.0], [0.0, -1.0, 0.0]], dtype,
    ).at[1:, 2].set(-mu)
    D_fr = jnp.zeros((5 * NUM_FEET, NDEC), dtype)
    for i in range(NUM_FEET):
        D_fr = D_fr.at[5 * i:5 * i + 5, NV + 3 * i:NV + 3 * i + 3].set(
            pyr * contact_flags[i]
        )
    D_all = jnp.concatenate([D_tau, D_fr], axis=0)
    f_all = jnp.concatenate([f_tau, jnp.zeros(5 * NUM_FEET, dtype)])

    # particular solution of level 0 + its null space (equilibrated rows)
    A0n, b0n = _row_normalize(A0, b0)
    P0, A0p = _pinv_projector(A0)
    x0 = A0p @ b0n

    # ---------- level 1: base acceleration ----------
    from ..models.spatial import (
        global_angular_velocity_from_euler_rates,
        rotation_error_in_world,
        rotation_zyx,
    )

    A_xy = jnp.zeros((2, NDEC), dtype).at[0, 0].set(1.0).at[1, 1].set(1.0)
    b_xy = base_kin.acceleration[0:2]
    A_hz = jnp.zeros((1, NDEC), dtype).at[0, 2].set(1.0)
    b_hz = (base_kin.acceleration[2]
            + params.base_height_kp * (base_kin.pose[2] - q[2])
            + params.base_height_kd * (base_kin.velocity[2] - v[2]))[None]
    A_ang = jnp.zeros((3, NDEC), dtype).at[:, 0:NV].set(Jb[3:6])
    omega_meas = global_angular_velocity_from_euler_rates(q[3:6], v[3:6])
    ang_err = rotation_error_in_world(rotation_zyx(base_kin.pose[3:6]),
                                      rotation_zyx(q[3:6]))
    b_ang = (base_kin.acceleration[3:6]
             + params.base_angular_kp * ang_err
             + params.base_angular_kd * (base_kin.velocity[3:6] - omega_meas)
             - dJb[3:6] @ v)
    A1 = jnp.concatenate([A_xy, A_hz, A_ang], axis=0)
    b1 = jnp.concatenate([b_xy, b_hz, b_ang])

    def solve_level(A_l, b_l, x_prev, P_prev):
        """min ||A_l (x_prev + P_prev z)-b_l||^2 s.t. D_all x <= f_all."""
        A_l, b_l = _row_normalize(A_l, b_l)
        Ah = A_l @ P_prev
        H = Ah.T @ Ah
        H = H + (1e-5 * jnp.trace(H) / NDEC + 1e-7) * jnp.eye(NDEC, dtype=dtype)
        g = Ah.T @ (A_l @ x_prev - b_l)
        Din = D_all @ P_prev
        fin = f_all - D_all @ x_prev
        sol = solve_qp(H, g, jnp.zeros((1, NDEC), dtype), jnp.zeros(1, dtype),
                       Din, fin, n_iters=15)
        return x_prev + P_prev @ sol.x

    x1 = solve_level(A1, b1, x0, P0)
    # null space of levels 0+1 combined
    A01 = jnp.concatenate([A0, A1], axis=0)
    P1, _ = _pinv_projector(A01)

    # ---------- level 2: swing feet + contact forces ----------
    accel_cmd = (params.swing_kp * (p_feet_d - p_feet_m)
                 + params.swing_kd * (v_feet_d - v_feet_m))
    A_sw = jnp.zeros((NF, NDEC), dtype).at[:, 0:NV].set(
        J * jnp.repeat(swing, 3)[:, None]
    )
    b_sw = ((accel_cmd - (dJ @ v).reshape(NUM_FEET, 3)).reshape(-1)
            * jnp.repeat(swing, 3))
    A_cf = jnp.zeros((NF, NDEC), dtype).at[:, NV:NV + NF].set(jnp.eye(NF, dtype=dtype))
    b_cf = u_des[0:NF]
    A2 = jnp.concatenate([A_sw, A_cf], axis=0)
    b2 = jnp.concatenate([b_sw, b_cf])

    x2 = solve_level(A2, b2, x1, P1)

    ok = jnp.isfinite(x2).all()
    x = jnp.where(ok, x2,
                  jnp.where(state.has_last, state.last_solution,
                            jnp.zeros(NDEC, dtype)))
    return x, state._replace(last_solution=x, has_last=jnp.asarray(True))


def solve_hierarchy(tasks, n, qp_iters: int = 20):
    """Generic strict-priority cascade over tasks [(A, b, D, f), ...] with
    n decision variables (HoQp chain parity, HoQp.cpp:21-29): each level
    minimizes its equality residual within the accumulated null space of all
    higher-priority equality tasks, subject to every level's inequalities.

    Returns the final solution x (n,)."""
    dtype = None
    for A, b, D, f in tasks:
        dtype = (A if A is not None else D).dtype
        break
    x = jnp.zeros(n, dtype)
    P = jnp.eye(n, dtype=dtype)
    D_acc = jnp.zeros((0, n), dtype)
    f_acc = jnp.zeros(0, dtype)

    for A, b, D, f in tasks:
        if D is not None and D.shape[0] > 0:
            D_acc = jnp.concatenate([D_acc, D], axis=0)
            f_acc = jnp.concatenate([f_acc, f])
        if A is not None and A.shape[0] > 0:
            A, b = _row_normalize(A, b)
            Ah = A @ P
            H = Ah.T @ Ah
            H = H + (1e-5 * jnp.trace(H) / n + 1e-7) * jnp.eye(n, dtype=dtype)
            g = Ah.T @ (A @ x - b)
            if D_acc.shape[0] > 0:
                Din = D_acc @ P
                fin = f_acc - D_acc @ x
            else:
                Din = jnp.zeros((1, n), dtype)
                fin = jnp.ones(1, dtype)
            sol = solve_qp(H, g, jnp.zeros((1, n), dtype), jnp.zeros(1, dtype),
                           Din, fin, n_iters=qp_iters)
            x = x + P @ sol.x
            Pn, _ = _pinv_projector(A @ P)
            P = P @ Pn
    return x
