"""Contact-force estimation (generalized-momentum disturbance observer) and
contact-state classification / early-late contact detection.

Parity target: legged_estimation/src/StateEstimateBase.cpp:129-362
(Bledt-style momentum observer with 250 Hz cutoff, 75 N threshold
classification inside phase windows, early/late contact flags against the
mode schedule).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..models.dynamics import coriolis_matrix, gravity_vector, mass_matrix
from ..models.kinematics import contact_jacobians, fk
from ..models.robot import RobotModel
from ..models.spatial import euler_rates_from_global_angular_velocity

NUM_FEET = 4
NV = 16
NJ = 10


class ContactObserverParams(NamedTuple):
    cutoff_frequency: jnp.ndarray  # 250 (task.info:347-351)
    contact_threshold: jnp.ndarray  # 75


def default_contact_params(dtype=jnp.float32) -> ContactObserverParams:
    return ContactObserverParams(
        cutoff_frequency=jnp.asarray(250.0, dtype),
        contact_threshold=jnp.asarray(75.0, dtype),
    )


class ContactObserverState(NamedTuple):
    p_scg_z_last: jnp.ndarray      # (16,) filtered momentum-rate integral
    est_forces: jnp.ndarray        # (16,) [wrench L (6), wrench R (6), |F| x2, |W| x2]


def init_contact_observer(dtype=jnp.float32) -> ContactObserverState:
    return ContactObserverState(
        p_scg_z_last=jnp.zeros(NV, dtype),
        est_forces=jnp.full(16, 50.0, dtype),
    )


def momentum_observer_update(model: RobotModel, params: ContactObserverParams,
                             state: ContactObserverState, rbd_measured,
                             cmd_torque, dt):
    """estContactForce (:130-206): first-order disturbance observer on the
    generalized momentum; per-leg wrench recovered by a damped least-squares
    solve of S_l J^T w = S_l tau_dist (the reference uses an SVD solve)."""
    dtype = rbd_measured.dtype
    theta = rbd_measured[0:3]
    q = jnp.concatenate([rbd_measured[3:6], theta, rbd_measured[6:16]])
    v = jnp.concatenate(
        [
            rbd_measured[19:22],
            euler_rates_from_global_angular_velocity(theta, rbd_measured[16:19]),
            rbd_measured[22:32],
        ]
    )

    lam = params.cutoff_frequency
    gama = jnp.exp(-lam * dt)
    beta = (1.0 - gama) / (gama * dt)

    M = mass_matrix(model, q)
    C = coriolis_matrix(model, q, v)
    g = gravity_vector(model, q)
    p = M @ v

    S = jnp.zeros((NJ, NV), dtype).at[:, 6:].set(jnp.eye(NJ, dtype=dtype))
    p_scg = beta * p + S.T @ cmd_torque + C.T @ v - g
    p_scg_z = (1.0 - gama) * p_scg + gama * state.p_scg_z_last
    tau_dist = beta * p - p_scg_z

    kin = fk(model, q)
    Jc = contact_jacobians(model, kin)  # (4,6,16) toe frames first

    def leg_wrench(i, col0):
        J6 = Jc[i]                                  # (6,16) full 6D jacobian
        S_l = jnp.zeros((5, NV), dtype).at[:, 6 + col0:6 + col0 + 5].set(
            jnp.eye(5, dtype=dtype)
        )
        A = S_l @ J6.T                               # (5,6)
        b = S_l @ tau_dist                           # (5,)
        # min-norm least squares (SVD stand-in): w = A^T (A A^T + eps)^-1 b
        AAt = A @ A.T + 1e-6 * jnp.eye(5, dtype=dtype)
        from ..ops.linalg import gj_inverse
        return A.T @ (gj_inverse(AAt) @ b)

    w_l = leg_wrench(0, 0)
    w_r = leg_wrench(1, 5)
    f_norms = jnp.stack([jnp.linalg.norm(w_l[0:3]), jnp.linalg.norm(w_r[0:3])])
    w_norms = jnp.stack([jnp.linalg.norm(w_l), jnp.linalg.norm(w_r)])
    est = jnp.concatenate([w_l, w_r, f_norms, w_norms])
    return ContactObserverState(p_scg_z_last=p_scg_z, est_forces=est), tau_dist


def classify_contact(params: ContactObserverParams, est_forces, cmd_contact_flags,
                     start_stop, t):
    """estContactState (:208-226): trust the commanded contact everywhere
    except near phase boundaries, where the estimated normal force decides.

    start_stop: (4,2) current window [start, stop] per leg."""
    start = start_stop[:, 0]
    stop = start_stop[:, 1]
    period = stop - start
    frac = (t - start) / jnp.maximum(period, 1e-6)
    # per-leg estimated force z: the reference indexes wrench z of leg i%2
    fz = jnp.stack([est_forces[2], est_forces[8], est_forces[2], est_forces[8]])
    force_contact = fz > params.contact_threshold
    swing_late = (cmd_contact_flags < 0.5) & (frac > 0.75)
    stance_early = (cmd_contact_flags > 0.5) & (frac < 0.25)
    out = jnp.where(swing_late | stance_early, force_contact,
                    cmd_contact_flags > 0.5)
    return out


def early_late_contact_flags(contact_seq_at_t, measured_contact, cmd_contact,
                             frac, time_to_stop):
    """earlyContactDetection / lateContactDetection (:228-362) distilled to
    their decision rule: a swing leg measuring contact in the last quarter of
    its swing (and not within 9 ms of touchdown) flags 'early'; a stance leg
    not measuring contact within 40 ms of its scheduled touchdown flags
    'late'."""
    early = (cmd_contact < 0.5) & measured_contact & (frac > 0.75) & (time_to_stop > 0.009)
    late = (cmd_contact > 0.5) & (~measured_contact) & (frac < 0.25)
    return early, late
