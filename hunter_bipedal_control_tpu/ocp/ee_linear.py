"""Generic end-effector linear constraint + the swing XY-limit constraint.

Parity targets:
  - ``EndEffectorLinearConstraint`` — g = A_x p_foot + A_v v_foot + b
    (legged_interface/src/constraint/EndEffectorLinearConstraint.cpp:36-132).
    The reference's normalVelocity / XYReference constraints are instances of
    this generic form configured per-knot by the PreComputation
    (LeggedRobotPreComputation.cpp:96-119); in this framework those two live
    fused inside ``ocp.problem`` (the hot path), while this module keeps the
    *generic* constraint available for ad-hoc end-effector tasks.
  - ``XYLimitConstraint`` — 4 ramped swing XY-velocity bound rows built by
    ``eeXYLimitConConfig`` (LeggedRobotPreComputation.cpp:121-143) and gated
    to swing feet (XYLimitConstraint.cpp:71-74).  The reference constructs
    but never adds this constraint to its OCP (LeggedInterface.cpp does not
    reference it); it is provided here at the same latent-API status.

Not a hot path: linearization is plain jacfwd over (x, u).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.centroidal import state_input_to_v, state_to_q
from ..models.kinematics import contact_jacobians, contact_positions, fk
from ..models.robot import RobotModel


class EeLinearConfig(NamedTuple):
    """g(x, u) = Ax @ p_foot + Av @ v_foot + b, rows masked by ``active``."""

    b: jnp.ndarray        # (k,)
    Ax: jnp.ndarray       # (k, 3)
    Av: jnp.ndarray       # (k, 3)
    active: jnp.ndarray   # (k,) 0/1 row mask (fixed-shape stand-in for the
                          # reference's isActive() constraint dropping)


def ee_linear_value(model: RobotModel, cfg: EeLinearConfig, foot: int,
                    x: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Masked constraint value g (k,) for one contact point
    (EndEffectorLinearConstraint::getValue :88-101)."""
    q = state_to_q(x)
    v = state_input_to_v(model, x, u)
    kin = fk(model, q)
    p = contact_positions(model, kin)[foot]
    J = contact_jacobians(model, kin)[foot, 0:3, :]
    vf = J @ v
    return cfg.active * (cfg.b + cfg.Ax @ p + cfg.Av @ vf)


def ee_linear_linearization(model: RobotModel, cfg: EeLinearConfig, foot: int,
                            x: jnp.ndarray, u: jnp.ndarray):
    """(g, dg/dx, dg/du) (EndEffectorLinearConstraint::getLinearApproximation
    :107-131) — AD instead of the reference's chained analytic approximations."""
    g = ee_linear_value(model, cfg, foot, x, u)
    Jx, Ju = jax.jacfwd(
        lambda x_, u_: ee_linear_value(model, cfg, foot, x_, u_), argnums=(0, 1)
    )(x, u)
    return g, Jx, Ju


def normal_velocity_config(pos_ref_z, vel_ref_z, position_error_gain,
                           dtype=jnp.float32) -> EeLinearConfig:
    """eeNormalVelConConfig (LeggedRobotPreComputation.cpp:96-106):
    v_z - vref_z + gain * (p_z - pref_z) = 0 as a 1-row generic config."""
    g = jnp.asarray(position_error_gain, dtype)
    return EeLinearConfig(
        b=jnp.asarray([-vel_ref_z - position_error_gain * pos_ref_z], dtype),
        Ax=jnp.asarray([[0.0, 0.0, 1.0]], dtype) * g,
        Av=jnp.asarray([[0.0, 0.0, 1.0]], dtype),
        active=jnp.ones(1, dtype),
    )


def xy_reference_config(pos_ref_xy, vel_ref_xy, xy_gain=3.0,
                        dtype=jnp.float32) -> EeLinearConfig:
    """eeXYRefConConfig (LeggedRobotPreComputation.cpp:109-119):
    v_xy - vref_xy + 3 * (p_xy - pref_xy) = 0 as a 2-row generic config."""
    g = jnp.asarray(xy_gain, dtype)
    b = jnp.asarray(
        [-vel_ref_xy[0] - xy_gain * pos_ref_xy[0],
         -vel_ref_xy[1] - xy_gain * pos_ref_xy[1]], dtype)
    Ax = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], dtype) * g
    Av = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], dtype)
    return EeLinearConfig(b=b, Ax=Ax, Av=Av, active=jnp.ones(2, dtype))


def xy_limit_config(start_stop, t, k1=20.0, k2=20.0, weight=10.0,
                    settle=0.1, dtype=jnp.float32) -> EeLinearConfig:
    """eeXYLimitConConfig (LeggedRobotPreComputation.cpp:121-143).

    Four rows bounding the swing foot's planar speed by ramps anchored at the
    swing window [t0, t3] (t2 = t3 - settle):
      rows 0,1 (lift-off, t in [t0, t2]):  w*(k1*(t - t0) - v_{x,y}) — the
        planar speed may grow at most k1*(t-t0) after lift-off;
      rows 2,3 (touch-down, t in [t2, t3]): w*(v_{x,y} + k2*(t - t3)) — the
        planar speed must decay to 0 by t3 at rate k2.
    Rows outside their window are zeroed (the reference writes literal zeros
    into b/Av; here `active` additionally masks them).  Branch-free.
    """
    t0 = jnp.asarray(start_stop[0], dtype)
    t3 = jnp.asarray(start_stop[1], dtype)
    t2 = t3 - settle
    t = jnp.asarray(t, dtype)
    w = jnp.asarray(weight, dtype)

    in_lift = jnp.logical_and(t >= t0, t <= t2).astype(dtype)
    in_land = jnp.logical_and(t >= t2, t <= t3).astype(dtype)

    b = jnp.stack([
        in_lift * w * k1 * (t - t0),
        in_lift * w * k1 * (t - t0),
        in_land * w * k2 * (t - t3),
        in_land * w * k2 * (t - t3),
    ])
    Av = jnp.zeros((4, 3), dtype)
    Av = Av.at[0, 0].set(-w * in_lift).at[1, 1].set(-w * in_lift)
    Av = Av.at[2, 0].set(w * in_land).at[3, 1].set(w * in_land)
    active = jnp.stack([in_lift, in_lift, in_land, in_land])
    return EeLinearConfig(b=b, Ax=jnp.zeros((4, 3), dtype), Av=Av, active=active)
