"""Time-triggered rollout integrators (fixed-shape, jit/vmap-native).

Parity target: OCS2 ``TimeTriggeredRollout`` as configured by the rollout
block of legged_controllers/config/hunter/task.info:131-140 —

    AbsTolODE 1e-5, RelTolODE 1e-3, timeStep 0.015, integratorType ODE45,
    maxNumStepsPerSecond 10000

used by the reference at LeggedInterface.cpp:156 for solver rollouts
(DDP/SLQ line-search rollouts and the MRT dummy loop).  The SQP sensitivity
integrator stays RK2 (task.info:94) — `solver/sqp.rk2_step`.

TPU re-design: an adaptive integrator has a data-dependent step count, which
a jitted program cannot have.  ``ode45_step`` therefore runs a *bounded*
Dormand-Prince 5(4) loop: a ``lax.scan`` over ``max_substeps`` slots where
each slot either advances (accepted step), retries with a smaller h
(rejected step), or no-ops (already reached dt).  The PI step-size
controller and the embedded 4th/5th-order error estimate are the classical
ODE45 ones, so for smooth dynamics the accepted-step count matches scipy's
RK45 and the masked tail costs only wasted lanes — shape stays static for
jit/vmap/pjit.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.centroidal import flow_map
from ..models.robot import RobotModel

# Dormand-Prince RK5(4) tableau (the MATLAB/scipy "ode45" / "RK45" pair).
_C = (0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0)
_A = (
    (),
    (1 / 5,),
    (3 / 40, 9 / 40),
    (44 / 45, -56 / 15, 32 / 9),
    (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729),
    (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
    (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84),
)
_B5 = (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0)
_B4 = (5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200,
       187 / 2100, 1 / 40)


class RolloutSettings(NamedTuple):
    """rollout block of task.info:131-140."""

    abs_tol: float = 1e-5          # AbsTolODE
    rel_tol: float = 1e-3          # RelTolODE
    time_step: float = 0.015      # timeStep (initial h guess)
    integrator: str = "ODE45"     # integratorType: 'ODE45' | 'RK2' | 'RK4'
    max_steps_per_second: float = 10000.0  # maxNumStepsPerSecond
    max_substeps: int = 16         # static bound on adaptive slots per call


def _dopri_substeps(f, x, dt, s: RolloutSettings):
    """Adaptive DoPri5(4) over [0, dt] in a fixed number of slots."""
    dtype = x.dtype
    dt = jnp.asarray(dt, dtype)
    h_min = jnp.asarray(1.0 / s.max_steps_per_second, dtype)
    h0 = jnp.minimum(jnp.asarray(s.time_step, dtype), dt)

    def slot(carry, _):
        t, xk, h = carry
        remaining = dt - t
        active = remaining > 1e-12
        hs = jnp.clip(h, h_min, jnp.maximum(remaining, h_min))

        ks = []
        for i in range(7):
            xi = xk
            for j, aij in enumerate(_A[i]):
                xi = xi + hs * aij * ks[j]
            ks.append(f(xi))
        x5 = xk + hs * sum(b * k for b, k in zip(_B5, ks))
        x4 = xk + hs * sum(b * k for b, k in zip(_B4, ks))

        scale = s.abs_tol + s.rel_tol * jnp.maximum(jnp.abs(xk), jnp.abs(x5))
        err = jnp.sqrt(jnp.mean(jnp.square((x5 - x4) / scale)))
        accept = (err <= 1.0) | (hs <= h_min * (1 + 1e-6))

        t_new = jnp.where(active & accept, t + hs, t)
        x_new = jnp.where(active & accept, x5, xk)
        # PI-ish controller: grow on success, shrink on rejection
        factor = jnp.clip(0.9 * err ** (-0.2), 0.2, 5.0)
        h_new = jnp.where(active, jnp.clip(hs * factor, h_min, dt), h)
        return (t_new, x_new, h_new), (active & accept)

    (t_end, x_end, _), accepted = jax.lax.scan(
        slot, (jnp.zeros((), dtype), x, h0), None, length=s.max_substeps)
    return x_end, t_end, accepted


def ode45_step(model: RobotModel, x, u, dt,
               settings: RolloutSettings = RolloutSettings()):
    """Integrate the centroidal flow over [0, dt] under zero-order-hold u
    with adaptive DoPri5(4) (OCS2 IntegratorType::ODE45 parity).

    If all ``max_substeps`` slots reject (stiff or diverging candidate
    state, e.g. a bad DDP line-search point), the adaptive loop stops short
    of ``dt``; a single fixed RK4 step finishes the residual span so the
    returned state always corresponds to the full interval.
    """
    f = lambda xk: flow_map(model, xk, u)
    x_end, t_end, _ = _dopri_substeps(f, x, dt, settings)
    residual = jnp.maximum(jnp.asarray(dt, x.dtype) - t_end, 0.0)
    k1 = f(x_end)
    k2 = f(x_end + 0.5 * residual * k1)
    k3 = f(x_end + 0.5 * residual * k2)
    k4 = f(x_end + residual * k3)
    return x_end + residual / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)


def rk4_step(model: RobotModel, x, u, dt):
    """Classical RK4 (OCS2 IntegratorType::RK4) — the fixed-step option."""
    k1 = flow_map(model, x, u)
    k2 = flow_map(model, x + 0.5 * dt * k1, u)
    k3 = flow_map(model, x + 0.5 * dt * k2, u)
    k4 = flow_map(model, x + dt * k3, u)
    return x + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)


def rollout_step(model: RobotModel, x, u, dt,
                 settings: RolloutSettings = RolloutSettings()):
    """One rollout interval with the configured integrator (static dispatch —
    `settings.integrator` is a Python string, resolved at trace time)."""
    kind = settings.integrator.upper()
    if kind == "ODE45":
        return ode45_step(model, x, u, dt, settings)
    if kind == "RK4":
        return rk4_step(model, x, u, dt)
    if kind == "RK2":
        from .sqp import rk2_step

        return rk2_step(model, x, u, dt)
    raise ValueError(f"unknown integratorType {settings.integrator!r}")
