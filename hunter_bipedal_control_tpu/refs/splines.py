"""Cubic Hermite splines on normalized time (fixed-shape, batched).

Parity target: legged_interface/src/foot_planner/CubicSpline.cpp:46-130 and
MultiCubicSpline.cpp — a Hermite cubic parameterized by (start, final)
nodes carrying (time, position, velocity), evaluated on normalized
s = (t - t0)/(t1 - t0).  A piecewise spline is a stack of node arrays with a
searchsorted segment lookup, so evaluation is a gather + fused polynomial —
ideal for vmap over (feet x phases x query times).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class PiecewiseCubic(NamedTuple):
    """n-node piecewise cubic: times (..., N), pos (..., N), vel (..., N)."""

    times: jnp.ndarray
    pos: jnp.ndarray
    vel: jnp.ndarray


def _hermite_coeffs(t0, p0, v0, t1, p1, v1):
    """Coefficients a + b s + c s^2 + d s^3 with s normalized (CubicSpline.cpp:100-125)."""
    dt = jnp.maximum(t1 - t0, 1e-6)
    dp = p1 - p0
    dv0 = v0 * dt
    dv1 = v1 * dt
    a = p0
    b = dv0
    c = -(3.0 * p0 + 2.0 * dv0 + dv1 - 3.0 * p1)
    d = 2.0 * p0 + dv0 + dv1 - 2.0 * p1
    return a, b, c, d, dt


def eval_piecewise(spline: PiecewiseCubic, t):
    """(position, velocity, acceleration) at scalar time t for a single
    piecewise cubic with node arrays of shape (N,)."""
    times = spline.times
    n_seg = times.shape[-1] - 1
    i = jnp.clip(jnp.searchsorted(times, t, side="right") - 1, 0, n_seg - 1)
    t0, t1 = times[i], times[i + 1]
    a, b, c, d, dt = _hermite_coeffs(
        t0, spline.pos[i], spline.vel[i], t1, spline.pos[i + 1], spline.vel[i + 1]
    )
    s = jnp.clip((t - t0) / dt, 0.0, 1.0)
    pos = a + b * s + c * s * s + d * s * s * s
    vel = (b + 2.0 * c * s + 3.0 * d * s * s) / dt
    acc = (2.0 * c + 6.0 * d * s) / (dt * dt)
    return pos, vel, acc
