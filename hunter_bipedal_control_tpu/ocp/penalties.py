"""Soft-constraint penalty functions (closed-form value/grad/hess).

Parity: OCS2 ``RelaxedBarrierPenalty``, ``DoubleSidedPenalty``,
``QuadraticPenalty`` as configured by the reference
(legged_interface/src/LeggedInterface.cpp:122, 180-182, 333-356).

Each penalty returns (value, first, second derivative) so the SQP can build
Gauss-Newton Hessians without a second AD pass.
"""
from __future__ import annotations

import jax.numpy as jnp


def relaxed_barrier(h, mu, delta):
    """-mu ln(h) for h > delta, quadratic extension below (OCS2 formula).

    Returns (p, dp/dh, d2p/dh2).
    """
    safe_h = jnp.maximum(h, delta)
    log_branch = -mu * jnp.log(safe_h)
    dlog = -mu / safe_h
    d2log = mu / (safe_h * safe_h)

    z = (h - 2.0 * delta) / delta
    quad_branch = mu * 0.5 * (z * z - 1.0) - mu * jnp.log(delta)
    dquad = mu * z / delta
    d2quad = mu / (delta * delta) * jnp.ones_like(h)

    use_log = h > delta
    p = jnp.where(use_log, log_branch, quad_branch)
    dp = jnp.where(use_log, dlog, dquad)
    d2p = jnp.where(use_log, d2log, d2quad)
    return p, dp, d2p


def double_sided_relaxed_barrier(h, lower, upper, mu, delta):
    """DoubleSidedPenalty(lower, upper, RelaxedBarrierPenalty) — barrier on
    both (h - lower) and (upper - h)."""
    p1, d1, dd1 = relaxed_barrier(h - lower, mu, delta)
    p2, d2, dd2 = relaxed_barrier(upper - h, mu, delta)
    return p1 + p2, d1 - d2, dd1 + dd2


def quadratic(h, weight):
    """QuadraticPenalty: 0.5 * weight * h^2."""
    return 0.5 * weight * h * h, weight * h, weight * jnp.ones_like(h)
