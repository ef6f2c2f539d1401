"""Self-collision soft constraint (analytic capsule-segment distances).

Parity: the reference wires an ocs2_self_collision soft constraint
(LeggedInterface.cpp:452-490) with an *empty* collision pair list in its
shipped config (task.info:270-287), so it is inert in the product.  This
module provides the capability natively: segment-segment distances between
leg capsules, relaxed-barrier penalized, ready to enable via config.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..models.kinematics import KinData, fk
from ..models.robot import RobotModel
from . import penalties


class CollisionPair(NamedTuple):
    """A capsule on link_a vs a capsule on link_b (segment in link frame)."""

    link_a: int
    a0: jnp.ndarray  # (3,) segment start in link frame
    a1: jnp.ndarray
    radius_a: float
    link_b: int
    b0: jnp.ndarray
    b1: jnp.ndarray
    radius_b: float


def default_shin_pairs(model: RobotModel, dtype=jnp.float32) -> Sequence[CollisionPair]:
    """Left vs right shin/thigh capsules (the physically relevant pairs for
    a biped crossing its legs)."""
    def link(name):
        return model.link_names.index(name)

    seg = lambda z0, z1: (jnp.asarray([0.0, 0.0, z0], dtype), jnp.asarray([0.0, 0.0, z1], dtype))
    l3a, l3b = seg(0.0, -0.24)
    pairs = [
        CollisionPair(link("leg_l3_link"), l3a, l3b, 0.05,
                      link("leg_r3_link"), l3a, l3b, 0.05),
        CollisionPair(link("leg_l4_link"), l3a, l3b, 0.04,
                      link("leg_r4_link"), l3a, l3b, 0.04),
    ]
    return pairs


def _segment_distance(p0, p1, q0, q1):
    """Min distance between segments [p0,p1], [q0,q1] (branch-free clamp)."""
    d1 = p1 - p0
    d2 = q1 - q0
    r = p0 - q0
    a = d1 @ d1 + 1e-12
    e = d2 @ d2 + 1e-12
    b = d1 @ d2
    c = d1 @ r
    f = d2 @ r
    denom = a * e - b * b + 1e-12
    s = jnp.clip((b * f - c * e) / denom, 0.0, 1.0)
    t = jnp.clip((b * s + f) / e, 0.0, 1.0)
    s = jnp.clip((b * t - c) / a, 0.0, 1.0)
    closest_p = p0 + s * d1
    closest_q = q0 + t * d2
    return jnp.linalg.norm(closest_p - closest_q + 1e-12)


def pair_distances(model: RobotModel, kin: KinData,
                   pairs: Sequence[CollisionPair]) -> jnp.ndarray:
    """(n_pairs,) surface distances (negative = penetration)."""
    ds = []
    for p in pairs:
        Ra, pa = kin.R[p.link_a], kin.p[p.link_a]
        Rb, pb = kin.R[p.link_b], kin.p[p.link_b]
        d = _segment_distance(pa + Ra @ p.a0, pa + Ra @ p.a1,
                              pb + Rb @ p.b0, pb + Rb @ p.b1)
        ds.append(d - p.radius_a - p.radius_b)
    return jnp.stack(ds)


def self_collision_cost(model: RobotModel, x, pairs: Sequence[CollisionPair],
                        minimum_distance=0.05, mu=1e-2, delta=1e-3):
    """Relaxed-barrier penalty on (distance - minimumDistance) — the
    selfCollision soft constraint with task.info's mu/delta."""
    kin = fk(model, x[6:])
    d = pair_distances(model, kin, pairs) - minimum_distance
    p, _, _ = penalties.relaxed_barrier(d, mu, delta)
    return p.sum()


# ---------------------------------------------------------------------------
# OCP wiring (LeggedInterface.cpp:452-490): the constraint is assembled into
# the problem as a state-only relaxed-barrier soft term.  The reference ships
# an empty collisionPairs list (task.info:270-287) so the default here is
# params.collision = None (zero overhead); enabling is one config field.
# ---------------------------------------------------------------------------


class CollisionConfig(NamedTuple):
    """Stacked-array capsule pairs + penalty config (jit/vmap friendly)."""

    link_a: jnp.ndarray     # (P,) int32
    a0: jnp.ndarray         # (P,3) segment start in link-a frame
    a1: jnp.ndarray
    link_b: jnp.ndarray
    b0: jnp.ndarray
    b1: jnp.ndarray
    radius_sum: jnp.ndarray  # (P,) radius_a + radius_b
    min_distance: jnp.ndarray  # scalar (task.info minimumDistance)
    mu: jnp.ndarray            # relaxed-barrier mu (task.info:285)
    delta: jnp.ndarray         # relaxed-barrier delta (:286)


def make_collision_config(pairs: Sequence[CollisionPair], min_distance=0.05,
                          mu=1e-2, delta=1e-3, dtype=jnp.float32) -> CollisionConfig:
    """Defaults = the reference's selfCollision block (task.info:270-287:
    minimumDistance 0.05, mu 1e-2, delta 1e-3)."""
    import numpy as np

    return CollisionConfig(
        link_a=jnp.asarray(np.array([p.link_a for p in pairs]), jnp.int32),
        a0=jnp.stack([jnp.asarray(p.a0, dtype) for p in pairs]),
        a1=jnp.stack([jnp.asarray(p.a1, dtype) for p in pairs]),
        link_b=jnp.asarray(np.array([p.link_b for p in pairs]), jnp.int32),
        b0=jnp.stack([jnp.asarray(p.b0, dtype) for p in pairs]),
        b1=jnp.stack([jnp.asarray(p.b1, dtype) for p in pairs]),
        radius_sum=jnp.asarray(
            np.array([p.radius_a + p.radius_b for p in pairs]), dtype),
        min_distance=jnp.asarray(min_distance, dtype),
        mu=jnp.asarray(mu, dtype),
        delta=jnp.asarray(delta, dtype),
    )


def default_collision_config(model: RobotModel, dtype=jnp.float32) -> CollisionConfig:
    return make_collision_config(default_shin_pairs(model, dtype), dtype=dtype)


def _segment_distances_vec(p0, p1, q0, q1):
    """(P,) min distances between segment batches (branch-free clamp)."""
    d1 = p1 - p0
    d2 = q1 - q0
    r = p0 - q0
    dot = lambda a, b: jnp.sum(a * b, axis=-1)
    a = dot(d1, d1) + 1e-12
    e = dot(d2, d2) + 1e-12
    b = dot(d1, d2)
    c = dot(d1, r)
    f = dot(d2, r)
    denom = a * e - b * b + 1e-12
    s = jnp.clip((b * f - c * e) / denom, 0.0, 1.0)
    t = jnp.clip((b * s + f) / e, 0.0, 1.0)
    s = jnp.clip((b * t - c) / a, 0.0, 1.0)
    cp = p0 + s[..., None] * d1
    cq = q0 + t[..., None] * d2
    return jnp.sqrt(dot(cp - cq, cp - cq) + 1e-12)


def surface_margins(model: RobotModel, cfg: CollisionConfig, x) -> jnp.ndarray:
    """(P,) distance - radii - minimumDistance at MPC state x (>= 0 feasible)."""
    kin = fk(model, x[6:])
    Ra, pa = kin.R[cfg.link_a], kin.p[cfg.link_a]     # (P,3,3), (P,3)
    Rb, pb = kin.R[cfg.link_b], kin.p[cfg.link_b]
    rot = lambda R, v: jnp.einsum("pij,pj->pi", R, v)
    d = _segment_distances_vec(pa + rot(Ra, cfg.a0), pa + rot(Ra, cfg.a1),
                               pb + rot(Rb, cfg.b0), pb + rot(Rb, cfg.b1))
    return d - cfg.radius_sum - cfg.min_distance


def collision_penalty_batch(model: RobotModel, cfg: CollisionConfig, xs):
    """(...,) summed relaxed-barrier penalty over pairs, any leading axes."""
    S = xs.shape[:-1]
    flat = xs.reshape(-1, xs.shape[-1])

    def one(x):
        h = surface_margins(model, cfg, x)
        p, _, _ = penalties.relaxed_barrier(h, cfg.mu, cfg.delta)
        return p.sum()

    return jax.vmap(one)(flat).reshape(S)


def collision_quadratic_batch(model: RobotModel, cfg: CollisionConfig, xs):
    """(p (...), qx (...,nx), Qxx (...,nx,nx)) Gauss-Newton contributions of
    the self-collision soft constraint (penalty Hessian p'' J^T J, the same
    PSD choice as the other soft rows)."""
    S = xs.shape[:-1]
    nx = xs.shape[-1]
    flat = xs.reshape(-1, nx)

    def one(x):
        h = surface_margins(model, cfg, x)
        J = jax.jacfwd(lambda x_: surface_margins(model, cfg, x_))(x)  # (P,nx)
        p, dp, d2p = penalties.relaxed_barrier(h, cfg.mu, cfg.delta)
        qx = J.T @ dp
        Qxx = jnp.einsum("ri,r,rj->ij", J, d2p, J)
        return p.sum(), qx, Qxx

    p, qx, Qxx = jax.vmap(one)(flat)
    return p.reshape(S), qx.reshape(*S, nx), Qxx.reshape(*S, nx, nx)
