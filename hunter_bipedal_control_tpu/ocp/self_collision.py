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
