"""Forward kinematics and frame Jacobians (world-aligned convention).

TPU-native equivalent of the Pinocchio calls used throughout the reference
(forwardKinematics / updateFramePlacements / getFrameJacobian with
``LOCAL_WORLD_ALIGNED``, e.g. legged_wbc/src/WbcBase.cpp:85-116 and
legged_estimation/src/LinearKalmanFilter.cpp:98-102).

Everything is branch-free and fixed-shape: the kinematic chain is unrolled
as a static Python loop over the (fixed, small) joint count and Jacobians
use a precomputed ancestor mask instead of tree traversal, so the whole
module vmaps over scenario batches and jits into fused XLA.

Jacobian row convention: rows 0:3 linear, 3:6 angular (matches Pinocchio's
``getFrameJacobian`` top/bottom split used by the reference).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .robot import RobotModel
from .spatial import axis_angle_rotation, euler_rate_map_zyx, rotation_zyx, skew


class KinData(NamedTuple):
    """World placement of every moving link + joint axes (one configuration)."""

    R: jnp.ndarray            # (n_links, 3, 3) world_R_link
    p: jnp.ndarray            # (n_links, 3) link frame origin in world
    joint_axis_w: jnp.ndarray  # (nj, 3) joint axis in world
    joint_pos_w: jnp.ndarray   # (nj, 3) joint anchor point in world
    com_w: jnp.ndarray         # (n_links, 3) link CoM in world
    E: jnp.ndarray             # (3, 3) euler-rate map at this configuration


def fk_ad(model: RobotModel, q: jnp.ndarray) -> KinData:
    """Forward kinematics for all links, plain AD-able body. q: (6+nj,).

    Use this variant only to differentiate with respect to MODEL parameters
    (link geometry/mass studies); the product path uses ``fk``, whose custom
    JVP is exact in q but rejects model tangents."""
    base_p = q[0:3]
    base_R = rotation_zyx(q[3:6])
    qj = q[6:]

    Rs = [None] * model.n_links
    ps = [None] * model.n_links
    Rs[0], ps[0] = base_R, base_p
    axis_w = [None] * model.nj
    anchor_w = [None] * model.nj

    for j in range(model.nj):
        parent = int(model.joint_parent[j])
        child = int(model.joint_child[j])
        Rp, pp = Rs[parent], ps[parent]
        R_origin = Rp @ model.joint_origin_rot[j]
        p_origin = pp + Rp @ model.joint_origin_pos[j]
        a_w = R_origin @ model.joint_axis[j]
        Rs[child] = R_origin @ axis_angle_rotation(model.joint_axis[j], qj[j])
        ps[child] = p_origin
        axis_w[j] = a_w
        anchor_w[j] = p_origin

    R = jnp.stack(Rs)
    p = jnp.stack(ps)
    com_w = p + jnp.einsum("kij,kj->ki", R, model.link_com)
    return KinData(
        R=R,
        p=p,
        joint_axis_w=jnp.stack(axis_w),
        joint_pos_w=jnp.stack(anchor_w),
        com_w=com_w,
        E=euler_rate_map_zyx(q[3:6]),
    )


def fk(model: RobotModel, q: jnp.ndarray) -> KinData:
    """Forward kinematics for all links. q: (6+nj,).

    Carries a custom JVP in q: FK tangents have exact closed forms in terms
    of the *primal* kinematics (world point velocity = point Jacobian @ q̇;
    Ṙ = ω× R; world-vector rate = ω_parent × vec — exact because v ≡ q̇ in
    the zyx-euler-rate parameterization).  This turns every jacfwd through
    the sequential 10-joint chain (the SQP knot linearization runs 13
    tangents of it per knot — the solver's dominant cost) into a handful of
    batched matvecs against Jacobians the primal pass already builds.
    The model is closed over: differentiating w.r.t. model parameters
    through this function raises (use ``fk_ad``)."""

    @jax.custom_jvp
    def _fk_q(q_):
        return fk_ad(model, q_)

    def _jvp(primals, tangents):
        """Exact FK tangents from primal-pass Jacobians.

        dq is a generalized-velocity-like tangent [dpos(3), deuler(3),
        dqj(nj)]:
          - link origins / CoMs: linear point-Jacobian rows @ dq
          - link rotations:      dR_l = skew(om_l) R_l, om_l = angular rows @ dq
          - joint axes/anchors:  rotate/translate with the PARENT link
          - E map:               closed-form jvp of euler_rate_map_zyx
        """
        import numpy as np

        (q_,), (dq,) = primals, tangents
        kin = _fk_q(q_)

        Jl = _point_jacobians(model, kin, kin.p, np.arange(model.n_links))
        dp = jnp.einsum("lij,j->li", Jl[:, 0:3, :], dq)
        om = jnp.einsum("lij,j->li", Jl[:, 3:6, :], dq)                  # (L,3)
        dR = jnp.einsum("lij,ljk->lik", _skew_batch(om), kin.R)

        parents = np.asarray(model.joint_parent)
        Janc = _point_jacobians(model, kin, kin.joint_pos_w, parents)
        danchor = jnp.einsum("lij,j->li", Janc[:, 0:3, :], dq)
        daxis = jnp.cross(om[parents], kin.joint_axis_w)

        Jcom = link_com_jacobians(model, kin)
        dcom = jnp.einsum("lij,j->li", Jcom[:, 0:3, :], dq)

        from .spatial import euler_rate_map_zyx

        _, dE = jax.jvp(euler_rate_map_zyx, (q_[3:6],), (dq[3:6],))

        return kin, KinData(R=dR, p=dp, joint_axis_w=daxis,
                            joint_pos_w=danchor, com_w=dcom, E=dE)

    _fk_q.defjvp(_jvp)
    return _fk_q(q)


def frame_placements(model: RobotModel, kin: KinData):
    """World rotation/position of every named (fixed) frame: ((nf,3,3), (nf,3))."""
    Rp = kin.R[model.frame_parent]
    pp = kin.p[model.frame_parent]
    R = jnp.einsum("fij,fjk->fik", Rp, model.frame_rot)
    p = pp + jnp.einsum("fij,fj->fi", Rp, model.frame_pos)
    return R, p


def contact_positions(model: RobotModel, kin: KinData) -> jnp.ndarray:
    """(nc, 3) world positions of the contact frames (toe/heel points)."""
    _, p = frame_placements(model, kin)
    return p[model.contact_frame_ids]


def _point_jacobians(model: RobotModel, kin: KinData, points_w: jnp.ndarray,
                     link_ids) -> jnp.ndarray:
    """Jacobians of world points rigidly attached to links.

    points_w: (P, 3) world points; link_ids: (P,) static int array.
    Returns (P, 6, nv) with rows [linear; angular], LOCAL_WORLD_ALIGNED.
    """
    nv = model.nv
    P = points_w.shape[0]
    mask = jnp.asarray(model.ancestor_mask[link_ids], dtype=points_w.dtype)  # (P, nj)

    # joint columns
    r = points_w[:, None, :] - kin.joint_pos_w[None, :, :]          # (P, nj, 3)
    lin_j = jnp.cross(kin.joint_axis_w[None, :, :], r) * mask[:, :, None]  # (P, nj, 3)
    ang_j = jnp.broadcast_to(kin.joint_axis_w[None], (P, model.nj, 3)) * mask[:, :, None]

    # base columns
    rb = points_w - kin.p[0][None, :]                                # (P, 3)
    lin_base_trans = jnp.broadcast_to(jnp.eye(3, dtype=points_w.dtype)[None], (P, 3, 3))
    lin_base_rot = -jnp.einsum("pij,jk->pik", _skew_batch(rb), kin.E)  # (P, 3, 3)
    ang_base_rot = jnp.broadcast_to(kin.E[None], (P, 3, 3))

    lin = jnp.concatenate(
        [lin_base_trans, lin_base_rot, jnp.swapaxes(lin_j, 1, 2)], axis=2
    )  # (P, 3, nv)
    ang = jnp.concatenate(
        [jnp.zeros((P, 3, 3), points_w.dtype), ang_base_rot, jnp.swapaxes(ang_j, 1, 2)],
        axis=2,
    )
    return jnp.concatenate([lin, ang], axis=1)  # (P, 6, nv)


def _skew_batch(v):
    """(P,3) -> (P,3,3)"""
    z = jnp.zeros_like(v[:, 0])
    return jnp.stack(
        [
            jnp.stack([z, -v[:, 2], v[:, 1]], axis=-1),
            jnp.stack([v[:, 2], z, -v[:, 0]], axis=-1),
            jnp.stack([-v[:, 1], v[:, 0], z], axis=-1),
        ],
        axis=1,
    )


def contact_jacobians(model: RobotModel, kin: KinData) -> jnp.ndarray:
    """(nc, 6, nv) frame Jacobians of the contact frames."""
    pts = contact_positions(model, kin)
    link_ids = model.frame_parent[model.contact_frame_ids]
    return _point_jacobians(model, kin, pts, link_ids)


def base_jacobian(model: RobotModel, kin: KinData) -> jnp.ndarray:
    """(6, nv) frame Jacobian of the base link (WbcBase.cpp:112-116)."""
    import numpy as np

    J = _point_jacobians(model, kin, kin.p[0:1], np.array([0]))
    return J[0]


def link_com_jacobians(model: RobotModel, kin: KinData) -> jnp.ndarray:
    """(n_links, 6, nv) Jacobians at each link CoM (for CRBA / CMM)."""
    import numpy as np

    link_ids = np.arange(model.n_links)
    return _point_jacobians(model, kin, kin.com_w, link_ids)


# ---------------------------------------------------------------------------
# velocity-level helpers (time derivatives via AD: v == dq/dt exactly in the
# euler-rate parameterization, so d/dt F(q) = jvp(F, q, v))
# ---------------------------------------------------------------------------

def contact_velocities(model: RobotModel, q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(nc, 3) world-frame linear velocities of contact points."""
    J = contact_jacobians(model, fk(model, q))
    return jnp.einsum("cij,j->ci", J[:, 0:3, :], v)


def contact_jacobians_dot(model: RobotModel, q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(nc, 6, nv) dJ/dt — exact, replaces Pinocchio's
    computeJointJacobiansTimeVariation (WbcBase.cpp:100-109)."""
    f = lambda q_: contact_jacobians(model, fk(model, q_))
    return jax.jvp(f, (q,), (v,))[1]


def base_jacobian_dot(model: RobotModel, q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    f = lambda q_: base_jacobian(model, fk(model, q_))
    return jax.jvp(f, (q,), (v,))[1]
