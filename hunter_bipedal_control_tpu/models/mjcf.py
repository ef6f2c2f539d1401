"""Build a RobotModel from the reference's MuJoCo MJCF (hunter.xml).

The reference's ground-truth physics is the standalone MuJoCo 3.0.1 app
(mujoco/src/main.cc:243-430) simulating mujoco/model/hunter/hunter.xml.
This module parses that MJCF with the installed `mujoco` package and emits
our RobotModel, so every kinematics/dynamics algorithm in this package can
be golden-tested against MuJoCo's own mj_fullM / qfrc_bias / site
positions ON IDENTICAL PARAMETERS (decoupled from URDF-vs-MJCF parameter
drift, which is checked separately).

Conventions handled here:
  - mjModel body tree -> moving links (base + hinge-joint chain); bodies
    without joints (the 10 g toe/heel bodies) are merged into their moving
    parent (mass, CoM, parallel-axis inertia) and become named frames —
    exactly what tools/extract_model.py does with the URDF's fixed links.
  - mj inertial frames (body_ipos / body_iquat / diagonal body_inertia)
    are rotated into link axes about the CoM.
  - sites become frames as well (`imu` -> "imu_link" to match the URDF
    frame naming).

`mujoco` is imported lazily: the package has no hard dependency on it.
"""
from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from .robot import RobotModel

# URDF-compatible contact order: [L_toe, R_toe, L_heel, R_heel]
# (ModelSettings.h:62-64 contactNames3DoF; common/Types.h:48-51)
_CONTACTS = ("leg_l_f1_link", "leg_r_f1_link", "leg_l_f2_link", "leg_r_f2_link")

# Ground-truth MJCF (the reference's own model, read at runtime — never
# copied).  Override with HUNTER_MJCF_PATH when the reference checkout
# lives elsewhere.
DEFAULT_MJCF = os.environ.get(
    "HUNTER_MJCF_PATH", "/root/reference/mujoco/model/hunter/hunter.xml")


def _quat_to_rot(q):
    """(w,x,y,z) -> 3x3 rotation matrix (numpy, f64)."""
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def load_mj_model(xml_path: str = DEFAULT_MJCF, floor: bool = False,
                  timestep: float | None = None):
    """Load an mjModel from the reference MJCF, stripping the visual mesh
    geoms/assets (several STLs are not shipped; they carry no physics —
    density=0, contype=0).  With floor=True, wraps the robot in a minimal
    scene with a ground plane (the physics content of hunter_scene.xml)."""
    import re

    import mujoco

    with open(xml_path) as f:
        xml = f.read()
    xml = re.sub(r"<mesh[^>]*/>", "", xml)
    xml = re.sub(r'<geom class="visual"[^>]*/>', "", xml)
    if floor:
        extra = '<worldbody><geom name="floor" type="plane" size="0 0 0.05"/></worldbody>'
        xml = xml.replace("</mujoco>", extra + "</mujoco>")
    if timestep is not None:
        xml = xml.replace("<mujoco model=\"hunter\">",
                          f"<mujoco model=\"hunter\"><option timestep=\"{timestep}\"/>")
    return mujoco.MjModel.from_xml_string(xml)


def model_from_mjcf(xml_path: str = DEFAULT_MJCF, dtype=jnp.float64) -> RobotModel:
    import mujoco

    m = load_mj_model(xml_path)

    # ---- classify bodies ------------------------------------------------
    # moving link = world-attached free-joint body (the base) or a body with
    # a hinge joint; everything else merges into its nearest moving ancestor
    nbody = m.nbody
    is_moving = np.zeros(nbody, bool)
    body_joint = np.full(nbody, -1, np.int64)  # hinge joint id per moving body
    for b in range(1, nbody):
        if m.body_jntnum[b] == 0:
            continue
        j = int(m.body_jntadr[b])
        jt = int(m.jnt_type[j])
        if jt == int(mujoco.mjtJoint.mjJNT_FREE):
            is_moving[b] = True  # base
        elif jt == int(mujoco.mjtJoint.mjJNT_HINGE):
            assert m.body_jntnum[b] == 1, "one hinge per body expected"
            assert np.allclose(m.jnt_pos[j], 0.0), "hinge anchor must be the body origin"
            is_moving[b] = True
            body_joint[b] = j
        else:
            raise ValueError(f"unsupported joint type {jt} on body {b}")

    moving = [b for b in range(1, nbody) if is_moving[b]]
    link_of_body = {b: i for i, b in enumerate(moving)}  # link index per mj body
    n_links = len(moving)

    def moving_ancestor(b):
        p = int(m.body_parentid[b])
        while p != 0 and not is_moving[p]:
            p = int(m.body_parentid[p])
        return p

    # fixed transform of body b relative to its nearest moving ancestor
    def fixed_transform(b):
        R = np.eye(3)
        p = np.zeros(3)
        chain = []
        cur = b
        while cur != 0 and not (is_moving[cur] and cur != b):
            chain.append(cur)
            cur = int(m.body_parentid[cur])
        for c in reversed(chain):
            Rc = _quat_to_rot(m.body_quat[c])
            p = p + R @ m.body_pos[c]
            R = R @ Rc
        return R, p

    # ---- link inertial parameters (with fixed-children merge) ----------
    link_mass = np.zeros(n_links)
    link_com = np.zeros((n_links, 3))
    link_inertia = np.zeros((n_links, 3, 3))
    merged = {i: [] for i in range(n_links)}  # link -> [(mass, com, I)] in link frame
    frames = []  # (name, link, pos, rot)

    for b in range(1, nbody):
        Ri = _quat_to_rot(m.body_iquat[b])
        I_com = Ri @ np.diag(m.body_inertia[b]) @ Ri.T  # link axes, about CoM
        if is_moving[b]:
            li = link_of_body[b]
            merged[li].append((float(m.body_mass[b]), m.body_ipos[b].copy(), I_com))
        else:
            anc = moving_ancestor(b)
            li = link_of_body[anc]
            R_f, p_f = fixed_transform(b)
            com_in_anc = p_f + R_f @ m.body_ipos[b]
            I_in_anc = R_f @ I_com @ R_f.T
            merged[li].append((float(m.body_mass[b]), com_in_anc, I_in_anc))
            name = m.body(b).name
            frames.append((name, li, p_f, R_f))

    for li in range(n_links):
        parts = merged[li]
        mass = sum(p[0] for p in parts)
        com = sum(p[0] * p[1] for p in parts) / mass
        inertia = np.zeros((3, 3))
        for mm_, c_, I_ in parts:
            d = c_ - com
            inertia += I_ + mm_ * (np.dot(d, d) * np.eye(3) - np.outer(d, d))
        link_mass[li] = mass
        link_com[li] = com
        link_inertia[li] = inertia

    # ---- joints ---------------------------------------------------------
    # topology: our link index 0 is the base; joints in mj order (depth-first,
    # matching the URDF spec's l1..l5, r1..r5)
    joint_bodies = [b for b in moving if body_joint[b] >= 0]
    nj = len(joint_bodies)
    joint_parent = np.zeros(nj, np.int32)
    joint_child = np.zeros(nj, np.int32)
    joint_axis = np.zeros((nj, 3))
    joint_origin_pos = np.zeros((nj, 3))
    joint_origin_rot = np.zeros((nj, 3, 3))
    joint_lower = np.zeros(nj)
    joint_upper = np.zeros(nj)
    joint_names = []
    for k, b in enumerate(joint_bodies):
        j = int(body_joint[b])
        par = moving_ancestor(b)
        # link index convention: base is 0, link i is moving[i]
        joint_parent[k] = link_of_body[par]
        joint_child[k] = link_of_body[b]
        joint_axis[k] = m.jnt_axis[j]
        joint_origin_pos[k] = m.body_pos[b]
        joint_origin_rot[k] = _quat_to_rot(m.body_quat[b])
        joint_lower[k], joint_upper[k] = m.jnt_range[j]
        joint_names.append(m.joint(j).name)

    # ancestor mask
    parent_of_link = np.full(n_links, -1, np.int32)
    joint_of_link = np.full(n_links, -1, np.int32)
    for k in range(nj):
        parent_of_link[joint_child[k]] = joint_parent[k]
        joint_of_link[joint_child[k]] = k
    ancestor_mask = np.zeros((n_links, nj))
    for l in range(n_links):
        cur = l
        while cur > 0:
            ancestor_mask[l, joint_of_link[cur]] = 1.0
            cur = parent_of_link[cur]

    # ---- frames ---------------------------------------------------------
    # sites (imu site -> "imu_link" for URDF-name compatibility)
    for s in range(m.nsite):
        b = int(m.site_bodyid[s])
        anc = b if is_moving[b] else moving_ancestor(b)
        R_f, p_f = (np.eye(3), np.zeros(3)) if b == anc else fixed_transform(b)
        name = m.site(s).name
        if name == "imu":
            name = "imu_link"
        R_site = _quat_to_rot(m.site_quat[s])
        frames.append((name + ("" if name == "imu_link" else "_site"),
                       link_of_body[anc] if anc != 0 else 0,
                       p_f + R_f @ m.site_pos[s], R_f @ R_site))

    frame_names = tuple(f[0] for f in frames)
    frame_parent = np.array([f[1] for f in frames], np.int32)
    frame_pos = np.stack([f[2] for f in frames])
    frame_rot = np.stack([f[3] for f in frames])
    contact_frame_ids = np.array([frame_names.index(c) for c in _CONTACTS], np.int32)

    arr = lambda x: jnp.asarray(np.asarray(x, np.float64), dtype=dtype)
    return RobotModel(
        nj=nj,
        n_links=n_links,
        joint_parent=joint_parent,
        joint_child=joint_child,
        ancestor_mask=ancestor_mask,
        link_names=tuple(m.body(b).name for b in moving),
        joint_names=tuple(joint_names),
        frame_names=frame_names,
        frame_parent=frame_parent,
        contact_frame_ids=contact_frame_ids,
        contact_names=_CONTACTS,
        joint_origin_pos=arr(joint_origin_pos),
        joint_origin_rot=arr(joint_origin_rot),
        joint_axis=arr(joint_axis),
        link_mass=arr(link_mass),
        link_com=arr(link_com),
        link_inertia=arr(link_inertia),
        frame_pos=arr(frame_pos),
        frame_rot=arr(frame_rot),
        joint_lower=arr(joint_lower),
        joint_upper=arr(joint_upper),
        joint_effort=arr(np.full(nj, 100.0)),   # MJCF ctrlrange ±100
        joint_vel_limit=arr(np.full(nj, 20.0)),
        total_mass=arr(link_mass.sum()),
    )


# ---------------------------------------------------------------------------
# q/v mapping between our coordinates and MuJoCo's
# ---------------------------------------------------------------------------

def q_to_mj(q):
    """Our q = [pos(3), zyx euler(3), joints] -> mj qpos = [pos, quat wxyz, joints]."""
    from .spatial import zyx_to_quat

    quat_xyzw = np.asarray(zyx_to_quat(jnp.asarray(q[3:6])))
    quat_wxyz = np.array([quat_xyzw[3], quat_xyzw[0], quat_xyzw[1], quat_xyzw[2]])
    return np.concatenate([np.asarray(q[0:3]), quat_wxyz, np.asarray(q[6:])])


def v_to_mj(q, v):
    """Our v = [world lin vel, zyx euler rates, joint vel] -> mj qvel
    = [world lin vel, BODY-LOCAL angular vel, joint vel] (MuJoCo free-joint
    convention, verified in tests/test_mujoco_model.py)."""
    from .spatial import global_angular_velocity_from_euler_rates, rotation_zyx

    zyx = jnp.asarray(q[3:6])
    om_w = global_angular_velocity_from_euler_rates(zyx, jnp.asarray(v[3:6]))
    om_l = rotation_zyx(zyx).T @ om_w
    return np.concatenate([np.asarray(v[0:3]), np.asarray(om_l), np.asarray(v[6:])])


def mj_to_q_v(qpos, qvel):
    """mj (qpos, qvel) -> our (q, v)."""
    from .spatial import (
        euler_rates_from_local_angular_velocity,
        quat_to_zyx,
    )

    quat_wxyz = qpos[3:7]
    quat_xyzw = jnp.asarray([quat_wxyz[1], quat_wxyz[2], quat_wxyz[3], quat_wxyz[0]])
    zyx = quat_to_zyx(quat_xyzw)
    dzyx = euler_rates_from_local_angular_velocity(zyx, jnp.asarray(qvel[3:6]))
    q = np.concatenate([np.asarray(qpos[0:3]), np.asarray(zyx), np.asarray(qpos[7:])])
    v = np.concatenate([np.asarray(qvel[0:3]), np.asarray(dzyx), np.asarray(qvel[6:])])
    return q, v


def velocity_map_to_mj_jnp(q):
    """T(q) with v_mj = T v_ours (block-diag: I3, R^T W(zyx), I_nj), where
    W maps zyx euler rates to the world angular velocity.  Pure jnp — AD
    through it gives the exact Tdot needed to map accelerations."""
    from .spatial import euler_rate_map_zyx, rotation_zyx

    zyx = q[3:6]
    W = euler_rate_map_zyx(zyx)      # omega_world = W @ dzyx
    R = rotation_zyx(zyx)
    nv = q.shape[0]
    T = jnp.eye(nv, dtype=q.dtype)
    return T.at[3:6, 3:6].set(R.T @ W)


def velocity_map_to_mj(q):
    return np.asarray(velocity_map_to_mj_jnp(jnp.asarray(q)))
