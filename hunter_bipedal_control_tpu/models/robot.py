"""Robot model container: the fixed kinematic tree as JAX-ready arrays.

This is the TPU-native replacement of Pinocchio's ``Model`` +
``CentroidalModelInfo`` (reference usage: legged_interface/src/
LeggedInterface.cpp:188-200).  The tree is loaded once from a JSON spec
(produced by ``tools/extract_model.py`` from a URDF) and stored as static
numpy metadata + jnp parameter arrays, so every kinematics/dynamics function
is a pure function of ``(model, q, v)`` that jit/vmap cleanly.

Conventions (see models/spatial.py):
    q = [base pos world (3), base ZYX euler (3), joint angles (nj)]
    v = [base lin vel world (3), euler rates (3), joint velocities (nj)]
"""
from __future__ import annotations

import json
import os
from typing import NamedTuple, Tuple

import numpy as np
import jax.numpy as jnp

_ASSET_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "assets")

GRAVITY = 9.81


class RobotModel(NamedTuple):
    """Fixed-topology floating-base model.  All leaves are jnp arrays; the
    integer topology fields are static numpy arrays (hashable via id for jit
    closure; pass the model as a closure constant, not a traced argument)."""

    # --- static topology (numpy, not traced) ---
    nj: int                     # number of actuated joints
    n_links: int                # number of moving links incl. base (index 0)
    joint_parent: np.ndarray    # (nj,) parent link index of each joint
    joint_child: np.ndarray     # (nj,) child link index (== joint index + 1 in topo order)
    ancestor_mask: np.ndarray   # (n_links, nj) 1.0 if joint j is on path root->link
    link_names: Tuple[str, ...]
    joint_names: Tuple[str, ...]
    frame_names: Tuple[str, ...]
    frame_parent: np.ndarray    # (nf,) parent link index per named frame
    contact_frame_ids: np.ndarray  # (nc,) indices into frames for contact points
    contact_names: Tuple[str, ...]

    # --- parameters (jnp) ---
    joint_origin_pos: jnp.ndarray  # (nj, 3) joint origin in parent link frame
    joint_origin_rot: jnp.ndarray  # (nj, 3, 3)
    joint_axis: jnp.ndarray        # (nj, 3) axis in child link frame
    link_mass: jnp.ndarray         # (n_links,)
    link_com: jnp.ndarray          # (n_links, 3) CoM in link frame
    link_inertia: jnp.ndarray      # (n_links, 3, 3) about CoM, link axes
    frame_pos: jnp.ndarray         # (nf, 3) frame origin in parent link frame
    frame_rot: jnp.ndarray         # (nf, 3, 3)
    joint_lower: jnp.ndarray       # (nj,)
    joint_upper: jnp.ndarray       # (nj,)
    joint_effort: jnp.ndarray      # (nj,)
    joint_vel_limit: jnp.ndarray   # (nj,)
    total_mass: jnp.ndarray        # scalar

    @property
    def nq(self) -> int:
        return 6 + self.nj

    @property
    def nv(self) -> int:
        return 6 + self.nj

    @property
    def num_contacts(self) -> int:
        return int(self.contact_frame_ids.shape[0])


def load_model(spec_path: str | None = None, dtype=jnp.float32) -> RobotModel:
    """Load a RobotModel from a JSON spec (default: bundled Hunter biped)."""
    if spec_path is None:
        spec_path = os.path.join(_ASSET_DIR, "hunter_model.json")
    with open(spec_path) as f:
        spec = json.load(f)

    links = spec["links"]
    joints = spec["joints"]
    frames = spec["frames"]
    n_links = len(links)
    nj = len(joints)

    link_index = {l["name"]: i for i, l in enumerate(links)}
    joint_child = np.array([link_index[j["child_link"]] for j in joints], dtype=np.int32)
    joint_parent = np.array([j["parent"] for j in joints], dtype=np.int32)

    # ancestor mask: joint j moves link k iff child(j) is an ancestor of k (or k itself)
    # links are in topo order; walk up via joint_parent
    parent_of_link = np.full(n_links, -1, dtype=np.int32)
    joint_of_link = np.full(n_links, -1, dtype=np.int32)
    for j in range(nj):
        parent_of_link[joint_child[j]] = joint_parent[j]
        joint_of_link[joint_child[j]] = j
    ancestor_mask = np.zeros((n_links, nj), dtype=np.float64)
    for k in range(n_links):
        cur = k
        while cur != 0 and cur != -1:
            ancestor_mask[k, joint_of_link[cur]] = 1.0
            cur = parent_of_link[cur]

    frame_parent = np.array([f["parent"] for f in frames], dtype=np.int32)
    frame_names = tuple(f["name"] for f in frames)
    contact_names = tuple(spec["contacts"])
    contact_frame_ids = np.array([frame_names.index(c) for c in contact_names], dtype=np.int32)

    def arr(x):
        return jnp.asarray(np.array(x, dtype=np.float64), dtype=dtype)

    model = RobotModel(
        nj=nj,
        n_links=n_links,
        joint_parent=joint_parent,
        joint_child=joint_child,
        ancestor_mask=ancestor_mask,
        link_names=tuple(l["name"] for l in links),
        joint_names=tuple(j["name"] for j in joints),
        frame_names=frame_names,
        frame_parent=frame_parent,
        contact_frame_ids=contact_frame_ids,
        contact_names=contact_names,
        joint_origin_pos=arr([j["origin_xyz"] for j in joints]),
        joint_origin_rot=arr([j["origin_rot"] for j in joints]),
        joint_axis=arr([j["axis"] for j in joints]),
        link_mass=arr([l["mass"] for l in links]),
        link_com=arr([l["com"] for l in links]),
        link_inertia=arr([l["inertia"] for l in links]),
        frame_pos=arr([f["origin_xyz"] for f in frames]),
        frame_rot=arr([f["origin_rot"] for f in frames]),
        joint_lower=arr([j["lower"] for j in joints]),
        joint_upper=arr([j["upper"] for j in joints]),
        joint_effort=arr([j["effort"] for j in joints]),
        joint_vel_limit=arr([j["velocity"] for j in joints]),
        total_mass=arr(sum(l["mass"] for l in links)),
    )
    return model
