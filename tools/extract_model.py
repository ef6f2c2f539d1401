"""Extract a robot model spec (JSON) from a URDF file.

The TPU framework consumes a compact JSON description of the floating-base
kinematic tree rather than parsing URDF at import time.  This tool plays the
role of Pinocchio's ``buildModelFromUrdf`` (used by the reference at
legged_interface/src/LeggedInterface.cpp:171-186): it reads the URDF, merges
fixed-joint subtrees into their moving parent (composite rigid bodies, the
same reduction Pinocchio performs), and records named fixed frames (feet,
imu) as operational frames.

Usage:
    python tools/extract_model.py <urdf> <out.json> [--contacts a,b,c,d]
"""
from __future__ import annotations

import argparse
import json
import math
import xml.etree.ElementTree as ET


def _floats(s, n=3, default=0.0):
    if s is None:
        return [default] * n
    return [float(x) for x in s.split()]


def rpy_to_matrix(rpy):
    r, p, y = rpy
    cr, sr = math.cos(r), math.sin(r)
    cp, sp = math.cos(p), math.sin(p)
    cy, sy = math.cos(y), math.sin(y)
    # R = Rz(y) @ Ry(p) @ Rx(r)
    return [
        [cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr],
        [sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr],
        [-sp, cp * sr, cp * cr],
    ]


def mat_mul(A, B):
    return [[sum(A[i][k] * B[k][j] for k in range(3)) for j in range(3)] for i in range(3)]


def mat_vec(A, v):
    return [sum(A[i][k] * v[k] for k in range(3)) for i in range(3)]


def mat_T(A):
    return [[A[j][i] for j in range(3)] for i in range(3)]


def vec_add(a, b):
    return [a[i] + b[i] for i in range(3)]


def vec_sub(a, b):
    return [a[i] - b[i] for i in range(3)]


def vec_scale(a, s):
    return [x * s for x in a]


def outer_shift(m, d):
    """Parallel-axis term m * (d.d I - d dT)."""
    dd = sum(x * x for x in d)
    return [[m * ((dd if i == j else 0.0) - d[i] * d[j]) for j in range(3)] for i in range(3)]


def mat_add(A, B):
    return [[A[i][j] + B[i][j] for j in range(3)] for i in range(3)]


class Inertial:
    """Mass, CoM and rotational inertia about the CoM, expressed in a link frame."""

    def __init__(self, mass, com, inertia_com):
        self.mass = mass
        self.com = com
        self.inertia = inertia_com  # 3x3 about com, link-frame axes

    @staticmethod
    def from_xml(elem):
        if elem is None:
            return Inertial(0.0, [0, 0, 0], [[0.0] * 3 for _ in range(3)])
        origin = elem.find("origin")
        xyz = _floats(origin.get("xyz") if origin is not None else None)
        rpy = _floats(origin.get("rpy") if origin is not None else None)
        mass = float(elem.find("mass").get("value"))
        ie = elem.find("inertia")
        ixx, ixy, ixz = float(ie.get("ixx")), float(ie.get("ixy")), float(ie.get("ixz"))
        iyy, iyz, izz = float(ie.get("iyy")), float(ie.get("iyz")), float(ie.get("izz"))
        I_local = [[ixx, ixy, ixz], [ixy, iyy, iyz], [ixz, iyz, izz]]
        R = rpy_to_matrix(rpy)
        # rotate inertia from inertial frame to link frame axes
        I_link = mat_mul(mat_mul(R, I_local), mat_T(R))
        return Inertial(mass, xyz, I_link)

    def transformed(self, R, p):
        """Express this inertial in a parent frame: x_parent = R x + p."""
        com_p = vec_add(mat_vec(R, self.com), p)
        I_p = mat_mul(mat_mul(R, self.inertia), mat_T(R))
        return Inertial(self.mass, com_p, I_p)

    def merged(self, other):
        m = self.mass + other.mass
        if m <= 0:
            return Inertial(0.0, [0, 0, 0], [[0.0] * 3 for _ in range(3)])
        com = vec_scale(
            vec_add(vec_scale(self.com, self.mass), vec_scale(other.com, other.mass)), 1.0 / m
        )
        I = mat_add(
            mat_add(self.inertia, outer_shift(self.mass, vec_sub(self.com, com))),
            mat_add(other.inertia, outer_shift(other.mass, vec_sub(other.com, com))),
        )
        return Inertial(m, com, I)


def extract(urdf_path, contacts, root_name=None):
    tree = ET.parse(urdf_path)
    robot = tree.getroot()

    links = {}
    for le in robot.findall("link"):
        links[le.get("name")] = Inertial.from_xml(le.find("inertial"))

    joints = []
    children = {}
    child_links = set()
    for je in robot.findall("joint"):
        parent = je.find("parent").get("link")
        child = je.find("child").get("link")
        if parent not in links or child not in links:
            continue  # e.g. commented-out world weld
        origin = je.find("origin")
        j = {
            "name": je.get("name"),
            "type": je.get("type"),
            "parent": parent,
            "child": child,
            "origin_xyz": _floats(origin.get("xyz") if origin is not None else None),
            "origin_rpy": _floats(origin.get("rpy") if origin is not None else None),
        }
        axis = je.find("axis")
        j["axis"] = _floats(axis.get("xyz")) if axis is not None else [0, 0, 1]
        limit = je.find("limit")
        if limit is not None:
            j["lower"] = float(limit.get("lower", "-1e9"))
            j["upper"] = float(limit.get("upper", "1e9"))
            j["effort"] = float(limit.get("effort", "1e9"))
            j["velocity"] = float(limit.get("velocity", "1e9"))
        joints.append(j)
        children.setdefault(parent, []).append(j)
        child_links.add(child)

    roots = [n for n in links if n not in child_links]
    root = root_name or (roots[0] if len(roots) == 1 else "base_link")

    # Traverse: moving links get an index; fixed subtrees merge into moving parent.
    out_links = []  # dicts
    out_joints = []
    out_frames = []
    link_index = {}

    def add_moving_link(name, inertial):
        link_index[name] = len(out_links)
        out_links.append({"name": name, "inertial": inertial})

    def walk(link_name, moving_ancestor, R_acc, p_acc):
        """R_acc/p_acc: transform from link frame to moving_ancestor frame."""
        for j in children.get(link_name, []):
            Rj = rpy_to_matrix(j["origin_rpy"])
            pj = j["origin_xyz"]
            if j["type"] in ("revolute", "continuous", "prismatic"):
                # new moving link; joint origin expressed in moving ancestor frame
                R_join = mat_mul(R_acc, Rj)
                p_join = vec_add(mat_vec(R_acc, pj), p_acc)
                out_joints.append(
                    {
                        "name": j["name"],
                        "type": j["type"],
                        "parent": link_index[moving_ancestor],
                        "origin_xyz": p_join,
                        "origin_rot": R_join,
                        "axis": j["axis"],
                        "lower": j.get("lower", -1e9),
                        "upper": j.get("upper", 1e9),
                        "effort": j.get("effort", 1e9),
                        "velocity": j.get("velocity", 1e9),
                        "child_link": j["child"],
                    }
                )
                add_moving_link(j["child"], links[j["child"]])
                walk(j["child"], j["child"], [[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]], [0.0, 0, 0])
            else:  # fixed: merge inertia into moving ancestor, record frame
                R_new = mat_mul(R_acc, Rj)
                p_new = vec_add(mat_vec(R_acc, pj), p_acc)
                idx = link_index[moving_ancestor]
                merged = out_links[idx]["inertial"].merged(
                    links[j["child"]].transformed(R_new, p_new)
                )
                out_links[idx]["inertial"] = merged
                out_frames.append(
                    {
                        "name": j["child"],
                        "parent": idx,
                        "origin_xyz": p_new,
                        "origin_rot": R_new,
                    }
                )
                walk(j["child"], moving_ancestor, R_new, p_new)

    add_moving_link(root, links[root])
    walk(root, root, [[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]], [0.0, 0, 0])

    spec = {
        "name": robot.get("name", "robot"),
        "root": root,
        "links": [
            {
                "name": l["name"],
                "mass": l["inertial"].mass,
                "com": l["inertial"].com,
                "inertia": l["inertial"].inertia,
            }
            for l in out_links
        ],
        "joints": out_joints,
        "frames": out_frames,
        "contacts": contacts,
    }
    return spec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("urdf")
    ap.add_argument("out")
    ap.add_argument(
        "--contacts",
        default="leg_l_f1_link,leg_r_f1_link,leg_l_f2_link,leg_r_f2_link",
        help="contact frame names in model order (ref ModelSettings.h:62-64)",
    )
    args = ap.parse_args()
    spec = extract(args.urdf, args.contacts.split(","))
    with open(args.out, "w") as f:
        json.dump(spec, f, indent=1)
    print(
        f"wrote {args.out}: {len(spec['links'])} links, {len(spec['joints'])} joints, "
        f"{len(spec['frames'])} frames, total mass "
        f"{sum(l['mass'] for l in spec['links']):.4f} kg"
    )


if __name__ == "__main__":
    main()
