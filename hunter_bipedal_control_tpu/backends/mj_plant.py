"""Host-side MuJoCo plant — the reference's ground-truth physics engine.

The reference simulates hunter.xml in a standalone MuJoCo 3.0.1 process
(mujoco/src/main.cc:266-430) bridged over LCM UDP; the PD+feedforward motor
law is applied inside the sim at every mj_step (``mycontroller``,
main.cc:243-248), and the controller's 500 Hz loop exchanges LowState/LowCmd
(legged_examples/legged_mujoco/src/LeggedMujocoSim.cpp:29-67).

TPU-native, the JAX controller stays jitted and this plant runs in-process
on the host CPU: `step()` advances one 500 Hz control tick under one hybrid
joint command (re-evaluating the PD law each physics substep, exactly like
``mycontroller``), and `sensors()` exposes what LowState carries — IMU
quaternion / local angular velocity / local linear acceleration, joint
positions/velocities — plus ground-truth pose and per-foot contact forces
for validation telemetry.

This is the cross-engine oracle for the in-graph `fullorder` backend: same
robot, same command interface, independent contact/integration code.
"""
from __future__ import annotations

import numpy as np

from ..models import mjcf

# contact order [L_toe, R_toe, L_heel, R_heel] (ModelSettings.h:62-64)
_FOOT_BODIES = ("leg_l_f1_link", "leg_r_f1_link", "leg_l_f2_link", "leg_r_f2_link")
# ground contact actually happens through the foot-sole box on l5/r5 (the
# f1/f2 spheres are 1 mm markers); attribute sole contacts to toe/heel by
# proximity to the f1/f2 body positions
_SOLE_BODIES = ("leg_l5_link", "leg_r5_link")

DEFAULT_Q0 = np.array(
    # InitRobotState (mujoco/src/main.cc:215-240): z=0.63, default joints
    [0.0, 0.0, 0.63, 0.0, 0.0, 0.0,
     0.10, 0.00, 0.40, 0.93, 0.53, -0.10, 0.00, -0.40, 0.93, -0.53]
)


class MjPlant:
    """In-process MuJoCo plant stepping the reference hunter.xml.

    control_dt: one `step()` = one 500 Hz controller tick.
    timestep:   physics substep (reference runs MuJoCo's default 0.002;
                we default to 0.001 for headroom under stiff swing PD).
    """

    def __init__(self, control_dt: float = 0.002, timestep: float = 0.001,
                 q0: np.ndarray | None = None, v0: np.ndarray | None = None):
        import mujoco

        self._mujoco = mujoco
        self.model = mjcf.load_mj_model(floor=True, timestep=timestep)
        self.data = mujoco.MjData(self.model)
        self.control_dt = float(control_dt)
        self.substeps = max(1, int(round(control_dt / self.model.opt.timestep)))
        self._base_body = self.model.body("base_link").id
        self._foot_body_ids = np.array(
            [self.model.body(n).id for n in _FOOT_BODIES], np.int64
        )
        self._sole_body_ids = np.array(
            [self.model.body(n).id for n in _SOLE_BODIES], np.int64
        )
        self._geom_body = self.model.geom_bodyid.copy()
        self.reset(q0, v0)

    # ------------------------------------------------------------------
    def reset(self, q0: np.ndarray | None = None, v0: np.ndarray | None = None):
        q0 = DEFAULT_Q0 if q0 is None else np.asarray(q0, np.float64)
        self._mujoco.mj_resetData(self.model, self.data)
        self.data.qpos[:] = mjcf.q_to_mj(q0)
        if v0 is not None:
            self.data.qvel[:] = mjcf.v_to_mj(q0, np.asarray(v0, np.float64))
        self._push = np.zeros(6)
        self._push_steps = 0
        self._mujoco.mj_forward(self.model, self.data)

    @property
    def t(self) -> float:
        return float(self.data.time)

    # ------------------------------------------------------------------
    def apply_push(self, force_xyz, torque_xyz=None, duration: float = 0.1):
        """World-frame wrench on the base for `duration` seconds — the
        push-recovery stressor (the reference applies pushes interactively
        in the MuJoCo UI)."""
        self._push = np.concatenate(
            [np.asarray(force_xyz, np.float64),
             np.zeros(3) if torque_xyz is None else np.asarray(torque_xyz, np.float64)]
        )
        self._push_steps = int(round(duration / self.model.opt.timestep))

    def step(self, pos_des, vel_des, kp, kd, tau_ff):
        """One control tick: apply the hybrid joint command through the
        PD+ff motor law at every physics substep (mycontroller parity,
        main.cc:243-248; ctrlrange clamping mirrors the MJCF +-100)."""
        d, m = self.data, self.model
        pos_des = np.asarray(pos_des, np.float64)
        vel_des = np.asarray(vel_des, np.float64)
        kp = np.asarray(kp, np.float64)
        kd = np.asarray(kd, np.float64)
        tau_ff = np.asarray(tau_ff, np.float64)
        for _ in range(self.substeps):
            qj = d.qpos[7:17]
            vj = d.qvel[6:16]
            d.ctrl[:] = tau_ff + kp * (pos_des - qj) + kd * (vel_des - vj)
            if self._push_steps > 0:
                d.xfrc_applied[self._base_body, :] = self._push
                self._push_steps -= 1
            else:
                d.xfrc_applied[self._base_body, :] = 0.0
            self._mujoco.mj_step(m, d)

    # ------------------------------------------------------------------
    def state(self):
        """Ground-truth (q, v) in our coordinates (pos, zyx, joints)."""
        return mjcf.mj_to_q_v(np.asarray(self.data.qpos), np.asarray(self.data.qvel))

    def contact_forces(self):
        """(4,) world-z contact force in [L_toe, R_toe, L_heel, R_heel]
        order, from MuJoCo's constraint solver.  Contacts on the sole box
        (l5/r5) are split toe/heel by proximity of the contact point to the
        f1/f2 marker bodies."""
        mj = self._mujoco
        fz = np.zeros(4)
        buf = np.zeros(6)
        toe_heel_pos = self.data.xpos[self._foot_body_ids]  # (4,3) world
        for i in range(self.data.ncon):
            con = self.data.contact[i]
            b1 = self._geom_body[con.geom1]
            b2 = self._geom_body[con.geom2]
            for side, sb in enumerate(self._sole_body_ids):  # 0=L, 1=R
                foot_set = (sb, self._foot_body_ids[side],
                            self._foot_body_ids[side + 2])
                hit1, hit2 = b1 in foot_set, b2 in foot_set
                if not (hit1 or hit2):
                    continue
                mj.mj_contactForce(self.model, self.data, i, buf)
                # contact frame rows are the frame axes; buf[0:3] are the
                # normal/tangent components; normal points geom1 -> geom2
                f_world = con.frame.reshape(3, 3).T @ buf[0:3]
                sgn = 1.0 if hit2 else -1.0
                # toe (k=side) vs heel (k=side+2) by distance to markers
                d_toe = np.linalg.norm(con.pos - toe_heel_pos[side])
                d_heel = np.linalg.norm(con.pos - toe_heel_pos[side + 2])
                k = side if d_toe <= d_heel else side + 2
                fz[k] += sgn * f_world[2]
        return fz

    def sensors(self):
        """What LowState carries (LeggedMujocoSim.cpp:29-53): IMU quaternion
        (xyzw), body-local angular velocity, body-local specific force, and
        joint encoders."""
        d = self.data
        quat_wxyz = np.asarray(d.qpos[3:7])
        quat_xyzw = np.array([quat_wxyz[1], quat_wxyz[2], quat_wxyz[3], quat_wxyz[0]])
        R = np.zeros(9)
        self._mujoco.mju_quat2Mat(R, quat_wxyz)
        R = R.reshape(3, 3)
        omega_local = np.asarray(d.qvel[3:6])          # free joint: body frame
        a_world = np.asarray(d.qacc[0:3])              # world linear acc
        accel_local = R.T @ (a_world + np.array([0.0, 0.0, 9.81]))
        return {
            "quat": quat_xyzw,
            "omega_local": omega_local,
            "accel_local": accel_local,
            "joint_pos": np.asarray(d.qpos[7:17]).copy(),
            "joint_vel": np.asarray(d.qvel[6:16]).copy(),
        }
