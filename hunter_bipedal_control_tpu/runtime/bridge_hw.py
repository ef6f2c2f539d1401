"""Real-robot calibration boundary — BridgeHW re-built as pure logic.

The reference's EtherCAT hardware node (legged_bridge_hw/src/BridgeHW.cpp)
is two things: a SOEM fieldbus transport, and a CALIBRATION LAYER between
raw motor/IMU frames and the controller's joint/body frames.  SOEM itself
is out of TPU scope (no fieldbus here), but the calibration layer is pure
arithmetic and is what makes a real robot drop-in; this module rebuilds it
bit-for-bit behind the repo's existing LowState/LowCmd transport
(runtime/native.py), so swapping the UDP sim server for a real YKS bus
adapter changes only the byte source.

Reference parity map (BridgeHW.cpp):
  :38-42  read():  pos = (raw - base) * direction; vel/tau = raw * direction
  :69-85  write(): raw pos_des = des * direction + base; vel_des/ff flip
          with direction; motors {0,1,5,6} (hip roll + hip pitch of each
          leg, index = leg*5 + joint) are derated: kp/kd/ff scaled by 0.7
  :44-54  IMU axis remap (sensor -> body): x <- y_s, y <- -x_s, z <- z_s,
          applied identically to orientation, gyro and accelerometer;
          incoming quaternion order is [w, x, y, z], published as
          [x, y, z, w]
  :56-63  damping handshake: until the controller writes, every joint is
          commanded ff=0, vel_des=0, kd=3.0, kp=0
  :118-120 (BridgeHW.h) directionMotor = {1,-1,1,1,1, 1,-1,1,-1,1, 1,1},
          baseMotor = 0 (commissioning writes per-robot offsets)
  :135-141 fixed IMU covariances: orientation 0.0012, angular vel 0.0004

The YKS bus carries 12 motor slots; the Hunter uses slots 0-9
(leg_l1..leg_l5, leg_r1..leg_r5 — exactly this repo's joint order) and
slots 10/11 ride along zeroed, as in the reference's i<12 loops.
"""
from __future__ import annotations

import ctypes
from dataclasses import dataclass, field

import numpy as np

from .native import NJ, LowCmd, LowState

N_SLOTS = 12
# BridgeHW.h:118 — per-motor sign between raw encoder frame and joint frame
DEFAULT_DIRECTION = np.array([1, -1, 1, 1, 1, 1, -1, 1, -1, 1, 1, 1],
                             dtype=np.float64)
# BridgeHW.cpp:74-79 — hip roll/pitch pairs run derated gains
DERATED_SLOTS = (0, 1, 5, 6)
DERATE = 0.7
# BridgeHW.cpp:60-62 — pre-controller damping handshake
HANDSHAKE_KD = 3.0
# BridgeHW.cpp:135-141
ORI_COV = 0.0012
GYRO_COV = 0.0004


class RawMotorState(ctypes.Structure):
    """YKSMotorData receive image (12 slots) + IMU in SENSOR frame."""

    _fields_ = [
        ("t", ctypes.c_double),
        ("pos", ctypes.c_double * N_SLOTS),
        ("vel", ctypes.c_double * N_SLOTS),
        ("tau", ctypes.c_double * N_SLOTS),
        ("quat_wxyz", ctypes.c_double * 4),   # sensor-frame orientation
        ("gyro", ctypes.c_double * 3),        # sensor-frame rates
        ("accel", ctypes.c_double * 3),       # sensor-frame acceleration
        ("seq", ctypes.c_uint64),
    ]


class RawMotorCmd(ctypes.Structure):
    """YKSMotorData send image (12 slots)."""

    _fields_ = [
        ("pos_des", ctypes.c_double * N_SLOTS),
        ("vel_des", ctypes.c_double * N_SLOTS),
        ("kp", ctypes.c_double * N_SLOTS),
        ("kd", ctypes.c_double * N_SLOTS),
        ("ff", ctypes.c_double * N_SLOTS),
        ("seq", ctypes.c_uint64),
    ]


@dataclass
class MotorCalibration:
    """Per-robot calibration constants (BridgeHW.h:118-120)."""

    direction: np.ndarray = field(
        default_factory=lambda: DEFAULT_DIRECTION.copy())  # (12,)
    base: np.ndarray = field(
        default_factory=lambda: np.zeros(N_SLOTS))         # (12,) offsets
    derated_slots: tuple = DERATED_SLOTS
    derate: float = DERATE

    def __post_init__(self):
        self.direction = np.asarray(self.direction, np.float64)
        self.base = np.asarray(self.base, np.float64)
        assert self.direction.shape == (N_SLOTS,)
        assert self.base.shape == (N_SLOTS,)


# ---------------------------------------------------------------------------
# pure calibration maps (both directions)
# ---------------------------------------------------------------------------


def raw_to_joint(cal: MotorCalibration, raw_pos, raw_vel, raw_tau):
    """BridgeHW::read (:38-42): raw motor frame -> joint frame (first NJ
    slots; the two trailing bus slots are dropped)."""
    d, b = cal.direction[:NJ], cal.base[:NJ]
    pos = (np.asarray(raw_pos)[:NJ] - b) * d
    vel = np.asarray(raw_vel)[:NJ] * d
    tau = np.asarray(raw_tau)[:NJ] * d
    return pos, vel, tau


def joint_cmd_to_raw(cal: MotorCalibration, pos_des, vel_des, kp, kd, ff):
    """BridgeHW::write (:69-85): joint-frame hybrid command -> raw motor
    command, with the {0,1,5,6} gain derating.  Returns (12,) arrays with
    the two unused slots zeroed."""
    out = {k: np.zeros(N_SLOTS) for k in ("pos_des", "vel_des", "kp", "kd",
                                          "ff")}
    d, b = cal.direction[:NJ], cal.base[:NJ]
    out["pos_des"][:NJ] = np.asarray(pos_des) * d + b
    out["vel_des"][:NJ] = np.asarray(vel_des) * d
    out["kp"][:NJ] = np.asarray(kp)
    out["kd"][:NJ] = np.asarray(kd)
    out["ff"][:NJ] = np.asarray(ff) * d
    scale = np.ones(N_SLOTS)
    for i in cal.derated_slots:
        scale[i] = cal.derate
    out["kp"] *= scale
    out["kd"] *= scale
    out["ff"] *= scale
    return out


def raw_cmd_to_joint(cal: MotorCalibration, raw: RawMotorCmd):
    """Inverse of joint_cmd_to_raw — what the YKS firmware (or a sim robot
    standing in for it) applies motor-side.  Undoes direction/offset AND
    the derating, recovering the controller's joint-frame command."""
    d, b = cal.direction[:NJ], cal.base[:NJ]
    scale = np.ones(N_SLOTS)
    for i in cal.derated_slots:
        scale[i] = cal.derate
    pos = (np.asarray(raw.pos_des)[:NJ] - b) * d
    vel = np.asarray(raw.vel_des)[:NJ] * d
    kp = np.asarray(raw.kp)[:NJ] / scale[:NJ]
    kd = np.asarray(raw.kd)[:NJ] / scale[:NJ]
    ff = np.asarray(raw.ff)[:NJ] * d / scale[:NJ]
    return pos, vel, kp, kd, ff


def joint_state_to_raw(cal: MotorCalibration, pos, vel, tau):
    """Inverse of raw_to_joint — the robot/sim side encodes its joint state
    into the raw motor frame (direction undone, offsets re-applied)."""
    out = {k: np.zeros(N_SLOTS) for k in ("pos", "vel", "tau")}
    d, b = cal.direction[:NJ], cal.base[:NJ]
    out["pos"][:NJ] = np.asarray(pos) * d + b   # direction^2 = 1
    out["vel"][:NJ] = np.asarray(vel) * d
    out["tau"][:NJ] = np.asarray(tau) * d
    return out


def imu_raw_to_body(quat_wxyz, gyro, accel):
    """BridgeHW.cpp:44-54 — sensor frame -> body frame.

    The mounted IMU's axes relate to the body by (x, y, z)_body =
    (y, -x, z)_sensor — a +90 deg yaw of the sensor frame.  The
    reference applies the same component shuffle to the quaternion's
    vector part as to the vectors (valid exactly for this axis
    permutation) and reorders [w,x,y,z] -> [x,y,z,w].

    Returns (quat_xyzw, gyro_body, accel_body).
    """
    q = np.asarray(quat_wxyz, np.float64)
    g = np.asarray(gyro, np.float64)
    a = np.asarray(accel, np.float64)
    quat_xyzw = np.array([q[2], -q[1], q[3], q[0]])
    gyro_b = np.array([g[1], -g[0], g[2]])
    accel_b = np.array([a[1], -a[0], a[2]])
    return quat_xyzw, gyro_b, accel_b


def imu_body_to_raw(quat_xyzw, gyro_body, accel_body):
    """Inverse IMU remap (robot/sim side encoder)."""
    q = np.asarray(quat_xyzw, np.float64)
    g = np.asarray(gyro_body, np.float64)
    a = np.asarray(accel_body, np.float64)
    quat_wxyz = np.array([q[3], -q[1], q[0], q[2]])
    gyro_s = np.array([-g[1], g[0], g[2]])
    accel_s = np.array([-a[1], a[0], a[2]])
    return quat_wxyz, gyro_s, accel_s


def handshake_cmd() -> LowCmd:
    """BridgeHW::read :56-63 — the pre-controller damping command (kp=0,
    kd=3, zero feedforward/velocity) in the JOINT frame."""
    cmd = LowCmd()
    for i in range(NJ):
        cmd.pos[i] = 0.0
        cmd.vel[i] = 0.0
        cmd.kp[i] = 0.0
        cmd.kd[i] = HANDSHAKE_KD
        cmd.ff[i] = 0.0
    return cmd


# ---------------------------------------------------------------------------
# transport-facing adapters
# ---------------------------------------------------------------------------


class BridgeHW:
    """Controller-side boundary: reads RAW wire frames, exposes calibrated
    LowState; takes joint-frame LowCmd, writes RAW command frames.

    ``recv``/``send`` are transport callables — UdpChannel methods in the
    two-process deployment, or direct function handles in-process.  The
    covariances mirror BridgeHW::setupImu (:135-141)."""

    def __init__(self, cal: MotorCalibration, recv, send):
        self.cal = cal
        self._recv = recv
        self._send = send
        self.ori_cov = np.eye(3) * ORI_COV
        self.gyro_cov = np.eye(3) * GYRO_COV

    def read(self):
        """-> calibrated LowState (or None if nothing arrived yet)."""
        raw = self._recv(RawMotorState)
        if raw is None:
            return None
        st = LowState()
        st.t = raw.t
        pos, vel, tau = raw_to_joint(self.cal, raw.pos, raw.vel, raw.tau)
        for i in range(NJ):
            st.q[i] = pos[i]
            st.dq[i] = vel[i]
            st.tau[i] = tau[i]
        quat_xyzw, gyro, accel = imu_raw_to_body(raw.quat_wxyz, raw.gyro,
                                                 raw.accel)
        for i in range(4):
            st.quat[i] = quat_xyzw[i]
        for i in range(3):
            st.gyro[i] = gyro[i]
            st.accel[i] = accel[i]
        st.seq = raw.seq
        return st

    def write(self, cmd: LowCmd) -> None:
        raw = RawMotorCmd()
        out = joint_cmd_to_raw(
            self.cal,
            [cmd.pos[i] for i in range(NJ)],
            [cmd.vel[i] for i in range(NJ)],
            [cmd.kp[i] for i in range(NJ)],
            [cmd.kd[i] for i in range(NJ)],
            [cmd.ff[i] for i in range(NJ)],
        )
        for i in range(N_SLOTS):
            raw.pos_des[i] = out["pos_des"][i]
            raw.vel_des[i] = out["vel_des"][i]
            raw.kp[i] = out["kp"][i]
            raw.kd[i] = out["kd"][i]
            raw.ff[i] = out["ff"][i]
        raw.seq = cmd.seq
        self._send(raw)


class RawRobotSide:
    """Robot/sim-side encoder: wraps a calibrated joint state + body IMU
    into raw wire frames (what the YKS firmware does), and decodes raw
    commands back to joint frame for the plant's PD motors.  Used by the
    sim server to emulate a direction/offset-wired robot, and by the
    calibration tests as the ground-truth inverse."""

    def __init__(self, cal: MotorCalibration):
        self.cal = cal

    def encode_state(self, t, q_joints, dq_joints, tau_joints, quat_xyzw,
                     gyro_body, accel_body, seq=0) -> RawMotorState:
        raw = RawMotorState()
        raw.t = t
        enc = joint_state_to_raw(self.cal, q_joints, dq_joints, tau_joints)
        for i in range(N_SLOTS):
            raw.pos[i] = enc["pos"][i]
            raw.vel[i] = enc["vel"][i]
            raw.tau[i] = enc["tau"][i]
        qw, gs, as_ = imu_body_to_raw(quat_xyzw, gyro_body, accel_body)
        for i in range(4):
            raw.quat_wxyz[i] = qw[i]
        for i in range(3):
            raw.gyro[i] = gs[i]
            raw.accel[i] = as_[i]
        raw.seq = seq
        return raw

    def decode_cmd(self, raw: RawMotorCmd):
        return raw_cmd_to_joint(self.cal, raw)
