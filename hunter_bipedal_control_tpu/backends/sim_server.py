"""Standalone physics-server process bridged over the native UDP transport.

Process-model parity with the reference's MuJoCo setup (SURVEY.md §3.5):
the simulator runs in its own process (mujoco/src/main.cc PhysicsLoop
:266-430), publishes LOWSTATE and consumes LOWCMD over LCM UDP multicast;
the controller process exchanges the same structs
(legged_examples/legged_mujoco/src/LeggedMujocoSim.cpp:29-67).

Physics engine options (--engine):
  fullorder : the JAX full-order backend (backends/fullorder.py)
  mujoco    : REAL MuJoCo on the reference's hunter.xml (backends/
              mj_plant.py) — the exact reference process architecture
              (mujoco physics process <-> controller process over a
              latest-wins UDP wire)
The wire is native/hunterrt.cpp's latest-wins UDP channel either way.

Run:  python -m hunter_bipedal_control_tpu.backends.sim_server [--addr ...]
"""
from __future__ import annotations

import argparse
import time

import numpy as np

DEFAULT_ADDR = "239.255.76.67"  # LCM's default multicast group
STATE_PORT = 7667
CMD_PORT = 7668


def run_mujoco_server(addr=DEFAULT_ADDR, state_port=STATE_PORT,
                      cmd_port=CMD_PORT, duration=30.0, realtime=True,
                      verbose=True):
    """MuJoCo physics process: PhysicsLoop parity (mujoco/src/main.cc
    :266-430 — PD applied per mj_step, LOWSTATE out / LOWCMD in)."""
    from ..runtime import native
    from .mj_plant import MjPlant

    plant = MjPlant()
    dj = np.array([0.10, 0., 0.40, 0.93, 0.53, -0.10, 0., -0.40, 0.93, -0.53])
    pos_des, vel_des = dj.copy(), np.zeros(10)
    kp, kd, ff = np.full(10, 25.0), np.full(10, 1.0), np.zeros(10)

    tx = native.UdpChannel(addr, state_port, "send")
    rx = native.UdpChannel(addr, cmd_port, "recv")
    rate = native.RateKeeper(1.0 / plant.control_dt)
    seq = 0
    t_end = time.time() + duration
    if verbose:
        print(f"[sim_server/mujoco] hunter.xml at {1/plant.control_dt:.0f} Hz "
              f"on {addr}:{state_port}/{cmd_port}", flush=True)
    while time.time() < t_end:
        lc = rx.recv_latest(native.LowCmd)
        if lc is not None:
            pos_des = np.frombuffer(lc.pos, np.float64).copy()
            vel_des = np.frombuffer(lc.vel, np.float64).copy()
            kp = np.frombuffer(lc.kp, np.float64).copy()
            kd = np.frombuffer(lc.kd, np.float64).copy()
            ff = np.frombuffer(lc.ff, np.float64).copy()
        plant.step(pos_des, vel_des, kp, kd, ff)
        s = plant.sensors()
        ls = native.LowState()
        ls.t = plant.t
        ls.seq = seq
        for i in range(4):
            ls.quat[i] = float(s["quat"][i])
        for i in range(3):
            ls.gyro[i] = float(s["omega_local"][i])
            ls.accel[i] = float(s["accel_local"][i])
        for i in range(10):
            ls.q[i] = float(s["joint_pos"][i])
            ls.dq[i] = float(s["joint_vel"][i])
        tx.send_struct(ls)
        seq += 1
        if realtime:
            rate.sleep()
    q, _ = plant.state()
    if verbose:
        print(f"[sim_server/mujoco] done: {seq} steps, final z={q[2]:.4f}, "
              f"rate stats {rate.stats()}", flush=True)
    tx.close()
    rx.close()
    return float(q[2])


def run_server(addr=DEFAULT_ADDR, state_port=STATE_PORT, cmd_port=CMD_PORT,
               duration=30.0, realtime=True, backend_cpu=True, verbose=True):
    import jax

    if backend_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ..models.robot import load_model
    from ..models.spatial import (
        global_angular_velocity_from_euler_rates,
        rotation_zyx,
        zyx_to_quat,
    )
    from ..runtime import native
    from ..runtime.controller import JointCommand
    from .fullorder import default_sim_params, init_sim_state, sim_step, synth_imu

    m = load_model()
    F32 = jnp.float32
    dj = jnp.array([0.10, 0., 0.40, 0.93, 0.53, -0.10, 0., -0.40, 0.93, -0.53], F32)
    q0 = jnp.concatenate([jnp.array([0., 0., 0.624], F32), jnp.zeros(3, F32), dj])
    sp = default_sim_params()
    st = init_sim_state(q0)

    step = jax.jit(lambda s, cmd: sim_step(m, sp, s, cmd))
    imu = jax.jit(lambda s: synth_imu(m, s))

    tx = native.UdpChannel(addr, state_port, "send")
    rx = native.UdpChannel(addr, cmd_port, "recv")

    cmd = JointCommand(
        pos_des=dj, vel_des=jnp.zeros(10, F32),
        kp=jnp.full(10, 25.0, F32), kd=jnp.full(10, 1.0, F32),
        tau_ff=jnp.zeros(10, F32),
    )
    # warm up the jit before the clock starts
    _ = step(st, cmd)
    _ = imu(st)
    rate = native.RateKeeper(500.0)

    seq = 0
    t_end = time.time() + duration
    if verbose:
        print(f"[sim_server] physics at 500 Hz on {addr}:{state_port}/{cmd_port}",
              flush=True)
    while time.time() < t_end:
        lc = rx.recv_latest(native.LowCmd)
        if lc is not None:
            cmd = JointCommand(
                pos_des=jnp.asarray(np.frombuffer(lc.pos, np.float64), F32),
                vel_des=jnp.asarray(np.frombuffer(lc.vel, np.float64), F32),
                kp=jnp.asarray(np.frombuffer(lc.kp, np.float64), F32),
                kd=jnp.asarray(np.frombuffer(lc.kd, np.float64), F32),
                tau_ff=jnp.asarray(np.frombuffer(lc.ff, np.float64), F32),
            )
        st = step(st, cmd)
        quat, gyro, accel = imu(st)

        ls = native.LowState()
        ls.t = float(st.t)
        ls.seq = seq
        for i in range(4):
            ls.quat[i] = float(quat[i])
        for i in range(3):
            ls.gyro[i] = float(gyro[i])
            ls.accel[i] = float(accel[i])
        qj = np.asarray(st.q[6:], np.float64)
        dqj = np.asarray(st.v[6:], np.float64)
        for i in range(10):
            ls.q[i] = qj[i]
            ls.dq[i] = dqj[i]
        tx.send_struct(ls)
        seq += 1
        if realtime:
            rate.sleep()
    if verbose:
        print(f"[sim_server] done: {seq} steps, final z={float(st.q[2]):.4f}, "
              f"rate stats {rate.stats()}", flush=True)
    tx.close()
    rx.close()
    return float(st.q[2])


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--addr", default=DEFAULT_ADDR)
    ap.add_argument("--duration", type=float, default=30.0)
    ap.add_argument("--no-realtime", action="store_true")
    ap.add_argument("--engine", choices=["fullorder", "mujoco"],
                    default="fullorder")
    args = ap.parse_args()
    if args.engine == "mujoco":
        run_mujoco_server(addr=args.addr, duration=args.duration,
                          realtime=not args.no_realtime)
    else:
        run_server(addr=args.addr, duration=args.duration,
                   realtime=not args.no_realtime)
