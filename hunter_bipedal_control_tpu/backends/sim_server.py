"""Standalone physics-server process bridged over the native UDP transport.

Process-model parity with the reference's MuJoCo setup (SURVEY.md §3.5):
the simulator runs in its own process (mujoco/src/main.cc PhysicsLoop
:266-430), publishes LOWSTATE and consumes LOWCMD over LCM UDP multicast;
the controller process exchanges the same structs
(legged_examples/legged_mujoco/src/LeggedMujocoSim.cpp:29-67).

Here the physics is the JAX full-order backend (backends/fullorder.py) and
the wire is native/hunterrt.cpp's latest-wins UDP channel.

Run:  python -m hunter_bipedal_control_tpu.backends.sim_server [--addr ...]
"""
from __future__ import annotations

import argparse
import time

import numpy as np

DEFAULT_ADDR = "239.255.76.67"  # LCM's default multicast group
STATE_PORT = 7667
CMD_PORT = 7668


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
    args = ap.parse_args()
    run_server(addr=args.addr, duration=args.duration,
               realtime=not args.no_realtime)
