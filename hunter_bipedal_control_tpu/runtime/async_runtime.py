"""Asynchronous deployment runtime: MPC thread + control thread + UDP plant.

This is the thread/process architecture of the reference mapped onto the
TPU stack (SURVEY.md §2.2 "Planner/actor decoupling"):

  MPC thread   (LeggedController.cpp:396-421, 100 Hz executeAndSleep)
      -> solves on the latest observation, publishes the policy into a
         lock-free triple buffer (OCS2 MRT double-buffer parity)
  control thread (LeggedHWLoop.cpp:53-79, 500 Hz SCHED_FIFO)
      -> reads LowState from the UDP plant (sim_server or hardware shim),
         estimates, evaluates the latest policy, runs the WBC, sends LowCmd

Python threads suffice because jitted JAX calls release the GIL during
device execution; the native RateKeeper provides absolute-deadline timing
and overrun stats, and `set_realtime_priority` attempts SCHED_FIFO.

Run a full two-process demo:
    python -m hunter_bipedal_control_tpu.backends.sim_server --duration 30 &
    python -m hunter_bipedal_control_tpu.runtime.async_runtime --duration 20
"""
from __future__ import annotations

import argparse
import ctypes
import threading
import time

import numpy as np


def run_controller(addr="239.255.76.67", state_port=7667, cmd_port=7668,
                   duration=20.0, mpc_hz=100.0, control_hz=500.0,
                   backend_cpu=False, tick_on_cpu=True, verbose=True):
    """Two-rate deployment runtime.

    ``tick_on_cpu=True`` (default) places the 500 Hz estimation+WBC path on
    the host CPU backend and only the 100 Hz MPC solve on the accelerator —
    the reference's own core split (SCHED_FIFO control loop vs MPC thread,
    LeggedController.cpp:396-421).  Measured on the axon TPU: a single
    device stream serializes tick dispatches behind in-flight MPC solves
    (the 500 Hz loop starves at ~0.5 Hz); with the split both rates run
    concurrently."""
    import jax

    if backend_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ..estim.kalman import default_kalman_params, init_kalman_state, kalman_update
    from ..gait import adaptive
    from ..models.centroidal import rbd_state_to_centroidal
    from ..models.kinematics import contact_positions, fk
    from ..models.robot import load_model
    from ..models.spatial import quat_to_zyx, euler_rates_from_local_angular_velocity, global_angular_velocity_from_euler_rates
    from ..gait.mode_schedule import MODE_CONTACTS, mode_at_time
    from ..ocp import problem as ocp
    from ..refs import swing_planner as swp, targets as tg
    from ..solver import mpc as mpc_mod, sqp
    from ..wbc.wbc import default_wbc_params, init_wbc_state
    from . import native
    from .controller import control_tick, default_gains
    from .telemetry import RepeatedTimer

    F32 = jnp.float32
    m = load_model()
    settings = sqp.SqpSettings()
    dj = jnp.array([0.10, 0., 0.40, 0.93, 0.53, -0.10, 0., -0.40, 0.93, -0.53], F32)
    qnom = jnp.concatenate([jnp.array([0., 0., 0.63], F32), jnp.zeros(3, F32), dj])
    params = ocp.make_input_cost(m, ocp.default_ocp_params(m), qnom)
    pcfg = swp.default_swing_config()
    wbc_params = default_wbc_params()
    gains = default_gains()
    cmd_cfg = tg.default_cmd_vel_config()
    kf_params = default_kalman_params()

    rx = native.UdpChannel(addr, state_port, "recv")
    tx = native.UdpChannel(addr, cmd_port, "send")

    # shared state between threads (GIL-protected python refs + native tbuf)
    shared = {
        "x_est": None,          # latest centroidal observation (np array)
        "rbd": None,
        "t": 0.0,
        "policy": None,         # latest SqpSolution (pytree of np/jnp)
        # host-side numpy: the gait state is consumed by BOTH the CPU tick
        # path and the accelerator MPC; keeping it device-committed would
        # cost a device->host transfer per 500 Hz tick
        "gait": None,  # set below
        "mpc_state": mpc_mod.init_mpc_state(m, settings),
        "stop": False,
    }
    import numpy as _np_mod

    shared["gait"] = jax.tree.map(
        lambda a: _np_mod.asarray(a), adaptive.init_gait_run_state(F32, 0.0))
    lock = threading.Lock()

    # jitted functions
    def _mpc(state, sched_state, t, x, cmd6):
        sol, new_state, _ = mpc_mod.mpc_step(
            m, settings, params, pcfg, state, sched_state, tg.cmd_vel_to_target(
                jnp.zeros(4, F32), x, t, settings.horizon, cmd_cfg),
            t, x, cmd6, dj,
        )
        return sol, new_state

    # pin the MPC solve to the accelerator explicitly: without this, the
    # warmup's CPU-committed estimator outputs would infect placement and
    # the solver would silently compile for (and stay on) the CPU backend
    mpc_jit = jax.jit(_mpc, device=jax.devices()[0])

    wbc_state = init_wbc_state(F32)
    kf = init_kalman_state(F32)
    tick_dev = jax.devices("cpu")[0] if tick_on_cpu else None

    def _tick(wbc_state, policy, sched, t, x_est, rbd):
        out, wbc_state = control_tick(
            m, wbc_params, gains, wbc_state, policy, sched, t, x_est, rbd,
            dj, jnp.asarray(True), jnp.asarray(False), 1.0 / control_hz,
        )
        return out, wbc_state

    tick_jit = jax.jit(_tick, device=tick_dev)

    def _estimate(kf, quat, gyro, accel, q, dq, sched, t, dt):
        """Sensor pack -> (kf, rbd, x_est, flags) — ALL the per-tick math
        lives inside one jit (eager ops would each be a host<->device round
        trip on a remote accelerator)."""
        from ..models.spatial import rotation_zyx

        zyx = quat_to_zyx(quat)
        omega_world = rotation_zyx(zyx) @ gyro
        flags = jnp.asarray(MODE_CONTACTS, F32)[mode_at_time(sched, t)]
        kf, pos, vel = kalman_update(m, kf_params, kf, zyx, q, dq, omega_world,
                                     quat, accel, flags, dt)
        rbd = jnp.concatenate([zyx, pos, q, omega_world, vel, dq])
        return kf, rbd, rbd_state_to_centroidal(m, rbd)

    est_jit = jax.jit(_estimate, device=tick_dev)

    mpc_timer = RepeatedTimer("mpc")
    wbc_timer = RepeatedTimer("wbc+tick")

    # pre-warm every jit before the wall-clock loops start (first compiles
    # through the axon tunnel take minutes; the RT loops must start hot)
    if verbose:
        print("[controller] warming jits ...", flush=True)
    _quat = np.array([0., 0., 0., 1.], np.float32)
    _acc = np.array([0., 0., 9.81], np.float32)
    _kf_w, _rbd_w, _x_w = est_jit(
        kf, _quat, np.zeros(3, np.float32), _acc, np.asarray(dj, np.float32),
        np.zeros(10, np.float32), shared["gait"].schedule, 0.0,
        1.0 / control_hz)
    _sol_w, _ = mpc_jit(shared["mpc_state"], shared["gait"].schedule, 0.0,
                        np.asarray(_x_w), jnp.zeros(6, F32))
    _out_w, _ = tick_jit(wbc_state, _sol_w, shared["gait"].schedule, 0.0,
                         _x_w, _rbd_w)
    jax.block_until_ready(_out_w.command.pos_des)
    if verbose:
        print("[controller] jits warm; starting RT loops", flush=True)

    def mpc_thread():
        native.set_realtime_priority(50)
        rate = native.RateKeeper(mpc_hz)
        while not shared["stop"]:
            with lock:
                x = shared["x_est"]
                t = shared["t"]
                gait = shared["gait"]
                mpc_state = shared["mpc_state"]
            if x is not None:
                with mpc_timer:
                    sol, new_state = mpc_jit(mpc_state, gait.schedule, t,
                                             jnp.asarray(x), jnp.zeros(6, F32))
                    # fetch the policy to host ONCE per solve — the 500 Hz
                    # tick consumer must not pay a device round trip per tick
                    sol = jax.tree.map(np.asarray, sol)
                with lock:
                    shared["policy"] = sol
                    shared["mpc_state"] = new_state
            rate.sleep()

    t0 = time.time()
    th = threading.Thread(target=mpc_thread, daemon=True)
    th.start()

    native.set_realtime_priority(60)
    rate = native.RateKeeper(control_hz)
    n_cmds = 0
    last_state = None
    try:
        while time.time() - t0 < duration:
            ls = rx.recv_latest(native.LowState)
            if ls is not None:
                last_state = ls
            if last_state is None:
                rate.sleep()
                continue
            s = last_state
            quat = np.frombuffer(s.quat, np.float64).astype(np.float32)
            gyro = np.frombuffer(s.gyro, np.float64).astype(np.float32)
            accel = np.frombuffer(s.accel, np.float64).astype(np.float32)
            q = np.frombuffer(s.q, np.float64).astype(np.float32)
            dq = np.frombuffer(s.dq, np.float64).astype(np.float32)
            with lock:
                gait = shared["gait"]
            tnow = float(s.t)
            kf, rbd, x_est = est_jit(kf, quat, gyro, accel, q, dq,
                                     gait.schedule, tnow, 1.0 / control_hz)
            with lock:
                shared["x_est"] = np.asarray(x_est)
                shared["rbd"] = np.asarray(rbd)
                shared["t"] = tnow
                policy = shared["policy"]
            if policy is not None:
                with wbc_timer:
                    out, wbc_state = tick_jit(wbc_state, policy, gait.schedule,
                                              tnow, x_est, rbd)
                    cmd = out.command
                lc = native.LowCmd()
                for i in range(10):
                    lc.pos[i] = float(cmd.pos_des[i])
                    lc.vel[i] = float(cmd.vel_des[i])
                    lc.kp[i] = float(cmd.kp[i])
                    lc.kd[i] = float(cmd.kd[i])
                    lc.ff[i] = float(cmd.tau_ff[i])
                tx.send_struct(lc)
                n_cmds += 1
            rate.sleep()
    finally:
        shared["stop"] = True
        th.join(timeout=2.0)

    stats = rate.stats()
    if verbose:
        print(f"[controller] sent {n_cmds} commands; loop {stats}")
        print(mpc_timer.summary())
        print(wbc_timer.summary())
    return n_cmds, stats, mpc_timer, wbc_timer


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--addr", default="239.255.76.67")
    ap.add_argument("--duration", type=float, default=20.0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    run_controller(addr=args.addr, duration=args.duration, backend_cpu=args.cpu)
