"""Closed loop against the host-side MuJoCo plant — cross-engine validation.

The reference's ground-truth operation is the MuJoCo co-simulation loop
(SURVEY.md §3.5): a standalone MuJoCo process steps hunter.xml under the
PD+ff motor law (mujoco/src/main.cc:243-430) while the ROS controller runs
estimation → MPC → WBC at 500/100 Hz over LCM (LeggedMujocoSim.cpp:29-67).

TPU-native, the controller stays a set of jitted pure functions and the
plant runs in-process on the host CPU.  Unlike `runtime/sim_loop.py` (which
closes the loop against the in-graph `fullorder` plant), everything the
controller sees here comes from MuJoCo *sensors only* — IMU quaternion,
body-local angular velocity / specific force, joint encoders — exactly the
LowState surface, so the Kalman filter and momentum observer are exercised
against independent physics.

Per-tick flow (LeggedController::update parity, :137-278):
  sense (MuJoCo)  →  KF + rbd assembly  →  momentum-observer contact
  estimate  →  control_tick (policy eval, WBC, gain schedule, e-stop)
  →  MjPlant.step under the hybrid 5-tuple command.
Each MPC period (5 ticks) re-solves on the latest estimate, reproducing the
"solve completes within one period" timing of the nested-scan loops.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np


class Segment(NamedTuple):
    """One scripted phase of the README procedure (stand-up, /set_walk,
    cmd_vel script)."""

    duration: float
    cmd_vel: tuple = (0.0, 0.0, 0.0, 0.0)
    set_walk: bool = True


class MjClosedLoop:
    """Jitted controller ↔ MuJoCo plant co-simulation driver."""

    def __init__(self, control_dt: float = 0.002, ticks_per_mpc: int = 5,
                 q0=None, seed_estimator: bool = True, noise=None,
                 lin_backend: str = "dense", wbc_params=None,
                 cheater: bool = False, kf_contact: str = "rocker",
                 policy_lead: float = 0.028, swing_cfg=None, gains=None,
                 fixed_gait: str | None = None, cmd_cfg=None,
                 swing_lead: float = 0.0, lead_forces: bool | None = None):
        # lin_backend default 'dense': this loop runs the controller on the
        # host CPU next to MuJoCo, where the SoA kernels' ~600k-line HLO
        # compiles for minutes; 'dense' is oracle-identical (tests/test_soa)
        # and ~10x faster to compile (see SqpSettings.lin_backend).
        import jax
        import jax.numpy as jnp

        from ..backends.mj_plant import DEFAULT_Q0, MjPlant
        from ..estim.contact import (
            classify_contact,
            default_contact_params,
            early_late_contact_flags,
            init_contact_observer,
            momentum_observer_update,
        )
        from ..estim.kalman import (
            default_kalman_params,
            init_kalman_state,
            kalman_update,
        )
        from ..gait import adaptive
        from ..gait.mode_schedule import (
            MODE_CONTACTS,
            mode_at_time,
            phase_index_at_time,
            swing_windows,
        )
        from ..models.centroidal import rbd_state_to_centroidal
        from ..models.kinematics import contact_positions, fk
        from ..models.robot import load_model
        from ..models.spatial import quat_to_zyx, rotation_zyx
        from ..ocp import problem as ocp
        from ..refs import swing_planner as swp
        from ..refs import targets as tg
        from ..solver import mpc as mpc_mod
        from ..solver import sqp
        from ..wbc.wbc import default_wbc_params, init_wbc_state
        from .controller import control_tick, default_gains

        F32 = jnp.float32
        self._jnp = jnp
        self.model = load_model()
        self.settings = sqp.SqpSettings(lin_backend=lin_backend)
        self.dj = jnp.array(
            [0.10, 0., 0.40, 0.93, 0.53, -0.10, 0., -0.40, 0.93, -0.53], F32)
        qnom = jnp.concatenate(
            [jnp.array([0., 0., 0.63], F32), jnp.zeros(3, F32), self.dj])
        self.params = ocp.make_input_cost(
            self.model, ocp.default_ocp_params(self.model), qnom)
        pcfg = swp.default_swing_config() if swing_cfg is None else swing_cfg
        wbc_params = default_wbc_params() if wbc_params is None else wbc_params
        # live-reconfigurable (dynamic_reconfigure analog): a GainConfig is a
        # pytree of traced scalars passed into every tick — swap via
        # `loop.gains = reconfigure_gains(loop.gains, ...)` mid-run, no
        # retrace.  Per-backend default: kd_feet 4.0 (vs the Tutorials.cfg
        # 0.01) — the reference itself tunes gains per backend
        # (README stand-up notes; SURVEY.md §7.4 "physics parity"), and on
        # this MuJoCo plant the near-undamped ankle is what lets the swing
        # foot pitch toe-down and scuff; measured ±0.35 m/s tracking with
        # this value vs a 20% backward deficit without (docs/DESIGN.md
        # round-4 execution-layer fix).
        # Round-5 additions to the per-backend defaults: hip stance kp 75
        # with the ankle (feet) kp decoupled at the Tutorials.cfg values —
        # the shared-gain coupling capped closed-loop yaw at ~53% of
        # command (hip-yaw authority), and 75 is the measured robust point:
        # yaw 0.5 -> 0.376, 1.5 -> 1.204, combined walk+turn
        # (0.3 m/s + 0.5 rad/s) -> 0.52 rad/s at 0.284 m/s body-forward,
        # straight-line +-0.35/+-0.45 bands unchanged (docs/DESIGN.md
        # round-5 yaw section; kp 90 reaches the full 1.5 rad/s joystick
        # scale on pure yaw but trips the e-stop on combined commands).
        from .controller import reconfigure_gains
        self.gains = (reconfigure_gains(default_gains(), kd_feet=4.0,
                                        kp_small_stance=75.0,
                                        kp_feet_stance=30.0,
                                        kp_feet_swing=20.0)
                      if gains is None else gains)
        self.cmd_cfg = tg.default_cmd_vel_config() if cmd_cfg is None \
            else cmd_cfg
        kf_params = default_kalman_params()
        obs_params = default_contact_params()
        m = self.model
        settings = self.settings
        horizon = settings.horizon
        control_dt = float(control_dt)
        self.control_dt = control_dt
        self.ticks_per_mpc = int(ticks_per_mpc)

        self.plant = MjPlant(control_dt=control_dt, q0=q0)
        self.noise = noise  # optional backends.sensor_noise.SensorNoise
        self.cheater = bool(cheater)  # legged_cheater_controller analog
        # KF leg-odometry gating: 'cmd' = schedule contact flags (strict
        # reference parity, LeggedController.cpp:296-303); 'est' = schedule
        # AND the momentum-observer contact estimate from the previous tick
        # (null result — the per-leg wrench cannot separate toe from heel);
        # 'rocker' (default) = schedule x a kinematic rocker confidence
        # that discounts whichever end of the foot FK says is lifted —
        # during toe-roll the loaded heel sweeps forward at ~0.09 m/s while
        # the binary gate pins it, the measured source of the -0.03 m/s KF
        # velocity bias; with it the 0.35 m/s walk tracks at +0.348 (was
        # +0.407 under strict parity gating) with yaw drift halved
        # (docs/DESIGN.md round-3 tracking section).  'cmd' remains the
        # strict-parity mode.
        assert kf_contact in ("cmd", "est", "rocker")
        self.kf_contact = kf_contact
        # MRT policy-age parity: this synchronous loop solves with zero
        # latency, so without a lead it executes only the plan's first
        # [0, period] window (see control_tick docstring).  0.028 s ≈ the
        # reference's solve latency + staleness + PD settling — measured
        # on this plant as the value that closes the swing-execution lag
        # (docs/DESIGN.md round-4 sweep: backward −0.35 tracks at −0.344
        # with it, −0.270 without).
        self.policy_lead = float(policy_lead)
        self.swing_lead = float(swing_lead)
        # lead_forces default is PER-GAIT: with 0.15 s flying-trot stances
        # the led force feedforward reads the next FLY phase's zeros during
        # the last ~fifth of every stance and the gait falls at engagement
        # (round-5 ablation, docs/DESIGN.md); trot keeps the round-4
        # all-led behavior.
        if lead_forces is None:
            lead_forces = fixed_gait != "flying_trot"
        self.lead_forces = bool(lead_forces)

        self._default_q0 = DEFAULT_Q0

        # ---- host-side controller state -------------------------------
        def _fresh_state(q0_arr):
            kf = init_kalman_state(F32)
            if seed_estimator:
                kin = fk(m, q0_arr)
                feet = contact_positions(m, kin)
                x_hat = jnp.zeros(18, F32)
                x_hat = x_hat.at[0:3].set(q0_arr[0:3])
                x_hat = x_hat.at[6:18].set(feet.reshape(-1))
                kf = kf._replace(x_hat=x_hat, P=0.1 * jnp.eye(18, dtype=F32))
            self.kf = kf
            self.obs = init_contact_observer(F32)
            self.wbc_state = init_wbc_state(F32)
            self.gait = adaptive.init_gait_run_state(F32, 0.0)
            self.mpc_state = mpc_mod.init_mpc_state(m, settings)
            self.estop = jnp.asarray(False)
            self.last_cmd_vel = jnp.zeros(4, F32)
            self.last_est_contact = jnp.ones(4, F32)
            self.policy = None
            self.x_est = None  # latest centroidal estimate (device array)
            self._win = None

        self._fresh_state = _fresh_state
        _fresh_state(jnp.asarray(DEFAULT_Q0 if q0 is None else np.asarray(q0),
                                 F32))

        # ---- jitted controller functions -------------------------------
        kf_mode = self.kf_contact

        def _estimate(kf, quat_xyzw, omega_local, accel_local, qj, vj,
                      sched, t, est_prev):
            zyx = quat_to_zyx(quat_xyzw)
            omega_world = rotation_zyx(zyx) @ omega_local
            cmd_contact = jnp.asarray(MODE_CONTACTS, F32)[mode_at_time(sched, t)]
            if kf_mode == "est":
                gate = jnp.minimum(cmd_contact, est_prev)
            elif kf_mode == "rocker":
                # toe/heel z from encoders+IMU (base-height-invariant):
                # the lifted end of a rolling foot loses leg-odom trust
                q_rel = jnp.concatenate([jnp.zeros(3, F32), zyx, qj])
                z = contact_positions(m, fk(m, q_rel))[:, 2]
                zmin_leg = jnp.minimum(z[0:2], z[2:4])       # per [L, R]
                conf = jnp.clip(1.0 - (z - jnp.tile(zmin_leg, 2)) / 0.02,
                                0.0, 1.0)
                gate = cmd_contact * conf
            else:
                gate = cmd_contact
            kf, pos, vel = kalman_update(
                m, kf_params, kf, zyx, qj, vj, omega_world, quat_xyzw,
                accel_local, gate, control_dt)
            rbd = jnp.concatenate([zyx, pos, qj, omega_world, vel, vj])
            return kf, rbd, rbd_state_to_centroidal(m, rbd), cmd_contact

        # explicitly selected fixed gait (the /gait_type toggle analog):
        # 'flying_trot' | 'standing_trot' | 'trot' skip the adaptive
        # velocity switch and keep the chosen template live
        from ..gait.mode_schedule import (
            FLYING_TROT_GAIT, STANDING_TROT_GAIT, TROT_GAIT)

        assert fixed_gait in (None, "trot", "standing_trot", "flying_trot")
        fixed_tmpl = {None: None, "trot": TROT_GAIT(),
                      "standing_trot": STANDING_TROT_GAIT(),
                      "flying_trot": FLYING_TROT_GAIT()}[fixed_gait]
        self.fixed_gait = fixed_gait

        def _period(mpc_state, gait, last_cmd_vel, t, x_est, cmd_vel_raw):
            cmd_vel = tg.filter_cmd_vel(cmd_vel_raw, last_cmd_vel, self.cmd_cfg)
            target = tg.cmd_vel_to_target(cmd_vel, x_est, t, horizon, self.cmd_cfg)
            gait, vel_avg = adaptive.vel_abs_update(gait, cmd_vel, target.states[0])
            if fixed_tmpl is None:
                gait = adaptive.walk_gait_switch(gait, vel_avg, t, t + 10.0)
                gait = adaptive.extend_schedule(gait, t, t + 2 * horizon)
            else:
                gait = adaptive.fixed_gait_switch(
                    gait, vel_avg, t, t + 10.0, fixed_tmpl,
                    {"trot": 1, "standing_trot": 2,
                     "flying_trot": 3}[fixed_gait])
                gait = adaptive.extend_schedule(gait, t, t + 2 * horizon,
                                                template=fixed_tmpl)
            body_cmd6 = jnp.concatenate(
                [cmd_vel[0:3], jnp.zeros(2, F32), cmd_vel[3:4]])
            sol, mpc_state, _ = mpc_mod.mpc_step(
                m, settings, self.params, pcfg, mpc_state, gait.schedule,
                target, t, x_est, body_cmd6, self.dj)
            ws, we, _ = swing_windows(gait.schedule, t - horizon, t + 2 * horizon)
            return sol, mpc_state, gait, cmd_vel, ws, we

        def _tick_core(kf, obs, wbc_state, estop, last_tau, sol, sched, ws,
                       we, t, rbd, x_now, cmd_contact, set_walk, gains):
            obs, _ = momentum_observer_update(
                m, obs_params, obs, rbd, last_tau, control_dt)
            p = phase_index_at_time(sched, t)
            ss = jnp.stack([ws[:, p], we[:, p]], axis=1)
            est_contact = classify_contact(
                obs_params, obs.est_forces, cmd_contact, ss, t)
            frac = jnp.clip(
                (t - ss[:, 0]) / jnp.maximum(ss[:, 1] - ss[:, 0], 1e-6), 0., 1.)
            early, late = early_late_contact_flags(
                None, est_contact, cmd_contact, frac, ss[:, 1] - t)
            out, wbc_state = control_tick(
                m, wbc_params, gains, wbc_state, sol, sched, t, x_now, rbd,
                self.dj, set_walk, estop, control_dt,
                policy_lead=self.policy_lead, swing_lead=self.swing_lead,
                lead_forces=self.lead_forces)
            return (out.command, kf, obs, wbc_state, out.emergency_stop,
                    x_now, rbd, est_contact, early, late,
                    out.optimized_state, out.optimized_input,
                    out.wbc_solution)

        def _tick(kf, obs, wbc_state, estop, last_tau, sol, sched, ws, we,
                  t, quat, omega_local, accel_local, qj, vj, set_walk, gains,
                  est_prev):
            kf, rbd, x_now, cmd_contact = _estimate(
                kf, quat, omega_local, accel_local, qj, vj, sched, t, est_prev)
            return _tick_core(kf, obs, wbc_state, estop, last_tau, sol, sched,
                              ws, we, t, rbd, x_now, cmd_contact, set_walk,
                              gains)

        def _tick_cheater(kf, obs, wbc_state, estop, last_tau, sol, sched,
                          ws, we, t, q_true, v_true, set_walk, gains):
            """FromTopicStateEstimate parity (estim/cheater.py): ground truth
            replaces the KF; the observer/classifier still run on it."""
            from ..estim.cheater import cheater_estimate

            rbd, x_now = cheater_estimate(m, q_true, v_true)
            cmd_contact = jnp.asarray(MODE_CONTACTS, F32)[mode_at_time(sched, t)]
            return _tick_core(kf, obs, wbc_state, estop, last_tau, sol, sched,
                              ws, we, t, rbd, x_now, cmd_contact, set_walk,
                              gains)

        self._period_jit = jax.jit(_period)
        self._tick_jit = jax.jit(_tick)
        self._tick_cheater_jit = jax.jit(_tick_cheater)
        self._estimate_jit = jax.jit(_estimate)
        self._empty_policy = None

    # ------------------------------------------------------------------
    def reset(self, q0=None):
        """Reset plant + controller state without retracing the jitted
        functions — sweep drivers (e.g. tools/push_envelope.py) reuse one
        instance across scenarios."""
        jnp = self._jnp
        self.plant.reset(q0)
        self._fresh_state(jnp.asarray(
            self._default_q0 if q0 is None else np.asarray(q0), jnp.float32))

    # ------------------------------------------------------------------
    def _sense(self):
        s = self.plant.sensors()
        if self.noise is not None:
            s = self.noise.corrupt(s, self.plant.control_dt)
        jnp = self._jnp
        F32 = jnp.float32
        return (jnp.asarray(s["quat"], F32), jnp.asarray(s["omega_local"], F32),
                jnp.asarray(s["accel_local"], F32),
                jnp.asarray(s["joint_pos"], F32), jnp.asarray(s["joint_vel"], F32))

    def run(self, segments, record=True, callback=None):
        """Run scripted segments; returns telemetry dict of stacked arrays
        (one row per control tick)."""
        jnp = self._jnp
        F32 = jnp.float32
        telem = {k: [] for k in (
            "t", "base_z", "q", "v", "x_est", "contact_fz", "est_contact",
            "early", "late", "cmd", "cost", "violation", "gait_level",
            "cmd_vx", "tau", "plan_vx", "x_opt", "u_opt", "wbc_x")} \
            if record else None
        last_tau = jnp.zeros(10, F32)

        for seg in segments:
            cmd_vel_raw = jnp.asarray(np.asarray(seg.cmd_vel, np.float32))
            set_walk = jnp.asarray(bool(seg.set_walk))
            n_periods = max(1, int(round(
                seg.duration / (self.control_dt * self.ticks_per_mpc))))
            for _ in range(n_periods):
                t = self.plant.t
                # ensure an estimate exists for the solver (first period)
                if self.x_est is None:
                    if self.cheater:
                        from ..estim.cheater import cheater_estimate
                        q_true, v_true = self.plant.state()
                        _, self.x_est = cheater_estimate(
                            self.model, jnp.asarray(q_true, F32),
                            jnp.asarray(v_true, F32))
                    else:
                        quat, om, acc, qj, vj = self._sense()
                        self.kf, _, self.x_est, _ = self._estimate_jit(
                            self.kf, quat, om, acc, qj, vj,
                            self.gait.schedule, jnp.asarray(t, F32),
                            self.last_est_contact)
                (sol, self.mpc_state, self.gait, self.last_cmd_vel,
                 ws, we) = self._period_jit(
                    self.mpc_state, self.gait, self.last_cmd_vel,
                    jnp.asarray(t, F32), self.x_est, cmd_vel_raw)
                self.policy = sol
                sched = self.gait.schedule

                for _ in range(self.ticks_per_mpc):
                    tt = self.plant.t
                    if self.cheater:
                        q_true, v_true = self.plant.state()
                        (cmd, self.kf, self.obs, self.wbc_state, self.estop,
                         self.x_est, rbd, est_c, early, late, x_opt, u_opt,
                         wbc_x) = \
                            self._tick_cheater_jit(
                                self.kf, self.obs, self.wbc_state, self.estop,
                                last_tau, sol, sched, ws, we,
                                jnp.asarray(tt, F32),
                                jnp.asarray(q_true, F32),
                                jnp.asarray(v_true, F32), set_walk, self.gains)
                    else:
                        quat, om, acc, qj, vj = self._sense()
                        (cmd, self.kf, self.obs, self.wbc_state, self.estop,
                         self.x_est, rbd, est_c, early, late, x_opt, u_opt,
                         wbc_x) = self._tick_jit(
                            self.kf, self.obs, self.wbc_state, self.estop,
                            last_tau, sol, sched, ws, we, jnp.asarray(tt, F32),
                            quat, om, acc, qj, vj, set_walk, self.gains,
                            self.last_est_contact)
                        self.last_est_contact = jnp.asarray(est_c, F32)
                    self.plant.step(
                        np.asarray(cmd.pos_des, np.float64),
                        np.asarray(cmd.vel_des, np.float64),
                        np.asarray(cmd.kp, np.float64),
                        np.asarray(cmd.kd, np.float64),
                        np.asarray(cmd.tau_ff, np.float64))
                    # actually-applied torque (PD law inside the plant)
                    last_tau = jnp.asarray(self.plant.data.ctrl, F32)
                    if record:
                        q, v = self.plant.state()
                        telem["t"].append(tt)
                        telem["base_z"].append(q[2])
                        telem["q"].append(q)
                        telem["v"].append(v)
                        telem["x_est"].append(np.asarray(self.x_est))
                        telem["contact_fz"].append(self.plant.contact_forces())
                        telem["est_contact"].append(np.asarray(est_c))
                        telem["early"].append(np.asarray(early))
                        telem["late"].append(np.asarray(late))
                        telem["cmd"].append(np.asarray(cmd.pos_des))
                        telem["tau"].append(np.asarray(last_tau))
                        telem["cost"].append(float(sol.cost))
                        telem["violation"].append(float(sol.constraint_violation))
                        telem["gait_level"].append(int(self.gait.gait_level))
                        telem["cmd_vx"].append(float(cmd_vel_raw[0]))
                        # solver's own planned forward speed at mid-horizon
                        telem["plan_vx"].append(
                            float(sol.states[sol.states.shape[0] // 2, 0]))
                        # per-tick policy + WBC solution (desired-vs-optimized
                        # trajectory overlays and force arrows in
                        # tools/visualize.py; execution-layer diagnostics)
                        telem["x_opt"].append(np.asarray(x_opt))
                        telem["u_opt"].append(np.asarray(u_opt))
                        telem["wbc_x"].append(np.asarray(wbc_x))
                if callback is not None:
                    callback(self)
        if record:
            return {k: np.asarray(v) for k, v in telem.items()}
        return None


def main(stand=1.0, walk=4.0, vx=0.35, trace_path=None):
    import os
    import time

    import jax

    jax.config.update("jax_platforms", "cpu")
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    loop = MjClosedLoop()
    segs = [Segment(stand, (0., 0., 0., 0.), set_walk=False),
            Segment(0.5, (0., 0., 0., 0.), set_walk=True),
            Segment(walk, (vx, 0., 0., 0.), set_walk=True)]
    print(f"MuJoCo closed loop: stand {stand}s -> walk {walk}s @ vx={vx} ...",
          flush=True)
    t0 = time.perf_counter()
    telem = loop.run(segs)
    wall = time.perf_counter() - t0
    z = telem["base_z"]
    vx_true = telem["v"][:, 0]
    n = len(z)
    for k in range(0, n, max(n // 12, 1)):
        print(f"  t={telem['t'][k]:5.2f}s z={z[k]:.4f} vx={vx_true[k]:+.3f} "
              f"gait={telem['gait_level'][k]} viol={telem['violation'][k]:.4f}")
    px = telem["q"][-1, 0]
    print(f"final: x={px:+.3f} z={z[-1]:.4f} vx={vx_true[-1]:+.3f} "
          f"estop={bool(loop.estop)}  [wall {wall:.1f}s for "
          f"{telem['t'][-1]:.1f}s sim]")
    if trace_path:
        np.savez(trace_path, **telem)
        print(f"trace -> {trace_path}")
    return telem


if __name__ == "__main__":
    import sys

    st = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    wk = float(sys.argv[2]) if len(sys.argv) > 2 else 4.0
    vx = float(sys.argv[3]) if len(sys.argv) > 3 else 0.35
    tr = sys.argv[4] if len(sys.argv) > 4 else None
    main(st, wk, vx, tr)
