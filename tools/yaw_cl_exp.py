"""Closed-loop yaw diagnostic on real MuJoCo.

tools/yaw_plan_exp.py shows the MPC plan turns at the FULL commanded rate
(+0.52 at cmd 0.5) under perfect execution, yet the closed loop delivers a
consistent ~53%.  This run records, per MPC period, the closed-loop plan's
own yaw slope — separating "the solver stops demanding the turn when fed
the real state" from "the execution layer under-delivers a full-rate plan".
Also compares KF yaw vs MuJoCo truth (gyro-integrated yaw drift would shift
the target anchor every re-solve).

Usage: python tools/yaw_cl_exp.py [yaw_rate] [dur] [yaw_lead]
"""
import sys

import os
import jax
jax.config.update("jax_platforms", "cpu")  # axon plugin ignores JAX_PLATFORMS
_cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from hunter_bipedal_control_tpu.runtime.mj_loop import MjClosedLoop, Segment


def main(rate=0.5, dur=4.0, yaw_lead=0.0, span=1.0, ang_kp=0.0, vel_fb=0.0):
    from hunter_bipedal_control_tpu.refs.swing_planner import default_swing_config
    from hunter_bipedal_control_tpu.refs.targets import default_cmd_vel_config
    from hunter_bipedal_control_tpu.wbc.wbc import default_wbc_params
    import jax.numpy as jnp
    cfg = default_swing_config()._replace(
        foothold_yaw_lead=jnp.asarray(yaw_lead, jnp.float32),
        foothold_vel_fb=jnp.asarray(vel_fb, jnp.float32))
    kw = {}
    if span != 1.0:
        kw["cmd_cfg"] = default_cmd_vel_config()._replace(
            span_scale=jnp.asarray(span, jnp.float32))
    if ang_kp > 0.0:
        wp = default_wbc_params()
        kw["wbc_params"] = wp._replace(
            base_angular_kp=jnp.asarray(ang_kp, jnp.float32))
    loop = MjClosedLoop(swing_cfg=cfg, **kw)
    plan_slopes = []

    def cb(lp):
        sol = lp.policy
        t = np.asarray(sol.times)
        yaw = np.asarray(sol.states[:, 9])
        plan_slopes.append((lp.plant.t, np.polyfit(t, yaw, 1)[0]))

    telem = loop.run([
        Segment(1.0, (0., 0., 0., 0.), set_walk=False),
        Segment(0.5, (0., 0., 0., 0.), set_walk=True),
        Segment(dur, (0., 0., 0., rate)),
    ], callback=cb)

    t = telem["t"]
    m = t > t[-1] - 0.6 * dur
    yaw_true = np.unwrap(telem["q"][m, 3])
    yaw_est = np.unwrap(telem["x_est"][m, 9])
    rate_true = np.polyfit(t[m], yaw_true, 1)[0]
    rate_est = np.polyfit(t[m], yaw_est, 1)[0]
    ps = np.array([s for pt, s in plan_slopes if pt > t[-1] - 0.6 * dur])
    # estop first: an early e-stop can leave the tail window empty, and the
    # diagnostic must survive exactly that case (ADVICE r4)
    print(f"yaw_lead {yaw_lead:.2f} span {span:.1f} ang_kp {ang_kp:.0f} "
          f"vel_fb {vel_fb:.1f} estop={bool(loop.estop)} "
          f"min_z={telem['base_z'].min():.3f}")
    print(f"cmd {rate:+.2f}: measured yaw rate {rate_true:+.3f} "
          f"(est {rate_est:+.3f})", end="")
    if ps.size:
        print(f"; closed-loop plan slope "
              f"mean {ps.mean():+.3f} p10 {np.percentile(ps, 10):+.3f} "
              f"p90 {np.percentile(ps, 90):+.3f}")
    else:
        print("; no plan samples in the tail window (early e-stop?)")
    # stance yaw authority check: wz during single-support vs double
    wz = telem["v"][m, 3]
    print(f"wz mean {wz.mean():+.3f} std {wz.std():.3f}")


if __name__ == "__main__":
    a = [float(x) for x in sys.argv[1:]]
    main(*(a or [0.5]))
