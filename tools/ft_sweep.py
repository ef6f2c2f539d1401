"""Flying-trot lever sweep on real MuJoCo (round 5): swing apex, policy
lead, ankle damping.  One process, sequential configs, prints one line per
run.

Usage: python tools/ft_sweep.py
"""
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
_cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hunter_bipedal_control_tpu.refs.swing_planner import default_swing_config  # noqa: E402
from hunter_bipedal_control_tpu.runtime.controller import reconfigure_gains  # noqa: E402
from hunter_bipedal_control_tpu.runtime.mj_loop import MjClosedLoop, Segment  # noqa: E402


def run_one(tag, vx=0.40, dur=4.0, swing_height=None, policy_lead=None,
            kd_feet=None, ramp=False, trace=None, vel_fb=None,
            swing_kp_scale=None, swing_lead=None, lead_forces=None,
            bias_y=None, ticks_per_mpc=None):
    kw = {}
    if ticks_per_mpc is not None:
        kw["ticks_per_mpc"] = ticks_per_mpc
    if swing_lead is not None:
        kw["swing_lead"] = swing_lead
    if lead_forces is not None:
        kw["lead_forces"] = lead_forces
    if swing_height is not None or vel_fb is not None or bias_y is not None:
        cfg = default_swing_config()
        if swing_height is not None:
            cfg = cfg._replace(swing_height=jnp.asarray(swing_height,
                                                        jnp.float32))
        if vel_fb is not None:
            cfg = cfg._replace(foothold_vel_fb=jnp.asarray(vel_fb,
                                                           jnp.float32))
        if bias_y is not None:
            fb = cfg.feet_bias
            sign = jnp.sign(fb[:, 1])
            cfg = cfg._replace(feet_bias=fb.at[:, 1].set(sign * bias_y))
        kw["swing_cfg"] = cfg
    if policy_lead is not None:
        kw["policy_lead"] = policy_lead
    loop = MjClosedLoop(fixed_gait="flying_trot", **kw)
    if kd_feet is not None:
        loop.gains = reconfigure_gains(loop.gains, kd_feet=kd_feet)
    if swing_kp_scale is not None:
        g = loop.gains
        loop.gains = reconfigure_gains(
            g, kp_big_swing=float(g.kp_big_swing) * swing_kp_scale,
            kp_small_swing=float(g.kp_small_swing) * swing_kp_scale)
    segs = [Segment(1.0, (0., 0., 0., 0.), set_walk=False),
            Segment(0.5, (0., 0., 0., 0.), set_walk=True)]
    if ramp:
        segs += [Segment(1.5, (0.2, 0., 0., 0.)),
                 Segment(1.0, (0.3, 0., 0., 0.))]
    segs += [Segment(dur, (vx, 0., 0., 0.))]
    telem = loop.run(segs)
    if trace:
        np.savez(trace, **telem)
    t = telem["t"]
    z = telem["base_z"]
    walk = t > 2.0
    fz = telem["contact_fz"][walk].sum(axis=1)
    tail = t > t[-1] - 1.5
    print(f"{tag:34s} estop={int(bool(loop.estop))} min_z={z.min():.3f} "
          f"tail_vx={telem['v'][tail, 0].mean():+.3f} "
          f"max|pitch|={np.abs(telem['q'][walk, 4]).max():.3f} "
          f"flight={float((fz < 1.0).mean()):.3f} "
          f"x_final={telem['q'][-1, 0]:+.2f}", flush=True)
    return loop, telem


if __name__ == "__main__":
    import itertools
    which = sys.argv[1] if len(sys.argv) > 1 else "a"
    if which == "a":
        run_one("baseline-0.40", 0.40)
        run_one("apex0.06", 0.40, swing_height=0.06)
        run_one("apex0.08", 0.40, swing_height=0.08)
        run_one("lead0.014", 0.40, policy_lead=0.014)
        run_one("lead0", 0.40, policy_lead=0.0)
    elif which == "b":
        run_one("apex0.06+lead0.014", 0.40, swing_height=0.06,
                policy_lead=0.014)
        run_one("kdfeet8", 0.40, kd_feet=8.0)
        run_one("apex0.06+kdfeet8", 0.40, swing_height=0.06, kd_feet=8.0)
        run_one("apex0.06+ramp", 0.40, swing_height=0.06, ramp=True)
    elif which == "c":
        # capture-point stepping feedback (SwingConfig.foothold_vel_fb)
        # x policy lead (lead0 walked in sweep A; lead28 fell)
        run_one("lead0+velfb1.0", 0.40, policy_lead=0.0, vel_fb=1.0)
        run_one("lead0+velfb0.5", 0.40, policy_lead=0.0, vel_fb=0.5)
        run_one("velfb1.0(lead28)", 0.40, vel_fb=1.0)
        run_one("lead0-8s", 0.40, dur=8.0, policy_lead=0.0,
                trace="/tmp/ft_lead0.npz")
    elif which == "j":
        # MAX_PHASES=56 ablation: which knobs are actually required?
        run_one("m56+nofl+velfb1-12s", 0.40, dur=12.0, vel_fb=1.0,
                lead_forces=False, trace="/tmp/ft_m56_full.npz")
        run_one("m56+parity-12s", 0.40, dur=12.0)
        run_one("m56+velfb1-12s", 0.40, dur=12.0, vel_fb=1.0)
        run_one("m56+nofl-12s", 0.40, dur=12.0, lead_forces=False)
    elif which == "i":
        # 250 Hz MPC (ticks_per_mpc=2): the TPU budget allows 2.5x the
        # reference's replan rate — tighter attitude feedback per step
        run_one("mpc250+nofl+velfb1-10s", 0.40, dur=10.0, vel_fb=1.0,
                lead_forces=False, ticks_per_mpc=2,
                trace="/tmp/ft_mpc250.npz")
        run_one("mpc250+lead0+velfb1-10s", 0.40, dur=10.0, policy_lead=0.0,
                vel_fb=1.0, ticks_per_mpc=2)
    elif which == "h":
        run_one("nofl+velfb1+y13-10s", 0.40, dur=10.0, vel_fb=1.0,
                lead_forces=False, bias_y=0.13)
        run_one("nofl+velfbY-10s", 0.40, dur=10.0,
                vel_fb=[0.6, 1.2, 0.0], lead_forces=False)
        run_one("nofl+velfb1+y13+apex6-10s", 0.40, dur=10.0, vel_fb=1.0,
                lead_forces=False, bias_y=0.13, swing_height=0.06,
                trace="/tmp/ft_h3.npz")
    elif which == "g":
        run_one("nofl+velfb1+apex6-10s", 0.40, dur=10.0, vel_fb=1.0,
                lead_forces=False, swing_height=0.06)
        run_one("nofl+velfb1@0.35-10s", 0.35, dur=10.0, vel_fb=1.0,
                lead_forces=False)
        run_one("lead20+nofl+velfb1-10s", 0.40, dur=10.0, policy_lead=0.020,
                vel_fb=1.0, lead_forces=False)
        run_one("nofl+velfb1+kd6-10s", 0.40, dur=10.0, vel_fb=1.0,
                lead_forces=False, kd_feet=6.0)
    elif which == "f":
        # motion lead WITHOUT force lead (forces sampled at t): tests the
        # stance-unloading hypothesis for the lead28 fall
        run_one("lead28+nofl+velfb1-10s", 0.40, dur=10.0, vel_fb=1.0,
                lead_forces=False, trace="/tmp/ft_nofl.npz")
        run_one("lead28+nofl-10s", 0.40, dur=10.0, lead_forces=False)
        run_one("lead14+nofl+velfb1-10s", 0.40, dur=10.0, policy_lead=0.014,
                vel_fb=1.0, lead_forces=False)
    elif which == "e":
        # per-leg swing lead: stance anchored at t, swing gets the catch-up
        run_one("lead0+swlead28-10s", 0.40, dur=10.0, policy_lead=0.0,
                swing_lead=0.028, trace="/tmp/ft_swlead.npz")
        run_one("lead0+swlead28+velfb1-10s", 0.40, dur=10.0, policy_lead=0.0,
                swing_lead=0.028, vel_fb=1.0,
                trace="/tmp/ft_swlead_fb.npz")
        run_one("lead0+swlead14-10s", 0.40, dur=10.0, policy_lead=0.0,
                swing_lead=0.014)
    elif which == "d":
        run_one("lead0+velfb1-10s", 0.40, dur=10.0, policy_lead=0.0,
                vel_fb=1.0, trace="/tmp/ft_velfb10.npz")
        run_one("lead0+velfb0.5-10s", 0.40, dur=10.0, policy_lead=0.0,
                vel_fb=0.5)
        run_one("lead0+kpx2-10s", 0.40, dur=10.0, policy_lead=0.0,
                swing_kp_scale=2.0)
        run_one("lead0+velfb1+kpx2-10s", 0.40, dur=10.0, policy_lead=0.0,
                vel_fb=1.0, swing_kp_scale=2.0)
    else:
        # custom: tag=vx,apex,lead,kd e.g. "0.40,0.06,0.028,4"
        for spec in sys.argv[1:]:
            v, ap, ld, kd = (float(x) if x != "-" else None
                             for x in spec.split(","))
            run_one(f"custom {spec}", v, swing_height=ap, policy_lead=ld,
                    kd_feet=kd)
