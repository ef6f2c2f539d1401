"""Flying-trot fall diagnosis on real MuJoCo (round 5).

Runs MjClosedLoop(fixed_gait='flying_trot'), saves the npz trace, and prints
a tick table around the fall: base z/pitch, per-foot vertical forces,
schedule-vs-estimated contact, early/late touchdown flags, plan z.

Usage: python tools/ft_diag.py [vx] [dur] [--trace /tmp/ft.npz]
       optional knob overrides:
         --swing-height H  --policy-lead S  --kd-feet K --ticks N
"""
import argparse
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

from hunter_bipedal_control_tpu.runtime.mj_loop import MjClosedLoop, Segment  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("vx", type=float, nargs="?", default=0.40)
    ap.add_argument("dur", type=float, nargs="?", default=3.0)
    ap.add_argument("--trace", default="/tmp/ft_diag.npz")
    ap.add_argument("--swing-height", type=float, default=None)
    ap.add_argument("--policy-lead", type=float, default=None)
    ap.add_argument("--kd-feet", type=float, default=None)
    ap.add_argument("--swing-scale", type=float, default=None,
                    help="swing_time_scale override")
    ap.add_argument("--ramp", action="store_true")
    a = ap.parse_args()

    kw = {}
    if a.swing_height is not None or a.swing_scale is not None:
        from hunter_bipedal_control_tpu.refs.swing_planner import (
            default_swing_config)
        cfg = default_swing_config()
        if a.swing_height is not None:
            cfg = cfg._replace(swing_height=jnp.asarray(a.swing_height,
                                                        jnp.float32))
        if a.swing_scale is not None:
            cfg = cfg._replace(swing_time_scale=jnp.asarray(a.swing_scale,
                                                            jnp.float32))
        kw["swing_cfg"] = cfg
    if a.policy_lead is not None:
        kw["policy_lead"] = a.policy_lead
    loop = MjClosedLoop(fixed_gait="flying_trot", **kw)
    if a.kd_feet is not None:
        from hunter_bipedal_control_tpu.runtime.controller import (
            reconfigure_gains)
        loop.gains = reconfigure_gains(loop.gains, kd_feet=a.kd_feet)

    segs = [Segment(1.0, (0., 0., 0., 0.), set_walk=False),
            Segment(0.5, (0., 0., 0., 0.), set_walk=True)]
    if a.ramp:
        segs += [Segment(1.5, (0.2, 0., 0., 0.))]
    segs += [Segment(a.dur, (a.vx, 0., 0., 0.))]
    telem = loop.run(segs)
    np.savez(a.trace, **telem)

    t = telem["t"]
    z = telem["base_z"]
    pitch = telem["q"][:, 4]
    fz = telem["contact_fz"]          # (T, 4) [L_toe R_toe L_heel R_heel]
    estop = bool(loop.estop)
    # fall moment: first tick below 0.45 (or end)
    low = np.nonzero(z < 0.45)[0]
    k_fall = int(low[0]) if low.size else len(t) - 1
    t_fall = t[k_fall]
    print(f"estop={estop} min_z={z.min():.3f} t_fall={t_fall:.3f} "
          f"x_final={telem['q'][-1, 0]:+.2f}")

    k0 = max(0, k_fall - 300)
    print(" t      z     pitch |  fzLt  fzRt  fzLh  fzRh | estC    e l | planz  vz")
    for k in range(k0, min(k_fall + 50, len(t)), 10):
        ec = "".join(str(int(bool(c))) for c in telem["est_contact"][k])
        print(f"{t[k]:6.3f} {z[k]:.3f} {pitch[k]:+.3f} | "
              f"{fz[k, 0]:5.0f} {fz[k, 1]:5.0f} {fz[k, 2]:5.0f} {fz[k, 3]:5.0f} | "
              f"{ec} {int(telem['early'][k].sum())} {int(telem['late'][k].sum())}"
              f" | {telem['x_opt'][k, 8]:.3f} {telem['v'][k, 2]:+.2f}")
    walk = t > 2.0
    tot = fz[walk].sum(axis=1)
    print(f"flight_frac={(tot < 1.0).mean():.3f}  "
          f"tail_vx={telem['v'][t > t[-1] - 1.0, 0].mean():+.3f}")


if __name__ == "__main__":
    main()
