"""Flying-trot closed-loop demo experiment on real MuJoCo (VERDICT r3 #9).

The reference ships the flying trot in gait.info:22-73 (0.4 s period with
two 0.05 s full-flight phases); its adaptive switcher never inserts it
(SwitchedModelReferenceManager.cpp:185-249 trot-only, strict parity kept in
gait/adaptive.py), but the operator can select it explicitly via the
/gait_type topic.  This experiment drives MjClosedLoop(fixed_gait=
'flying_trot') at >=0.4 m/s — the harder dynamic test: ballistic phases,
0.15 s swings.

Usage: python tools/flying_trot_exp.py [vx ...]
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


def run(vx, dur=5.0, ramp=False):
    loop = MjClosedLoop(fixed_gait="flying_trot")
    segs = [
        Segment(1.0, (0., 0., 0., 0.), set_walk=False),
        Segment(0.5, (0., 0., 0., 0.), set_walk=True),
    ]
    if ramp:
        # engage the 0.15 s-stance gait at low speed, then accelerate —
        # the direct 0 -> 0.4 engagement falls within a second (round-4
        # measurement: estop, min_z 0.09 at both 0.40 and 0.45)
        segs += [Segment(1.5, (0.2, 0., 0., 0.)),
                 Segment(1.5, (0.3, 0., 0., 0.))]
    segs += [Segment(dur, (vx, 0., 0., 0.))]
    telem = loop.run(segs)
    t = telem["t"]
    late = t > t[-1] - 2.0
    v_tail = telem["v"][late, 0]
    # flight fraction: ticks with zero total vertical contact force
    walk = t > 2.0
    fz = telem["contact_fz"][walk].sum(axis=1)
    flight_frac = float((fz < 1.0).mean())
    print(f"cmd {vx:+.2f}: estop={bool(loop.estop)} "
          f"mean_vx_tail={v_tail.mean():+.3f} min_z={telem['base_z'].min():.3f} "
          f"flight_frac={flight_frac:.3f} gait_level={telem['gait_level'][-1]} "
          f"x_final={telem['q'][-1, 0]:+.2f}")
    return loop, telem


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--ramp"]
    ramp = "--ramp" in sys.argv[1:]
    cmds = [float(a) for a in args] or [0.40]
    for vx in cmds:
        run(vx, ramp=ramp)
