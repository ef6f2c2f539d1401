"""Velocity-envelope probe on real MuJoCo: top of the joystick scale
(joy.yaml scales to ±0.45 m/s).  Prints tail-mean tracking per command.

Usage: python tools/vx_probe.py [vx ...]   (default ±0.40, ±0.45)
"""
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
_cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hunter_bipedal_control_tpu.runtime.mj_loop import MjClosedLoop, Segment  # noqa: E402


def probe(vx, dur=8.0, ramp_via=None, **kw):
    loop = MjClosedLoop(**kw)
    segs = [Segment(1.0, (0., 0., 0., 0.), set_walk=False),
            Segment(0.5, (0., 0., 0., 0.), set_walk=True)]
    if ramp_via is not None:
        segs += [Segment(1.5, (ramp_via, 0., 0., 0.))]
    segs += [Segment(dur, (vx, 0., 0., 0.))]
    telem = loop.run(segs)
    t = telem["t"]
    tail = t > t[-1] - 0.6 * dur
    vxm = telem["v"][tail, 0].mean()
    print(f"cmd {vx:+.2f}: tail_vx {vxm:+.3f} err {vxm - vx:+.3f} "
          f"estop={int(bool(loop.estop))} min_z={telem['base_z'].min():.3f} "
          f"yaw_drift={telem['q'][-1, 3]:+.3f}", flush=True)
    return loop, telem


if __name__ == "__main__":
    cmds = [float(a) for a in sys.argv[1:]] or [0.40, 0.45, -0.40, -0.45]
    for v in cmds:
        probe(v, ramp_via=(0.3 * np.sign(v) if abs(v) > 0.37 else None))
