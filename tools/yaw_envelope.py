"""Yaw-envelope measurement on real MuJoCo (round 5).

Measures closed-loop yaw-rate tracking (and body-frame forward speed for
combined commands) across the gain/lead configurations documented in
docs/DESIGN.md round-5 yaw section.  The defaults reproduce the shipped
MuJoCo-backend config (hip stance kp 75, feet decoupled).

  python tools/yaw_envelope.py                 # default config card
  python tools/yaw_envelope.py full            # kp 90 full-scale card
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
from hunter_bipedal_control_tpu.refs.targets import default_cmd_vel_config  # noqa: E402
from hunter_bipedal_control_tpu.runtime.controller import reconfigure_gains  # noqa: E402
from hunter_bipedal_control_tpu.runtime.mj_loop import MjClosedLoop, Segment  # noqa: E402


def run(tag, cmd=(0., 0., 0., 0.5), dur=5.0, yaw_lead=0.0, span=1.0,
        gain_updates=None):
    cfg = default_swing_config()._replace(
        foothold_yaw_lead=jnp.asarray(yaw_lead, jnp.float32))
    ccfg = default_cmd_vel_config()._replace(
        span_scale=jnp.asarray(span, jnp.float32))
    loop = MjClosedLoop(swing_cfg=cfg, cmd_cfg=ccfg)
    if gain_updates:
        loop.gains = reconfigure_gains(loop.gains, **gain_updates)
    telem = loop.run([Segment(1.0, (0., 0., 0., 0.), set_walk=False),
                      Segment(0.5, (0., 0., 0., 0.), set_walk=True),
                      Segment(dur, cmd)])
    t = telem["t"]
    m = t > t[-1] - 0.6 * dur
    yaw = np.unwrap(telem["q"][m, 3])
    rate = np.polyfit(t[m], yaw, 1)[0]
    # body-frame forward speed (world velocity rotated by heading — a
    # world-frame mean tends to zero over a turning arc)
    vb = (np.cos(telem["q"][m, 3]) * telem["v"][m, 0]
          + np.sin(telem["q"][m, 3]) * telem["v"][m, 1]).mean()
    print(f"{tag:30s} yaw_rate {rate:+.3f} vbody {vb:+.3f} "
          f"estop={int(bool(loop.estop))} "
          f"min_z={telem['base_z'].min():.3f}", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "default"
    if mode == "full":
        G = dict(kp_small_stance=90.0)  # pure-yaw envelope config
        run("k90 yaw0.5", cmd=(0., 0., 0., 0.5), gain_updates=G)
        run("k90 yaw1.5", cmd=(0., 0., 0., 1.5), gain_updates=G)
        run("k90+lead.3 yaw1.5", cmd=(0., 0., 0., 1.5), yaw_lead=0.3,
            span=2.0, gain_updates=G)
    else:
        run("default yaw0.5", cmd=(0., 0., 0., 0.5))
        run("default yaw1.0", cmd=(0., 0., 0., 1.0))
        run("default yaw1.5", cmd=(0., 0., 0., 1.5))
        run("default walk+turn", cmd=(0.3, 0., 0., 0.5), dur=6.0)
