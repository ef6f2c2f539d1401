"""Prime the JAX persistent compile cache for the test suite (VERDICT r4 #7).

A fully cold `pytest tests/ -q` spends most of its wall time compiling a
handful of large HLOs (the closed-loop tick/period graphs, the sweep
bodies, the f64 golden oracles) serially inside whichever test hits them
first — the round-4 cold run died at a 2h13m timeout this way.  This
script compiles those graphs up front with progress output, so the
subsequent suite runs at warm-cache speed (~1 h for the full 120+ tests
on 2 CPU cores; the fast tier `-m 'not slow'` in ~15 min).

Usage:
    python tools/prewarm_cache.py            # default cache dir
    JAX_COMPILATION_CACHE_DIR=/path python tools/prewarm_cache.py

Recorded cold->warm cycle: see docs/DESIGN.md round-5 test records.
"""
import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")
_cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.time()


def step(name):
    print(f"[{time.time() - T0:7.1f}s] {name}", flush=True)


def main():
    import jax.numpy as jnp
    import numpy as np

    step("MuJoCo closed loop (tick + period jits, dense backend)")
    try:
        from hunter_bipedal_control_tpu.runtime.mj_loop import (
            MjClosedLoop, Segment)
        loop = MjClosedLoop()
        loop.run([Segment(0.06, (0., 0., 0., 0.), set_walk=False),
                  Segment(0.06, (0.3, 0., 0., 0.), set_walk=True)],
                 record=False)
        step("  + flying-trot fixed-gait variant")
        loop = MjClosedLoop(fixed_gait="flying_trot")
        loop.run([Segment(0.06, (0., 0., 0., 0.), set_walk=False),
                  Segment(0.06, (0.4, 0., 0., 0.), set_walk=True)],
                 record=False)
        step("  + cheater estimator variant")
        loop = MjClosedLoop(cheater=True)
        loop.run([Segment(0.06, (0., 0., 0., 0.), set_walk=False)],
                 record=False)
    except Exception as e:  # MuJoCo missing -> those tests skip anyway
        step(f"  skipped ({e!r})")

    step("scenario sweep body (dense backend)")
    try:
        from hunter_bipedal_control_tpu.models.robot import load_model
        from hunter_bipedal_control_tpu.parallel.scenarios import (
            run_cmd_vel_sweep)
        from hunter_bipedal_control_tpu.solver import sqp as sqp_mod
        run_cmd_vel_sweep(load_model(), n_scenarios=2, n_periods=2,
                          settings=sqp_mod.SqpSettings(lin_backend="dense"))
    except Exception as e:
        step(f"  sweep prewarm skipped ({e!r})")

    step("multichip dryrun (full training-step sharding)")
    # needs virtual devices BEFORE jax init:
    #   XLA_FLAGS=--xla_force_host_platform_device_count=8
    if len(jax.devices()) >= 8:
        try:
            import __graft_entry__
            __graft_entry__.dryrun_multichip(8)
        except Exception as e:
            step(f"  dryrun skipped ({e!r})")
    else:
        step("  skipped (launch with XLA_FLAGS="
             "--xla_force_host_platform_device_count=8 to include it)")

    step("done")


if __name__ == "__main__":
    main()
