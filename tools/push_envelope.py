"""Push-recovery envelope on the real-MuJoCo closed loop.

VERDICT r2 #5: the reference's robustness culture is interactive pushes in
the MuJoCo sim UI (mujoco/src/main.cc); the committed analog is a measured
envelope — impulse magnitude x direction on MjClosedLoop.apply_push — with
a declared must-recover bar asserted by tests/test_mj_loop.py.

Protocol per scenario (one loop instance, reset between scenarios so the
jitted controller compiles once):
  stand 0.6 s -> (optionally engage trot at zero command for 0.5 s) ->
  100 ms world-frame force pulse of magnitude impulse/0.1 on the base ->
  1.6 s free recovery.
Recover = no e-stop, min base z > 0.45 m, and the last 0.3 s settles level
(|roll|,|pitch| < 0.15 rad) at height (|z - 0.645| < 0.04).

Prints one JSON line per scenario and a summary envelope per direction
(the largest impulse with all smaller impulses recovering).

Usage: python tools/push_envelope.py [--walk] [--out /tmp/push_env.json]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402

from hunter_bipedal_control_tpu.runtime.mj_loop import (  # noqa: E402
    MjClosedLoop, Segment)

DIRS = {"+x": (1, 0), "-x": (-1, 0), "+y": (0, 1), "-y": (0, -1)}
PUSH_DURATION = 0.1


def run_one(loop: MjClosedLoop, direction, impulse, walking):
    loop.reset()
    loop.run([Segment(0.6, (0., 0., 0., 0.), set_walk=False)], record=False)
    if walking:
        loop.run([Segment(0.5, (0., 0., 0., 0.), set_walk=True)], record=False)
    dx, dy = DIRS[direction]
    f = impulse / PUSH_DURATION
    loop.plant.apply_push([dx * f, dy * f, 0.0], duration=PUSH_DURATION)
    telem = loop.run([Segment(1.6, (0., 0., 0., 0.), set_walk=walking)])
    z = telem["base_z"]
    tail = telem["t"] > telem["t"][-1] - 0.3
    rollpitch = float(np.abs(telem["q"][tail][:, 3:5]).max())
    res = {
        "dir": direction, "impulse_Ns": impulse, "walking": walking,
        "estop": bool(loop.estop), "min_z": round(float(z.min()), 4),
        "tail_z": round(float(z[tail].mean()), 4),
        "tail_rollpitch": round(rollpitch, 4),
    }
    res["recovered"] = (not res["estop"] and res["min_z"] > 0.45
                        and rollpitch < 0.15
                        and abs(res["tail_z"] - 0.645) < 0.04)
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--walk", action="store_true",
                    help="push during trot instead of stance")
    ap.add_argument("--impulses", default="2,3,4,5,6,8")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    impulses = [float(s) for s in args.impulses.split(",")]

    loop = MjClosedLoop()
    results = []
    t0 = time.time()
    for direction in DIRS:
        for imp in impulses:
            r = run_one(loop, direction, imp, args.walk)
            r["wall_s"] = round(time.time() - t0, 1)
            results.append(r)
            print(json.dumps(r), flush=True)

    env = {}
    for direction in DIRS:
        ok = [r["impulse_Ns"] for r in results
              if r["dir"] == direction and r["recovered"]]
        # envelope = largest impulse with every smaller tested impulse green
        bar = 0.0
        for imp in sorted(impulses):
            if imp in ok:
                bar = imp
            else:
                break
        env[direction] = bar
    summary = {"envelope_Ns": env, "walking": args.walk,
               "n_scenarios": len(results)}
    print(json.dumps(summary), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"results": results, "summary": summary}, f, indent=1)


if __name__ == "__main__":
    main()
