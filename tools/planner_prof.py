"""Sub-phase TPU timing of swing_planner.update_planner at BENCH_B.

DESIGN.md round-2 profile: prepare_references 34.8 ms of the 98 ms B=128
step, and update_planner alone is 24.2 ms.  This splits update_planner into
its internal stages to target the round-3 fusion:

  - windows      : swing_windows + next-phase searchsorted/gather chain
  - raibert      : per-(leg,phase) foothold candidates (interp + rot matvec)
  - picks        : fresh-window associative scans + stance gathers
  - nodes        : per-(leg,phase) swing/stance node assembly
  - full_planner : update_planner end to end (cross-check vs phase_bench)

Usage: python tools/planner_prof.py  (background; each new HLO compiles
slowly through the axon tunnel).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from __graft_entry__ import _build  # noqa: E402
from hunter_bipedal_control_tpu.gait.mode_schedule import (  # noqa: E402
    BIG_TIME, swing_windows)
from hunter_bipedal_control_tpu.refs import swing_planner as swp  # noqa: E402
from hunter_bipedal_control_tpu.refs.targets import interp_state  # noqa: E402
from hunter_bipedal_control_tpu.solver import mpc as mpc_mod  # noqa: E402

B = int(os.environ.get("BENCH_B", "128"))
REPS = int(os.environ.get("BENCH_REPS", "20"))

m, settings, pcfg = None, None, None
m, settings, params, pcfg, dj, x0, sched, target = _build(n_intervals=66, horizon=1.0)
state = mpc_mod.init_mpc_state(m, settings)
xs_b = jnp.tile(x0[None], (B, 1)) + 0.001 * jnp.arange(B, dtype=x0.dtype)[:, None]
P1 = swp.P1
NUM_FEET = swp.NUM_FEET


def timeit(name, f, *a):
    r = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(REPS):
        r = jax.block_until_ready(f(*a))
    ms = (time.perf_counter() - t0) / REPS * 1e3
    print(json.dumps({"phase": name, "ms_per_batch": round(ms, 3), "B": B}),
          flush=True)
    return r


horizon = settings.horizon
h_start, h_end = -horizon, 2 * horizon


def stage_windows(x):
    feet = mpc_mod._current_feet(m, x)
    starts, stops, cs = swing_windows(sched, h_start, h_end)
    next_phase_idx = jnp.clip(
        jax.vmap(lambda e: jnp.searchsorted(sched.event_times, e + 1e-6,
                                            side="right"))(stops.reshape(-1)
                                                           ).reshape(NUM_FEET, P1),
        0, P1 - 1)
    next_window_stop = jnp.take_along_axis(stops, next_phase_idx, axis=1)
    return (jnp.sum(starts) + jnp.sum(stops) + jnp.sum(cs)
            + jnp.sum(next_window_stop) + jnp.sum(feet))


timeit("windows", jax.jit(jax.vmap(stage_windows)), xs_b)


def stage_raibert(x):
    starts, stops, cs = swing_windows(sched, h_start, h_end)
    next_phase_idx = jnp.clip(
        jax.vmap(lambda e: jnp.searchsorted(sched.event_times, e + 1e-6,
                                            side="right"))(stops.reshape(-1)
                                                           ).reshape(NUM_FEET, P1),
        0, P1 - 1)
    next_window_stop = jnp.take_along_axis(stops, next_phase_idx, axis=1)
    last_real_event = jnp.max(jnp.where(sched.event_times < BIG_TIME / 2,
                                        sched.event_times, -BIG_TIME))
    is_tail = stops >= last_real_event - 1e-9
    next_middle_times = jnp.where(is_tail, stops, 0.5 * (stops + next_window_stop))
    current_body_pose = interp_state(target, 0.0)[6:12]
    current_body_vel = interp_state(target, 0.0)[0:3]
    ps = jnp.arange(P1)

    def leg_cand(leg):
        def cand_at(p):
            next_mid_t = next_middle_times[leg, p]
            next_mid_pose = interp_state(target, next_mid_t)[6:12]
            return swp._raibert_foothold(
                pcfg, leg, 0.0, stops[leg, p], next_mid_t, next_mid_pose,
                current_body_pose, current_body_vel, jnp.zeros(6, x.dtype))
        return jax.vmap(cand_at)(ps)

    cand = jax.vmap(leg_cand)(jnp.arange(NUM_FEET))
    return jnp.sum(cand)


timeit("windows_plus_raibert", jax.jit(jax.vmap(stage_raibert)), xs_b)


def stage_nodes(x):
    # node assembly alone, from synthetic picks (same shapes/dtypes)
    starts, stops, cs = swing_windows(sched, h_start, h_end)
    ps = jnp.arange(P1)
    last_stance = jnp.tile(x[None, None, 0:3], (NUM_FEET, P1, 1))
    next_stance = last_stance + 0.1

    def leg_nodes(leg):
        is_swing = cs[leg] < 0.5
        s, e = starts[leg], stops[leg]

        def nodes_at(p):
            sw_t, sw_p, sw_v = swp._swing_nodes(pcfg, s[p], e[p],
                                                last_stance[leg, p],
                                                next_stance[leg, p])
            st_t, st_p, st_v = swp._stance_nodes(s[p], e[p], next_stance[leg, p])
            sw = is_swing[p]
            return (jnp.where(sw, sw_t, st_t), jnp.where(sw, sw_p, st_p),
                    jnp.where(sw, sw_v, st_v))

        return jax.vmap(nodes_at)(ps)

    nt, npos, nv = jax.vmap(leg_nodes)(jnp.arange(NUM_FEET))
    return jnp.sum(nt) + jnp.sum(npos) + jnp.sum(nv)


timeit("nodes_assembly", jax.jit(jax.vmap(stage_nodes)), xs_b)


def full_planner(x):
    feet = mpc_mod._current_feet(m, x)
    refs, _ = swp.update_planner(pcfg, state.planner, sched, target, 0.0,
                                 horizon, jnp.zeros(6, x.dtype), feet)
    return sum(jnp.sum(leaf) for leaf in jax.tree.leaves(refs))


timeit("full_planner", jax.jit(jax.vmap(full_planner)), xs_b)
print("done", flush=True)
