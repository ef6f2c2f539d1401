"""Phase-level TPU timing of the batched MPC step.

Times, at BENCH_B (default 128) on the attached TPU:
  - full_mpc_step      : prepare_references + warm start + SQP solve
  - prepare_references : gait/swing/IK/interp reference pipeline alone
  - sqp_solve          : solve alone (precomputed reference bundles)
  - linearization      : the fused per-knot jacobian pass alone
  - merit_x6           : six line-search merit rollouts alone
The difference solve - linearization - merit_x6 approximates the
projection + Riccati + forward-sweep share.  Prints one JSON line per phase.

Usage: python tools/phase_bench.py   (run in background; new HLOs compile
slowly through the axon tunnel — results stream as they finish).
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
from hunter_bipedal_control_tpu.ocp import problem as ocp  # noqa: E402
from hunter_bipedal_control_tpu.solver import mpc as mpc_mod, sqp  # noqa: E402

B = int(os.environ.get("BENCH_B", "128"))
REPS = int(os.environ.get("BENCH_REPS", "10"))

m, settings, params, pcfg, dj, x0, sched, target = _build(n_intervals=66, horizon=1.0)
state = mpc_mod.init_mpc_state(m, settings)
N = settings.n_intervals
dt = settings.horizon / N
xs_b = jnp.tile(x0[None], (B, 1)) + 0.001 * jnp.arange(B, dtype=x0.dtype)[:, None]


def timeit(name, f, *a):
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(REPS):
        r = f(*a)
        jax.block_until_ready(r)
    ms = (time.perf_counter() - t0) / REPS * 1e3
    print(json.dumps({"phase": name, "ms_per_batch": round(ms, 2),
                      "B": B}), flush=True)
    return r


# ---- full step ----
def one_full(x):
    sol, _, _ = mpc_mod.mpc_step(
        m, settings, params, pcfg, state, sched, target, 0.0, x,
        jnp.zeros(6, x.dtype), dj)
    return sol.cost

timeit("full_mpc_step", jax.jit(jax.vmap(one_full)), xs_b)


# ---- prepare_references alone ----
def one_prep(x):
    bundle, _, _, _ = mpc_mod.prepare_references(
        m, settings, pcfg, state.planner, sched, target, 0.0, x,
        jnp.zeros(6, x.dtype), dj)
    return bundle

prep_j = jax.jit(jax.vmap(one_prep))
bundles = timeit("prepare_references", prep_j, xs_b)


# ---- warm-start trajectories (initializer, matches first solve) ----
def one_ws(bundle, x):
    return sqp.initializer_trajectories(m, settings, bundle, x)

ws_j = jax.jit(jax.vmap(one_ws))
xs_ws, us_ws = ws_j(bundles, xs_b)
jax.block_until_ready((xs_ws, us_ws))


# ---- solve alone ----
def one_solve(bundle, x, xw, uw):
    return sqp.solve(m, settings, params, bundle, x, xw, uw).cost

timeit("sqp_solve", jax.jit(jax.vmap(one_solve)), bundles, xs_b, xs_ws, us_ws)


# ---- fused linearization alone ----
def one_lin(bundle, xw, uw):
    out = jax.vmap(
        lambda k: ocp.knot_linearization_fused(
            m, params, xw[k], uw[k], bundle.x_nom[k], bundle.contact_flags[k],
            bundle.foot_pos_ref[k], bundle.foot_vel_ref[k], dt)
    )(jnp.arange(N))
    # sum every output so nothing is dead-code-eliminated
    return sum(jnp.sum(o) for o in out)

timeit("linearization", jax.jit(jax.vmap(one_lin)), bundles, xs_ws, us_ws)


# ---- line-search merit x6 alone ----
ALPHAS = jnp.asarray(settings.alphas, x0.dtype)


def one_merit6(bundle, xw, uw):
    def em(xs_, us_):
        costs, xnext, eq = jax.vmap(
            lambda k: ocp.stage_merit_fused(
                m, params, xs_[k], us_[k], bundle.x_nom[k],
                bundle.contact_flags[k], bundle.foot_pos_ref[k],
                bundle.foot_vel_ref[k], dt)
        )(jnp.arange(N))
        return dt * costs.sum() + jnp.abs(xs_[1:] - xnext).sum() + jnp.abs(eq).sum()

    def cand(alpha):
        return em(xw * (1.0 + 0.01 * alpha), uw * (1.0 + 0.01 * alpha))

    return jax.vmap(cand)(ALPHAS).sum()

timeit("merit_x6", jax.jit(jax.vmap(one_merit6)), bundles, xs_ws, us_ws)
print("done", flush=True)


# ---- prepare_references sub-phases (round-3 target per DESIGN.md) ----
from hunter_bipedal_control_tpu.refs import swing_planner as swp  # noqa: E402


def one_planner(x):
    feet = mpc_mod._current_feet(m, x)
    refs, _ = swp.update_planner(pcfg, state.planner, sched, target, 0.0,
                                 settings.horizon, jnp.zeros(6, x.dtype), feet)
    return sum(jnp.sum(leaf) for leaf in jax.tree.leaves(refs))


timeit("prep_swing_planner", jax.jit(jax.vmap(one_planner)), xs_b)


def one_jref(x):
    feet = mpc_mod._current_feet(m, x)
    refs, _ = swp.update_planner(pcfg, state.planner, sched, target, 0.0,
                                 settings.horizon, jnp.zeros(6, x.dtype), feet)
    n_samples = int(settings.horizon / mpc_mod.JOINT_REF_STEP) + 1
    tt = mpc_mod._joint_reference(m, target, refs, 0.0, settings.horizon, x,
                                  dj, n_samples)
    return jnp.sum(tt.states)


timeit("prep_planner_plus_ik", jax.jit(jax.vmap(one_jref)), xs_b)
print("prep interp/bundle share = prepare_references - prep_planner_plus_ik",
      flush=True)
