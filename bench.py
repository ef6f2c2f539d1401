"""Benchmark: MPC solves/s/chip + WBC QP solves/s + p99 latency vs budget.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Baseline (BASELINE.md): the reference's designed real-time budget —
100 MPC solves/s on its onboard CPU (task.info:150) and 500 WBC solves/s
(hunter.yaml loop_frequency).  vs_baseline is (our batched MPC solves/s per
chip) / 100.

Env knobs: BENCH_B (MPC batch, default 128), BENCH_WBC_B (default 4096),
BENCH_REPS (default 10), BENCH_QUICK=1 (tiny shapes, smoke only).
"""
import json
import os
import time

import numpy as np


def main():
    import jax

    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    from hunter_bipedal_control_tpu.models.centroidal import q_v_to_rbd_state, state_to_q
    from hunter_bipedal_control_tpu.solver import mpc as mpc_mod, sqp
    from hunter_bipedal_control_tpu.wbc.wbc import default_wbc_params, init_wbc_state, wbc_update
    from __graft_entry__ import _build

    quick = os.environ.get("BENCH_QUICK") == "1"
    B = int(os.environ.get("BENCH_B", "16" if quick else "128"))
    WB = int(os.environ.get("BENCH_WBC_B", "64" if quick else "4096"))
    reps = int(os.environ.get("BENCH_REPS", "3" if quick else "10"))

    # 1-second horizon per BASELINE.json metric definition
    n_int = 8 if quick else 66
    horizon = 0.24 if quick else 1.0
    m, settings, params, pcfg, dj, x0, sched, target = _build(n_intervals=n_int,
                                                              horizon=horizon)
    state = mpc_mod.init_mpc_state(m, settings)

    def one_mpc(x_init):
        sol, _, _ = mpc_mod.mpc_step(
            m, settings, params, pcfg, state, sched, target, 0.0, x_init,
            jnp.zeros(6, x_init.dtype), dj,
        )
        return sol.cost

    # ---- batched MPC throughput ----
    xs = jnp.tile(x0[None], (B, 1)) + 0.001 * jnp.arange(B, dtype=x0.dtype)[:, None]
    bat = jax.jit(jax.vmap(one_mpc))
    bat(xs).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        bat(xs).block_until_ready()
    dt_b = (time.perf_counter() - t0) / reps
    mpc_per_s = B / dt_b

    # ---- single-scenario latency (real-time path) ----
    single = jax.jit(one_mpc)
    single(x0).block_until_ready()
    lats = []
    for _ in range(max(reps * 3, 20)):
        t0 = time.perf_counter()
        single(x0).block_until_ready()
        lats.append(time.perf_counter() - t0)
    lat_p50 = float(np.percentile(lats, 50) * 1e3)
    lat_p99 = float(np.percentile(lats, 99) * 1e3)

    # ---- chained on-device latency: K back-to-back solves in one jit
    # (amortizes host dispatch; the number a locally-attached deployment
    # sees, and what the while-loop'd production runtime sustains) ----
    K_CHAIN = 4 if quick else 20

    def one_mpc_full(x_init):
        sol, _, _ = mpc_mod.mpc_step(
            m, settings, params, pcfg, state, sched, target, 0.0, x_init,
            jnp.zeros(6, x_init.dtype), dj,
        )
        return sol

    @jax.jit
    def chained(x):
        # data-dependent chain: each solve consumes the previous policy's
        # one-step state, so XLA cannot hoist the body out of the loop
        def body(c, _):
            sol = one_mpc_full(c)
            return sol.states[1], sol.cost
        _, costs = jax.lax.scan(body, x, None, length=K_CHAIN)
        return costs.sum()

    chained(x0).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(3):
        chained(x0).block_until_ready()
    lat_chained = (time.perf_counter() - t0) / 3 / K_CHAIN * 1e3

    # ---- batched WBC throughput ----
    wp = default_wbc_params()
    rbd = q_v_to_rbd_state(m, state_to_q(x0), jnp.zeros(16, x0.dtype))
    u0 = jnp.zeros(22, x0.dtype)

    def one_wbc(rbd_i):
        wx, _ = wbc_update(m, wp, init_wbc_state(), x0, u0, rbd_i,
                           jnp.ones(4, x0.dtype), jnp.asarray(False))
        return wx

    rbds = jnp.tile(rbd[None], (WB, 1)) + 1e-4 * jnp.arange(WB, dtype=x0.dtype)[:, None]
    wbat = jax.jit(jax.vmap(one_wbc))
    wbat(rbds).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        wbat(rbds).block_until_ready()
    wbc_per_s = WB * reps / (time.perf_counter() - t0)

    out = {
        "metric": "MPC solves/s/chip (batched, 1 s horizon, full ref-gen + SQP)",
        "value": round(mpc_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(mpc_per_s / 100.0, 2),
        "mpc_batch": B,
        "mpc_single_p50_ms": round(lat_p50, 2),
        "mpc_single_p99_ms": round(lat_p99, 2),
        "mpc_chained_ms": round(lat_chained, 2),
        "rt_budget_ms": 10.0,
        "wbc_solves_per_s": round(wbc_per_s, 1),
        "wbc_batch": WB,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
