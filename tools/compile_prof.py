"""Profile CPU compile time of the dryrun's component programs.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
       python tools/compile_prof.py [piece ...]

Pieces: mpc, tick, loop, sweep  (default: mpc tick)
"""
import sys
import time

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P


def timed(name, fn, *args):
    t0 = time.time()
    lowered = jax.jit(fn).lower(*args)
    t1 = time.time()
    compiled = lowered.compile()
    t2 = time.time()
    try:
        hlo_ops = compiled.as_text().count("\n")
    except Exception:
        hlo_ops = -1
    print(f"[{name}] lower {t1-t0:.1f}s  compile {t2-t1:.1f}s  hlo_lines {hlo_ops}",
          flush=True)
    return compiled


def main():
    pieces = sys.argv[1:] or ["mpc", "tick"]
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _build
    from hunter_bipedal_control_tpu.refs import targets as tg
    from hunter_bipedal_control_tpu.runtime import loop as rloop
    from hunter_bipedal_control_tpu.runtime.controller import default_gains
    from hunter_bipedal_control_tpu.solver import mpc as mpc_mod, sqp
    from hunter_bipedal_control_tpu.wbc.wbc import default_wbc_params
    from hunter_bipedal_control_tpu.parallel import scenarios
    from hunter_bipedal_control_tpu.parallel.sweep import make_mesh

    m, settings, params, pcfg, dj, x0, sched, target = _build(
        n_intervals=66, horizon=1.0)
    if "dense" in pieces:
        settings = settings._replace(lin_backend="dense")
    B = 8

    if "mpc" in pieces:
        state = mpc_mod.init_mpc_state(m, settings)

        def one_mpc(x_init):
            sol, st, _ = mpc_mod.mpc_step(
                m, settings, params, pcfg, state, sched, target, 0.0, x_init,
                jnp.zeros(6, x_init.dtype), dj)
            return sol.cost

        xs = jnp.tile(x0[None], (B, 1))
        timed("vmap mpc_step B=8", jax.vmap(one_mpc), xs)

    if "loop" in pieces:
        def one(x_init, cmd_vx):
            st = rloop.init_loop_state(m, settings, x_init)
            cmds = jnp.stack([cmd_vx, jnp.zeros_like(cmd_vx),
                              jnp.zeros_like(cmd_vx), jnp.zeros_like(cmd_vx)])
            fin, telem = rloop.run_dummy_loop(
                m, settings, params, pcfg, default_wbc_params(), default_gains(),
                tg.default_cmd_vel_config(), rloop.LoopConfig(), st, cmds[None],
                1, dj)
            return telem["cost"][-1], telem["violation"][-1], fin.plant.x

        xs = jnp.tile(x0[None], (B, 1))
        vxs = 0.3 * jnp.sin(jnp.arange(B, dtype=x0.dtype))
        timed("vmap run_dummy_loop(1 period) B=8", jax.vmap(one), xs, vxs)

    if "sweep" in pieces:
        mesh2 = make_mesh((2, 4), ("host", "device"))
        t0 = time.time()
        res = scenarios.run_domain_sweep(
            m, n_scenarios=16, n_periods=2, mesh=mesh2,
            settings=sqp.SqpSettings(n_intervals=66, horizon=1.0))
        jax.block_until_ready(res)
        print(f"[run_domain_sweep 16x2 on 2x4] total {time.time()-t0:.1f}s",
              flush=True)


if __name__ == "__main__":
    main()
