"""Does the MPC *plan* turn at the commanded yaw rate?

Round-4 measured closed-loop yaw tracking at a consistent ~53% of command
(0.26-0.27 at 0.5 rad/s; same ratio at 1.0) under the reference's target
shaping.  This experiment separates solver from execution: chain a few
solves from the nominal trot state with a pure yaw-rate command and fit the
plan's own yaw slope over the horizon.

Usage: python tools/yaw_plan_exp.py [yaw_rate]
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

from hunter_bipedal_control_tpu.models.robot import load_model
from hunter_bipedal_control_tpu.solver import mpc as mpc_mod
from hunter_bipedal_control_tpu.solver import sqp
from hunter_bipedal_control_tpu.ocp import problem as ocp
from hunter_bipedal_control_tpu.refs import targets as tg
from hunter_bipedal_control_tpu.refs import swing_planner as swp
from hunter_bipedal_control_tpu.gait import mode_schedule as ms
import jax.numpy as jnp

F32 = jnp.float32


def main(yaw_rate=0.5):
    m = load_model()
    settings = sqp.SqpSettings(lin_backend="dense")
    horizon = settings.horizon
    dj = jnp.array([0.10, 0., 0.40, 0.93, 0.53, -0.10, 0., -0.40, 0.93, -0.53], F32)
    qnom = jnp.concatenate([jnp.array([0., 0., 0.63], F32), jnp.zeros(3, F32), dj])
    params = ocp.make_input_cost(m, ocp.default_ocp_params(m), qnom)
    pcfg = swp.default_swing_config()
    cmd_cfg = tg.default_cmd_vel_config()

    x = jnp.zeros(22, F32).at[6:12].set(
        jnp.array([0., 0., 0.63, 0., 0., 0.], F32)).at[12:].set(dj)
    cmd = jnp.array([0., 0., 0., yaw_rate], F32)
    body_cmd6 = jnp.concatenate([cmd[0:3], jnp.zeros(2, F32), cmd[3:4]])

    state = mpc_mod.init_mpc_state(m, settings)
    sched = ms.tile_template(ms.TROT_GAIT(), -horizon, 6 * horizon)
    t = 0.0
    for it in range(6):
        target = tg.cmd_vel_to_target(cmd, x, t, horizon, cmd_cfg)
        sol, state, _ = mpc_mod.mpc_step(
            m, settings, params, pcfg, state, sched, target,
            jnp.asarray(t, F32), x, body_cmd6, dj)
        times = np.asarray(sol.times)
        yaw = np.asarray(sol.states[:, 9])
        hz = np.asarray(sol.states[:, 5])   # z angular momentum / m
        slope = np.polyfit(times, yaw, 1)[0]
        print(f"solve {it}: plan yaw slope {slope:+.3f} rad/s "
              f"(cmd {yaw_rate:+.2f}); yaw[0]={yaw[0]:+.4f} "
              f"yaw[-1]={yaw[-1]:+.4f}; hz mean {hz.mean():+.4f} "
              f"cost={float(sol.cost):.3f} viol={float(sol.constraint_violation):.2e}")
        # perfect execution: advance along the plan by one MPC period
        t += 0.01
        xs, us = mpc_mod.evaluate_policy(sol, jnp.asarray(t, F32))
        x = xs.astype(F32)


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 0.5)
