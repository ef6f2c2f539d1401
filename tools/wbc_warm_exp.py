"""Validate the WBC PDIP warm start against the cold-start reference.

Runs a walking closed loop (dummy backend) twice — cold 18-iter PDIP vs
warm-started qp_iters_warm — and reports per-tick QP residuals + solution
divergence.  CPU, small shapes.
"""
import time

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, "/root/repo")
from hunter_bipedal_control_tpu.models.robot import load_model
from hunter_bipedal_control_tpu.gait import mode_schedule as ms
from hunter_bipedal_control_tpu.ocp import problem as ocp
from hunter_bipedal_control_tpu.refs import swing_planner as swp, targets as tg
from hunter_bipedal_control_tpu.runtime import loop as rloop
from hunter_bipedal_control_tpu.runtime.controller import default_gains
from hunter_bipedal_control_tpu.solver import sqp
from hunter_bipedal_control_tpu.wbc.wbc import default_wbc_params

F32 = jnp.float32
DJ = jnp.array([0.10, 0., 0.40, 0.93, 0.53, -0.10, 0., -0.40, 0.93, -0.53], F32)


def run(wbc_params, n_periods=40):
    m = load_model(dtype=F32)
    settings = sqp.SqpSettings(n_intervals=26, horizon=0.4)
    qnom = jnp.concatenate([jnp.array([0., 0., 0.63], F32), jnp.zeros(3, F32), DJ])
    params = ocp.make_input_cost(m, ocp.default_ocp_params(m), qnom)
    x0 = jnp.concatenate([jnp.zeros(6, F32), qnom])
    st = rloop.init_loop_state(m, settings, x0)
    cmds = jnp.tile(jnp.asarray([0.25, 0., 0., 0.], F32)[None], (n_periods, 1))
    cmds = cmds.at[:8].set(0.0)
    fin, telem = jax.jit(
        lambda st_, cmds_: rloop.run_dummy_loop(
            m, settings, params, swp.default_swing_config(), wbc_params,
            default_gains(), tg.default_cmd_vel_config(), rloop.LoopConfig(),
            st_, cmds_, n_periods, DJ)
    )(st, cmds)
    return fin, telem


def main():
    t0 = time.time()
    cold = default_wbc_params()._replace(qp_warm_start=False)
    fin_c, tel_c = run(cold)
    print(f"cold done {time.time()-t0:.0f}s  final x[:3]="
          f"{np.asarray(fin_c.plant.x[:3])} z={float(fin_c.plant.x[8]):.4f} "
          f"estop={bool(fin_c.emergency_stop)}", flush=True)
    for it in (8, 10, 12):
        warm = default_wbc_params()._replace(qp_warm_start=True, qp_iters_warm=it)
        fin_w, tel_w = run(warm)
        dx = np.abs(np.asarray(fin_w.plant.x) - np.asarray(fin_c.plant.x)).max()
        dz = abs(float(fin_w.plant.x[8]) - float(fin_c.plant.x[8]))
        print(f"warm it={it}: final-state maxdiff {dx:.4g}  dz {dz:.4g} "
              f"estop={bool(fin_w.emergency_stop)} "
              f"z={float(fin_w.plant.x[8]):.4f}", flush=True)


if __name__ == "__main__":
    main()
