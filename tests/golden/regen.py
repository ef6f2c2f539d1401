"""Regenerate the golden stance->walk trace after an INTENTIONAL behavior
change (see tests/test_golden.py).  Reuses the recorded command sequence so
the scenario itself stays pinned.

    python tests/golden/regen.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/root/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

GOLDEN = os.path.join(os.path.dirname(__file__), "stance_walk_40p.npz")


def main():
    from hunter_bipedal_control_tpu.models.robot import load_model
    from hunter_bipedal_control_tpu.ocp import problem as ocp
    from hunter_bipedal_control_tpu.refs import swing_planner as swp, targets as tg
    from hunter_bipedal_control_tpu.runtime import loop as rloop
    from hunter_bipedal_control_tpu.runtime.controller import default_gains
    from hunter_bipedal_control_tpu.solver import sqp
    from hunter_bipedal_control_tpu.wbc.wbc import default_wbc_params

    F32 = jnp.float32
    DJ = jnp.array([0.10, 0., 0.40, 0.93, 0.53, -0.10, 0., -0.40, 0.93, -0.53],
                   F32)
    old = np.load(GOLDEN)
    cmds = old["cmds"]
    m = load_model(dtype=F32)
    settings = sqp.SqpSettings()
    qnom = jnp.concatenate([jnp.array([0., 0., 0.63], F32), jnp.zeros(3, F32),
                            DJ])
    params = ocp.make_input_cost(m, ocp.default_ocp_params(m), qnom)
    x0 = jnp.concatenate([jnp.zeros(6, F32), qnom])
    st = rloop.init_loop_state(m, settings, x0)
    NP = cmds.shape[0]
    fin, telem = jax.jit(
        lambda s, c: rloop.run_dummy_loop(
            m, settings, params, swp.default_swing_config(),
            default_wbc_params(), default_gains(), tg.default_cmd_vel_config(),
            rloop.LoopConfig(), s, c, NP, DJ,
        )
    )(st, jnp.asarray(cmds))
    np.savez(
        GOLDEN,
        cmds=cmds,
        x=np.asarray(telem["x"]),
        gait_level=np.asarray(telem["gait_level"]),
        violation=np.asarray(telem["violation"]),
    )
    x = np.asarray(telem["x"])
    print(f"regenerated {GOLDEN}: {NP} periods, final z={x[-1, 8]:.4f}, "
          f"vx={x[-1, 0]:+.3f}, median viol="
          f"{np.median(np.asarray(telem['violation'])):.2e}")


if __name__ == "__main__":
    main()
