"""Golden-trajectory regression guard.

A recorded 40-period stance->walk closed loop (dummy backend, f32 CPU)
pins the end-to-end behavior of the whole stack: models, gait, refs, SQP,
WBC, runtime.  Tolerances are loose enough for f32/XLA-version drift but
tight enough to catch behavioral regressions (changed gains, broken
constraints, reference-pipeline bugs).

Regenerate deliberately after *intentional* behavior changes:
    python tests/golden/regen.py   (see make-golden snippet in git history)
"""
import os

import jax
import pytest
import jax.numpy as jnp
import numpy as np

# closed-loop / sweep compile-heavy module -> slow tier (fast: -m 'not slow')
pytestmark = pytest.mark.slow

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "stance_walk_40p.npz")

F32 = jnp.float32
DJ = jnp.array([0.10, 0., 0.40, 0.93, 0.53, -0.10, 0., -0.40, 0.93, -0.53], F32)


def test_stance_walk_matches_golden(hunter_model_f32):
    from hunter_bipedal_control_tpu.ocp import problem as ocp
    from hunter_bipedal_control_tpu.refs import swing_planner as swp, targets as tg
    from hunter_bipedal_control_tpu.runtime import loop as rloop
    from hunter_bipedal_control_tpu.runtime.controller import default_gains
    from hunter_bipedal_control_tpu.solver import sqp
    from hunter_bipedal_control_tpu.wbc.wbc import default_wbc_params

    ref = np.load(GOLDEN)
    m = hunter_model_f32
    settings = sqp.SqpSettings()
    qnom = jnp.concatenate([jnp.array([0., 0., 0.63], F32), jnp.zeros(3, F32), DJ])
    params = ocp.make_input_cost(m, ocp.default_ocp_params(m), qnom)
    x0 = jnp.concatenate([jnp.zeros(6, F32), qnom])
    st = rloop.init_loop_state(m, settings, x0)
    NP = ref["x"].shape[0]
    fin, telem = jax.jit(
        lambda s, c: rloop.run_dummy_loop(
            m, settings, params, swp.default_swing_config(), default_wbc_params(),
            default_gains(), tg.default_cmd_vel_config(), rloop.LoopConfig(),
            s, c, NP, DJ,
        )
    )(st, jnp.asarray(ref["cmds"]))

    x = np.asarray(telem["x"])
    # gait switching decisions must match exactly
    np.testing.assert_array_equal(np.asarray(telem["gait_level"]), ref["gait_level"])
    # base height trajectory within f32-drift band
    np.testing.assert_allclose(x[:, 8], ref["x"][:, 8], atol=5e-3)
    # planar momentum/velocity trajectory
    np.testing.assert_allclose(x[:, 0:2], ref["x"][:, 0:2], atol=2e-2)
    # joint trajectories
    np.testing.assert_allclose(x[:, 12:], ref["x"][:, 12:], atol=3e-2)
    # solver health stays equivalent
    assert np.median(np.asarray(telem["violation"])) <= 2 * max(
        np.median(ref["violation"]), 1e-4
    )
