"""Randomized line-search parity property test (VERDICT r1 #7).

`SqpSettings.linesearch='model'` prunes the exhaustive 6-candidate
FilterLinesearch (OCS2 semantics, task.info:79-96) to 2 exact merit
rollouts by pre-selecting alpha on the Gauss-Newton model.  This test
randomizes scenarios (gait x command x state perturbation, >=100 cases)
and asserts the pruned search accepts the same alpha as the exhaustive
one — or, where it differs, lands on a point whose exact merit
(cost, violation) is not meaningfully worse.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hunter_bipedal_control_tpu.gait import mode_schedule as ms
from hunter_bipedal_control_tpu.ocp import problem as ocp
from hunter_bipedal_control_tpu.refs import swing_planner as swp, targets as tg
from hunter_bipedal_control_tpu.solver import mpc as mpc_mod, sqp

F32 = jnp.float32
DJ = jnp.array([0.10, 0., 0.40, 0.93, 0.53, -0.10, 0., -0.40, 0.93, -0.53], F32)


@pytest.mark.slow
def test_randomized_scenarios_model_vs_exhaustive(hunter_model_f32):
    m = hunter_model_f32
    settings = sqp.SqpSettings()
    qnom = jnp.concatenate([jnp.array([0., 0., 0.63], F32), jnp.zeros(3, F32), DJ])
    params = ocp.make_input_cost(m, ocp.default_ocp_params(m), qnom)
    pcfg = swp.default_swing_config(F32)
    cmd_cfg = tg.default_cmd_vel_config(nj=10, dtype=F32)

    rng = np.random.default_rng(7)
    B = 36  # x 3 gaits = 108 scenarios
    gaits = [ms.STANCE_GAIT(), ms.TROT_GAIT(), ms.FLYING_TROT_GAIT()]
    scheds = [ms.tile_template(g, -settings.horizon, 4 * settings.horizon)
              for g in gaits]
    # stack schedules into the batch: scenario i uses schedule i % 3
    sched_b = jax.tree.map(lambda *a: jnp.stack(a), *scheds)
    sched_idx = jnp.arange(3 * B) % 3
    sched_all = jax.tree.map(lambda a: a[sched_idx], sched_b)

    # randomized initial states (momentum, pose, joints) and commands
    x0 = jnp.concatenate([jnp.zeros(6, F32), qnom])
    dx = np.zeros((3 * B, 22), np.float32)
    dx[:, 0:6] = rng.normal(0, 0.15, (3 * B, 6))       # centroidal momentum
    dx[:, 6:8] = rng.normal(0, 0.05, (3 * B, 2))       # base xy
    dx[:, 8] = rng.normal(0, 0.02, 3 * B)              # base z
    dx[:, 9:12] = rng.normal(0, 0.06, (3 * B, 3))      # euler
    dx[:, 12:22] = rng.normal(0, 0.08, (3 * B, 10))    # joints
    x0s = x0[None] + jnp.asarray(dx)
    cmds = np.zeros((3 * B, 4), np.float32)
    cmds[:, 0] = rng.uniform(-0.45, 0.45, 3 * B)       # vx
    cmds[:, 1] = rng.uniform(-0.15, 0.15, 3 * B)       # vy
    cmds[:, 3] = rng.uniform(-0.4, 0.4, 3 * B)         # yaw rate
    cmds_j = jnp.asarray(cmds)

    def solve_mode(s):
        def one(sched, xi, cmd):
            target = tg.cmd_vel_to_target(cmd, xi, 0.0, s.horizon, cmd_cfg)
            body6 = jnp.concatenate([cmd[0:3], jnp.zeros(2, F32), cmd[3:4]])
            state = mpc_mod.init_mpc_state(m, s)
            sol, state, _ = mpc_mod.mpc_step(
                m, s, params, pcfg, state, sched, target, 0.0, xi, body6, DJ)
            # warm-started re-solve 10 ms later from the predicted state —
            # the regime where the pruned search actually operates
            sol2, _, _ = mpc_mod.mpc_step(
                m, s, params, pcfg, state, sched, target, 0.01,
                sol.states[1], body6, DJ)
            return (sol.step_size, sol.cost, sol.constraint_violation,
                    sol2.step_size, sol2.cost, sol2.constraint_violation)

        return jax.jit(jax.vmap(one))(sched_all, x0s, cmds_j)

    a1_md, c1_md, g1_md, a2_md, c2_md, g2_md = map(
        np.asarray, solve_mode(settings._replace(linesearch="model")))
    a1_m1, c1_m1, g1_m1, a2_m1, c2_m1, g2_m1 = map(
        np.asarray, solve_mode(settings._replace(linesearch="model1")))
    a1_ex, c1_ex, g1_ex, a2_ex, c2_ex, g2_ex = map(
        np.asarray, solve_mode(settings._replace(linesearch="exhaustive")))

    for (a_md, c_md, g_md, a_ex, c_ex, g_ex, tag) in (
        (a1_md, c1_md, g1_md, a1_ex, c1_ex, g1_ex, "cold"),
        (a2_md, c2_md, g2_md, a2_ex, c2_ex, g2_ex, "warm"),
        (a1_m1, c1_m1, g1_m1, a1_ex, c1_ex, g1_ex, "cold-1rollout"),
        (a2_m1, c2_m1, g2_m1, a2_ex, c2_ex, g2_ex, "warm-1rollout"),
    ):
        same = a_md == a_ex
        diff = ~same
        # where alphas differ, the model-accepted point must not be
        # meaningfully worse in BOTH exact merit axes
        cost_ok = c_md <= c_ex + 1e-3 * np.maximum(1.0, np.abs(c_ex))
        viol_ok = g_md <= g_ex + 1e-3 * np.maximum(1e-3, g_ex)
        bad = diff & ~(cost_ok | viol_ok)
        assert not bad.any(), (
            f"[{tag}] {bad.sum()} scenarios strictly dominated: "
            f"alphas md={a_md[bad]} ex={a_ex[bad]} "
            f"cost md={c_md[bad]} ex={c_ex[bad]} "
            f"viol md={g_md[bad]} ex={g_ex[bad]}")
        # and the pruned search should agree on the vast majority outright
        assert same.mean() > 0.9, (
            f"[{tag}] only {same.mean():.0%} alpha agreement; "
            f"md={a_md[diff]}, ex={a_ex[diff]}")
