"""Self-collision soft constraint: geometry, GGN consistency, and OCP wiring
(LeggedInterface.cpp:452-490 assembles the constraint into the problem; here
`OcpParams.collision` enables it, default None = the reference's empty pair
list)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hunter_bipedal_control_tpu.gait import mode_schedule as ms
from hunter_bipedal_control_tpu.ocp import penalties, problem as ocp
from hunter_bipedal_control_tpu.ocp import self_collision as sc
from hunter_bipedal_control_tpu.refs import swing_planner as swp, targets as tg
from hunter_bipedal_control_tpu.solver import mpc as mpc_mod, sqp

F32 = jnp.float32
DJ = jnp.array([0.10, 0., 0.40, 0.93, 0.53, -0.10, 0., -0.40, 0.93, -0.53], F32)


@pytest.fixture(scope="module")
def setup(hunter_model_f32):
    m = hunter_model_f32
    settings = sqp.SqpSettings()
    qnom = jnp.concatenate([jnp.array([0., 0., 0.63], F32), jnp.zeros(3, F32), DJ])
    params = ocp.make_input_cost(m, ocp.default_ocp_params(m), qnom)
    cfg = sc.default_collision_config(m)
    return m, settings, params, qnom, cfg


def _x_with_roll(qnom, d):
    """Roll both hips inward by d (l1/r1 are the hip rolls; default is
    outward +0.10/-0.10)."""
    q = qnom.at[6].add(-d).at[11].add(d)
    return jnp.concatenate([jnp.zeros(6, F32), q])


def test_margins_close_when_legs_cross(setup):
    m, settings, params, qnom, cfg = setup
    m0 = np.asarray(sc.surface_margins(m, cfg, _x_with_roll(qnom, 0.0)))
    m2 = np.asarray(sc.surface_margins(m, cfg, _x_with_roll(qnom, 0.2)))
    m3 = np.asarray(sc.surface_margins(m, cfg, _x_with_roll(qnom, 0.3)))
    assert (m0 > 0).all()
    assert (m2 < m0).all() and (m3 < m2).all()
    assert (m3 < 0).all()  # crossed = penetrating the safety margin
    # matches the list-based pair_distances API
    from hunter_bipedal_control_tpu.models.kinematics import fk

    pairs = sc.default_shin_pairs(m)
    kin = fk(m, _x_with_roll(qnom, 0.2)[6:])
    d_list = np.asarray(sc.pair_distances(m, kin, pairs))
    np.testing.assert_allclose(m2 + 0.05, d_list, atol=2e-6)


def test_collision_quadratic_matches_ad(setup):
    """GGN gradient must equal jacrev of the penalty; Hessian PSD."""
    m, settings, params, qnom, cfg = setup
    xs = jnp.stack([_x_with_roll(qnom, d) for d in (0.0, 0.1, 0.2)])
    p, qx, Qxx = sc.collision_quadratic_batch(m, cfg, xs)
    p_ref = sc.collision_penalty_batch(m, cfg, xs)
    np.testing.assert_allclose(np.asarray(p), np.asarray(p_ref), rtol=1e-6)
    g_ad = jax.vmap(jax.grad(
        lambda x: sc.collision_penalty_batch(m, cfg, x[None])[0]))(xs)
    # atol covers f32 cancellation noise in the AD gradient of the (exactly
    # rotation-invariant) base-pose columns
    np.testing.assert_allclose(np.asarray(qx), np.asarray(g_ad),
                               rtol=1e-4, atol=2e-4)
    eig = np.linalg.eigvalsh(np.asarray(Qxx, np.float64))
    assert eig.min() > -1e-5


def _flying_crossed_bundle(m, settings, qnom, roll):
    """Flight-phase bundle (no stance constraints pinning the feet — a
    stance schedule makes leg-crossing kinematically impossible, so neither
    variant would move) whose tracking reference pulls the hips into a
    leg-crossing configuration."""
    from hunter_bipedal_control_tpu.models.kinematics import (
        contact_positions, fk)

    N = settings.n_intervals
    q_cross = qnom.at[6].add(-roll).at[11].add(roll)
    x_cross = jnp.concatenate([jnp.zeros(6, F32), q_cross])
    feet = contact_positions(m, fk(m, q_cross))
    bundle = sqp.ReferenceBundle(
        times=jnp.linspace(0.0, settings.horizon, N + 1, dtype=F32),
        x_nom=jnp.tile(x_cross[None], (N + 1, 1)),
        contact_flags=jnp.zeros((N + 1, 4), F32),
        foot_pos_ref=jnp.tile(feet[None], (N + 1, 1, 1)),
        foot_vel_ref=jnp.zeros((N + 1, 4, 3), F32),
    )
    x0 = jnp.concatenate([jnp.zeros(6, F32), qnom])
    return x0, bundle


@pytest.mark.slow
def test_solver_steers_away_from_collision(setup):
    """A leg-crossing tracking command: without the constraint the solution
    crosses (negative margins); with it the solver keeps clearance.  Short
    flight horizon so the ballistic fall stays small against the height
    reference (a 0.8 s flight drops 3 m and swamps the comparison)."""
    m, _, params, qnom, cfg = setup
    settings = sqp.SqpSettings(n_intervals=16, horizon=0.24)
    x0, bundle = _flying_crossed_bundle(m, settings, qnom, 0.35)
    xs, us = sqp.initializer_trajectories(m, settings, bundle, x0)

    def run(p):
        sol = sqp.solve(m, settings, p, bundle, x0, xs, us)
        for _ in range(4):
            sol = sqp.solve(m, settings, p, bundle, x0, sol.states,
                            sol.inputs[:-1])
        return sol

    sol_off = run(params)
    sol_on = run(params._replace(collision=cfg))
    marg_off = np.asarray(jax.vmap(
        lambda x: sc.surface_margins(m, cfg, x))(sol_off.states))
    marg_on = np.asarray(jax.vmap(
        lambda x: sc.surface_margins(m, cfg, x))(sol_on.states))
    # measured: off drives to -0.047 by horizon end (crossing limited only
    # by the joint-velocity R cost); the barrier holds on at -0.019
    assert marg_off.min() < -0.035      # unconstrained solution crosses
    assert marg_on.min() > -0.025       # barrier arrests the crossing
    assert marg_on.min() > marg_off.min() + 0.015
