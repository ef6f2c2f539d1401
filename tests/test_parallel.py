"""Sharded scenario sweeps on the 8-device virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hunter_bipedal_control_tpu.parallel import scenarios, sweep

# closed-loop / sweep compile-heavy module -> slow tier (fast: -m 'not slow')
pytestmark = pytest.mark.slow


def test_mesh_and_sharding():
    mesh = sweep.make_mesh()
    assert mesh.devices.size == len(jax.devices())
    x = jnp.arange(16.0).reshape(16, 1)
    xs = sweep.shard_batch(x, mesh)
    assert xs.sharding.num_devices == len(jax.devices())


def test_cmd_vel_sweep_sharded(hunter_model_f32):
    """16 scenarios over 8 virtual devices: upright, tracking responds."""
    res = scenarios.run_cmd_vel_sweep(
        hunter_model_f32, n_scenarios=16, n_periods=25
    )
    s = scenarios.summarize_sweep(res)
    assert s["n"] == 16
    assert s["upright_fraction"] >= 0.8
    assert s["z_band"][0] > 0.5 and s["z_band"][1] < 0.75
    assert np.isfinite(s["mean_tracking_err"])


def test_cmd_vel_tracking_band(hunter_model_f32):
    """Velocity-tracking band on the fullorder engine (VERDICT r2 #3):
    8 commands x 120 periods, tail-mean tracking error < 0.05 m/s
    (measured 0.021 mean / 0.042 max; docs/DESIGN.md round-3 tracking
    decomposition)."""
    from hunter_bipedal_control_tpu.solver import sqp

    res = scenarios.run_cmd_vel_sweep(
        hunter_model_f32, n_scenarios=8, n_periods=120,
        settings=sqp.SqpSettings(lin_backend="dense"), seed=3,
    )
    s = scenarios.summarize_sweep(res)
    assert s["upright_fraction"] == 1.0
    assert s["mean_tracking_err"] < 0.05
    assert float(res.tracking_err.max()) < 0.08


def test_scenario_builders():
    cmds = scenarios.cmd_vel_grid(32)
    assert cmds.shape == (32, 4)
    assert float(jnp.abs(cmds[:, 0]).max()) <= 0.35 + 1e-6
    xs = scenarios.perturbed_initial_states(8)
    assert xs.shape == (8, 22)
    dr = scenarios.domain_randomization(8)
    assert dr["terrain_pitch"].shape == (8,)


def test_two_axis_mesh_host_device(hunter_model_f32):
    """Multi-host sharding pattern (BASELINE config 5): a 2D ('host',
    'device') mesh with the scenario batch sharded over both axes — the
    same program layout a real 2-host DCN deployment uses (host axis maps
    to DCN, device axis to ICI)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from hunter_bipedal_control_tpu.parallel.sweep import make_mesh

    mesh = make_mesh((2, 4), ("host", "device"))
    shard = NamedSharding(mesh, P(("host", "device")))
    m = hunter_model_f32

    from hunter_bipedal_control_tpu.models.dynamics import mass_matrix

    B = 16
    qs = jnp.tile(
        jnp.concatenate([jnp.zeros(6, jnp.float32),
                         jnp.asarray(scenarios.DJ)])[None], (B, 1)
    )
    qs = jax.device_put(qs, shard)
    fn = jax.jit(jax.vmap(lambda q: mass_matrix(m, q)),
                 in_shardings=shard, out_shardings=shard)
    M = fn(qs)
    assert M.shape == (B, 16, 16)
    assert M.sharding.num_devices == 8
    # cross-host reduction: XLA inserts the collectives
    total = jax.jit(lambda M_: M_.trace(axis1=1, axis2=2).mean())(M)
    assert np.isfinite(float(total))


def test_push_recovery_sweep_small(hunter_model_f32):
    """Config 4 canned sweep: estimator-in-the-loop physics, tiny shapes."""
    from hunter_bipedal_control_tpu.solver import sqp as sqp_mod

    res = scenarios.run_push_recovery_sweep(
        hunter_model_f32, 8, n_periods=4,
        settings=sqp_mod.SqpSettings(n_intervals=8, horizon=0.24))
    s = scenarios.summarize_push_recovery(res)
    assert s["n"] == 8
    assert s["estop_fraction"] == 0.0
    assert s["min_z"] > 0.4


def test_domain_sweep_small(hunter_model_f32):
    """Config 5 canned sweep: terrain tilt + gait scale + plant mass
    mismatch on the physics backend, tiny shapes."""
    from hunter_bipedal_control_tpu.solver import sqp as sqp_mod
    from hunter_bipedal_control_tpu.gait.mode_schedule import TROT_GAIT, scale_template

    t = scale_template(TROT_GAIT(), 1.5)
    np.testing.assert_allclose(float(t.duration), 0.9, rtol=1e-6)

    res = scenarios.run_domain_sweep(
        hunter_model_f32, 8, n_periods=4,
        settings=sqp_mod.SqpSettings(n_intervals=8, horizon=0.24))
    s = scenarios.summarize_domain_sweep(res)
    assert s["n"] == 8
    assert s["min_z"] > 0.4
