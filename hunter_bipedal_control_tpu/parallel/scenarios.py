"""Canned scenario sweeps (BASELINE.json configs 3-5).

  - cmd_vel sweep: velocity-tracking walking over a grid of commands
    (config 3: +-0.35 m/s, yaw — 1k scenarios on one chip)
  - push recovery: randomized initial-state perturbations with the
    estimator-in-the-loop physics sim (config 4)
  - domain sweep: terrain/gait-period/mass randomization hooks sharded
    over a multi-host mesh (config 5)

Each builder returns (batched initial conditions, per-scenario commands);
`run_*_sweep` vmaps the closed loop over them and shards the batch over the
mesh data axis.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.robot import RobotModel
from ..ocp import problem as ocp
from ..refs import swing_planner as swp, targets as tg
from ..runtime import loop as rloop
from ..runtime.controller import default_gains
from ..solver import sqp as sqp_mod
from ..wbc.wbc import default_wbc_params
from .sweep import make_mesh

DJ = np.array([0.10, 0., 0.40, 0.93, 0.53, -0.10, 0., -0.40, 0.93, -0.53],
              np.float32)


def cmd_vel_grid(n: int, vx_range=(-0.35, 0.35), vy_range=(-0.15, 0.15),
                 yaw_range=(-0.5, 0.5), seed=0):
    """(n, 4) commanded (vx, vy, 0, yaw_rate) grid/LHS sample."""
    rng = np.random.default_rng(seed)
    cmds = np.stack(
        [
            rng.uniform(*vx_range, n),
            rng.uniform(*vy_range, n),
            np.zeros(n),
            rng.uniform(*yaw_range, n),
        ],
        axis=1,
    ).astype(np.float32)
    return jnp.asarray(cmds)


def perturbed_initial_states(n: int, pos_std=0.03, vel_std=0.12, ang_std=0.04,
                             seed=1):
    """(n, 22) centroidal states around the nominal stance — push-recovery
    initial conditions.

    Default scales are calibrated to the measured recovery envelope of the
    trot controller on the full-order physics backend (pure-velocity kicks
    recover up to ~0.25 m/s; combined velocity+tilt kicks interact —
    2-sigma of these defaults sits at the envelope edge, so the benchmark
    discriminates rather than saturating at 0% or 100%)."""
    rng = np.random.default_rng(seed)
    x0 = np.concatenate([np.zeros(6), [0, 0, 0.63], np.zeros(3), DJ])
    xs = np.tile(x0, (n, 1))
    xs[:, 0:3] += rng.normal(0, vel_std, (n, 3))        # linear momentum kick
    xs[:, 3:6] += rng.normal(0, vel_std / 3, (n, 3))    # angular momentum kick
    xs[:, 6:8] += rng.normal(0, pos_std, (n, 2))
    xs[:, 8] += rng.normal(0, pos_std / 3, n)
    xs[:, 9:12] += rng.normal(0, ang_std, (n, 3))
    return jnp.asarray(xs, jnp.float32)


def domain_randomization(n: int, seed=2):
    """Per-scenario domain parameters (config 5): terrain pitch, gait period
    scale, payload mass scale."""
    rng = np.random.default_rng(seed)
    return {
        "terrain_pitch": jnp.asarray(rng.uniform(-0.12, 0.12, n), jnp.float32),
        "gait_scale": jnp.asarray(rng.uniform(0.8, 1.25, n), jnp.float32),
        "mass_scale": jnp.asarray(rng.uniform(0.9, 1.15, n), jnp.float32),
    }


class SweepResult(NamedTuple):
    final_vx: jnp.ndarray        # (B,)
    cmd_vx: jnp.ndarray          # (B,)
    base_z_min: jnp.ndarray      # (B,)
    base_z_max: jnp.ndarray
    max_violation: jnp.ndarray
    upright: jnp.ndarray         # (B,) bool: stayed within orientation band
    tracking_err: jnp.ndarray    # (B,) |vx_final - vx_cmd|


def run_cmd_vel_sweep(model: RobotModel, n_scenarios: int, n_periods: int = 60,
                      mesh=None, settings: sqp_mod.SqpSettings | None = None,
                      seed=0, chunk_size: int | None = None):
    """Config 3: batched closed-loop velocity tracking (dummy backend),
    sharded over the mesh data axis.  Returns SweepResult (per scenario).

    ``chunk_size`` runs the sweep as sequential device-sized chunks reusing
    one compiled executable — the per-chip HBM working set of the fused
    linearization (3x3 tiles pad 60x on TPU) caps a single launch at a few
    hundred scenarios; 1k+ sweeps chunk transparently."""
    settings = settings or sqp_mod.SqpSettings()
    dtype = jnp.float32
    dj = jnp.asarray(DJ)
    qnom = jnp.concatenate([jnp.asarray([0., 0., 0.63], dtype), jnp.zeros(3, dtype), dj])
    params = ocp.make_input_cost(model, ocp.default_ocp_params(model), qnom)
    x0 = jnp.concatenate([jnp.zeros(6, dtype), qnom])

    cmds = cmd_vel_grid(n_scenarios, seed=seed)
    cmd_seq = jnp.tile(cmds[:, None, :], (1, n_periods, 1))
    # ramp-in: zero command for the first 10 periods
    cmd_seq = cmd_seq.at[:, :10, :].set(0.0)

    def one(cmd_seq_i):
        st = rloop.init_loop_state(model, settings, x0)
        fin, telem = rloop.run_dummy_loop(
            model, settings, params, swp.default_swing_config(),
            default_wbc_params(), default_gains(), tg.default_cmd_vel_config(),
            rloop.LoopConfig(), st, cmd_seq_i, n_periods, dj,
        )
        zs = telem["x"][:, 8]
        # tail-mean velocity over the last 10 periods (~1 gait cycle+):
        # the instantaneous final vx oscillates with gait phase and was the
        # round-2 metric's noise floor (docs/DESIGN.md tracking band)
        vx_tail = telem["x"][-10:, 0].mean()
        return SweepResult(
            final_vx=vx_tail,
            cmd_vx=cmd_seq_i[-1, 0],
            base_z_min=zs.min(),
            base_z_max=zs.max(),
            max_violation=telem["violation"].max(),
            upright=jnp.abs(telem["x"][:, 10:12]).max() < 0.4,
            tracking_err=jnp.abs(vx_tail - cmd_seq_i[-1, 0]),
        )

    if mesh is None:
        mesh = make_mesh()
    shard = NamedSharding(mesh, P(tuple(mesh.axis_names)))
    fn = jax.jit(jax.vmap(one), in_shardings=shard, out_shardings=shard)

    if chunk_size is None or chunk_size >= n_scenarios:
        return fn(jax.device_put(cmd_seq, shard))

    chunks = []
    for i in range(0, n_scenarios, chunk_size):
        part = jax.device_put(cmd_seq[i:i + chunk_size], shard)
        chunks.append(jax.tree.map(np.asarray, fn(part)))
    return jax.tree.map(lambda *xs: jnp.concatenate([jnp.asarray(x) for x in xs]),
                        *chunks)


class PushRecoveryResult(NamedTuple):
    recovered: jnp.ndarray     # (B,) upright & on height at the end
    settled_vel: jnp.ndarray   # (B,) |vx| small at the end
    min_z: jnp.ndarray         # (B,)
    max_tilt: jnp.ndarray      # (B,) max |roll/pitch| over the run
    estop: jnp.ndarray         # (B,)


def run_push_recovery_sweep(model: RobotModel, n_scenarios: int,
                            n_periods: int = 100, mesh=None,
                            settings: sqp_mod.SqpSettings | None = None,
                            seed=1, chunk_size: int | None = None,
                            sensor_noise: bool = False):
    """Config 4: randomized momentum/pose kicks with the FULL estimator-in-
    the-loop physics sim (KF + momentum observer + WBC + PD motors +
    contacts), zero velocity command — measure recovery to quiet stance.
    ``sensor_noise=True`` corrupts IMU/encoders per the Gazebo-declared
    covariances (legged_gazebo/config/default.yaml) with per-scenario
    biases."""
    from ..backends.fullorder import default_sim_params
    from ..estim.contact import default_contact_params
    from ..estim.kalman import default_kalman_params
    from ..models.centroidal import base_velocity_from_momentum
    from ..models.kinematics import fk
    from ..runtime import sim_loop

    settings = settings or sqp_mod.SqpSettings()
    dtype = jnp.float32
    dj = jnp.asarray(DJ)
    qnom = jnp.concatenate([jnp.asarray([0., 0., 0.63], dtype), jnp.zeros(3, dtype), dj])
    params = ocp.make_input_cost(model, ocp.default_ocp_params(model), qnom)

    x0s = perturbed_initial_states(n_scenarios, seed=seed)
    cmds = jnp.zeros((n_periods, 4), dtype)
    noise_params = None
    if sensor_noise:
        from ..backends import sensor_noise as sn

        noise_params = sn.default_sensor_noise_params(dtype)
    noise_seeds = jnp.arange(n_scenarios, dtype=jnp.uint32) + 1000 * seed

    def one(x0, noise_seed):
        q0 = x0[6:]
        # re-ground: attitude/height kicks rotate the feet through the
        # ground plane; shift base z so the lowest contact point starts at
        # +0.5 mm (a buried foot in the stiff contact model launches the
        # plant and trips the e-stop — that's a spawn artifact, not a push)
        from ..models.kinematics import contact_positions
        feet_z = contact_positions(model, fk(model, q0))[:, 2].min()
        q0 = q0.at[2].add(-feet_z + 5e-4)
        vb = base_velocity_from_momentum(model, fk(model, q0), x0[0:6],
                                         jnp.zeros(model.nj, dtype))
        v0 = jnp.concatenate([vb, jnp.zeros(model.nj, dtype)])
        st = sim_loop.init_sim_loop_state(model, settings, q0, v0,
                                          noise_params=noise_params,
                                          noise_seed=noise_seed)
        # pre-engage trot: recovery from a kick needs stepping NOW; waiting
        # for the adaptive switch's next template event (up to one stance
        # period, as in the reference's findInsertModeSequenceTemplateTimer)
        # would measure gait-switch latency, not the controller
        from ..gait.mode_schedule import TROT_GAIT, tile_template

        trot_sched = tile_template(TROT_GAIT(), -settings.horizon,
                                   4.0 * settings.horizon)
        st = st._replace(gait=st.gait._replace(
            schedule=trot_sched, gait_level=jnp.asarray(1, jnp.int32)))
        fin, telem = sim_loop.run_sim_loop(
            model, settings, params, swp.default_swing_config(),
            default_wbc_params(), default_gains(), tg.default_cmd_vel_config(),
            default_kalman_params(), default_contact_params(),
            default_sim_params(), rloop.LoopConfig(), st, cmds, n_periods, dj,
            noise_params=noise_params,
        )
        qs = telem["q"]                       # (n_periods, 16)
        tilt = jnp.abs(qs[:, 3:6]).max()
        z_end = qs[-1, 2]
        upright = (jnp.abs(qs[-1, 3:6]).max() < 0.3) & (z_end > 0.5) & (z_end < 0.75)
        settled = jnp.abs(telem["vx_est"][-1]) < 0.15
        return PushRecoveryResult(
            recovered=upright,
            settled_vel=settled,
            min_z=telem["base_z"].min(),
            max_tilt=tilt,
            estop=fin.emergency_stop,
        )

    if mesh is None:
        mesh = make_mesh()
    shard = NamedSharding(mesh, P(tuple(mesh.axis_names)))
    fn = jax.jit(jax.vmap(one), in_shardings=shard, out_shardings=shard)

    if chunk_size is None or chunk_size >= n_scenarios:
        return fn(*jax.device_put((x0s, noise_seeds), shard))
    chunks = []
    for i in range(0, n_scenarios, chunk_size):
        part = jax.device_put((x0s[i:i + chunk_size],
                               noise_seeds[i:i + chunk_size]), shard)
        chunks.append(jax.tree.map(np.asarray, fn(*part)))
    return jax.tree.map(lambda *xs: jnp.concatenate([jnp.asarray(x) for x in xs]),
                        *chunks)


class DomainSweepResult(NamedTuple):
    upright: jnp.ndarray      # (B,)
    final_vx: jnp.ndarray     # (B,) estimated forward speed at the end
    min_z: jnp.ndarray        # (B,)
    estop: jnp.ndarray        # (B,)


def domain_sweep_fn(model: RobotModel, mesh, n_periods: int = 50,
                    cmd_vx: float = 0.25,
                    settings: sqp_mod.SqpSettings | None = None):
    """(jitted_fn, shard) for the config-5 domain sweep on ``mesh``.

    Exposed separately from :func:`run_domain_sweep` so the multichip
    dryrun can compile-inspect the per-scenario program (it must contain
    NO collectives — cross-device communication belongs only in the
    telemetry reduction, `sweep.psum_telemetry`) and time the same program
    class on different mesh sizes for the weak-scaling assertion."""
    from ..backends.fullorder import default_sim_params
    from ..estim.contact import default_contact_params
    from ..estim.kalman import default_kalman_params
    from ..runtime import sim_loop

    settings = settings or sqp_mod.SqpSettings()
    dtype = jnp.float32
    dj = jnp.asarray(DJ)
    qnom = jnp.concatenate([jnp.asarray([0., 0., 0.63], dtype), jnp.zeros(3, dtype), dj])
    params = ocp.make_input_cost(model, ocp.default_ocp_params(model), qnom)
    q0 = jnp.concatenate([jnp.asarray([0., 0., 0.624], dtype), jnp.zeros(3, dtype), dj])

    cmds = jnp.tile(jnp.asarray([cmd_vx, 0., 0., 0.], dtype)[None], (n_periods, 1))
    cmds = cmds.at[:10, :].set(0.0)  # ramp-in

    def one(pitch, gscale, mscale):
        g = 9.81
        sp = default_sim_params()._replace(
            gravity_delta=g * jnp.stack(
                [-jnp.sin(pitch), jnp.zeros_like(pitch), 1.0 - jnp.cos(pitch)]
            ),
            mass_scale=mscale,
        )
        st = sim_loop.init_sim_loop_state(model, settings, q0)
        st = st._replace(gait=st.gait._replace(gait_scale=gscale))
        fin, telem = sim_loop.run_sim_loop(
            model, settings, params, swp.default_swing_config(),
            default_wbc_params(), default_gains(), tg.default_cmd_vel_config(),
            default_kalman_params(), default_contact_params(), sp,
            rloop.LoopConfig(), st, cmds, n_periods, dj,
        )
        qs = telem["q"]
        upright = (jnp.abs(qs[:, 3:5]).max() < 0.4) & (qs[-1, 2] > 0.5)
        return DomainSweepResult(
            upright=upright,
            final_vx=telem["vx_est"][-1],
            min_z=telem["base_z"].min(),
            estop=fin.emergency_stop,
        )

    shard = NamedSharding(mesh, P(tuple(mesh.axis_names)))
    fn = jax.jit(jax.vmap(one), in_shardings=shard, out_shardings=shard)
    return fn, shard


def run_domain_sweep(model: RobotModel, n_scenarios: int, n_periods: int = 50,
                     cmd_vx: float = 0.25, mesh=None,
                     settings: sqp_mod.SqpSettings | None = None, seed=2,
                     chunk_size: int | None = None):
    """Config 5: domain sweep over terrain pitch x gait cadence x payload
    mass, walking at ``cmd_vx`` with the FULL estimator-in-the-loop physics
    sim.  Terrain pitch tilts the plant's gravity field and mass_scale is
    applied to the plant only — the controller keeps the nominal model, so
    this measures robustness to model mismatch.  Shard over a multi-host
    mesh ('host' x 'device' axes both map onto the batch) for 10k+ pod runs."""
    if mesh is None:
        mesh = make_mesh()
    fn, shard = domain_sweep_fn(model, mesh, n_periods=n_periods,
                                cmd_vx=cmd_vx, settings=settings)
    dom = domain_randomization(n_scenarios, seed=seed)
    args = (dom["terrain_pitch"], dom["gait_scale"], dom["mass_scale"])

    if chunk_size is None or chunk_size >= n_scenarios:
        return fn(*jax.device_put(args, shard))
    chunks = []
    for i in range(0, n_scenarios, chunk_size):
        part = jax.device_put(tuple(a[i:i + chunk_size] for a in args), shard)
        chunks.append(jax.tree.map(np.asarray, fn(*part)))
    return jax.tree.map(lambda *xs: jnp.concatenate([jnp.asarray(x) for x in xs]),
                        *chunks)


def summarize_domain_sweep(res: DomainSweepResult) -> dict:
    return {
        "n": int(res.upright.shape[0]),
        "upright_fraction": float(res.upright.mean()),
        "estop_fraction": float(res.estop.mean()),
        "mean_final_vx": float(res.final_vx.mean()),
        "min_z": float(res.min_z.min()),
    }


def summarize_push_recovery(res: PushRecoveryResult) -> dict:
    return {
        "n": int(res.recovered.shape[0]),
        "recovered_fraction": float(res.recovered.mean()),
        "settled_fraction": float(res.settled_vel.mean()),
        "estop_fraction": float(res.estop.mean()),
        "min_z": float(res.min_z.min()),
    }


def summarize_sweep(res: SweepResult) -> dict:
    """Cross-shard summary (collectives inserted by XLA)."""
    return {
        "n": int(res.final_vx.shape[0]),
        "mean_tracking_err": float(res.tracking_err.mean()),
        "p90_tracking_err": float(jnp.percentile(res.tracking_err, 90)),
        "upright_fraction": float(res.upright.mean()),
        "worst_violation": float(res.max_violation.max()),
        "z_band": [float(res.base_z_min.min()), float(res.base_z_max.max())],
    }
