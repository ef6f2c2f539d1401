"""Config system: build framework parameter pytrees from .info files.

Drop-in compatibility with the reference's config layout
(legged_controllers/config/hunter/{task,reference,gait}.info): a user of
the reference points this loader at their existing files and gets the
equivalent TPU-native configuration objects.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..estim.contact import ContactObserverParams
from ..estim.kalman import KalmanParams
from ..gait.mode_schedule import GaitTemplate, make_template
from ..models.robot import RobotModel
from ..ocp.problem import OcpParams, default_ocp_params, make_input_cost
from ..refs.swing_planner import SwingConfig
from ..refs.targets import CmdVelConfig
from ..solver.ddp import DdpSettings
from ..solver.rollout import RolloutSettings
from ..solver.sqp import SqpSettings
from ..wbc.wbc import WbcParams
from . import info


class IpmSettings(NamedTuple):
    """Multiple-shooting IPM settings parity (task.info:97-129, loaded by
    the reference at LeggedInterface.cpp:93-95 — like the reference, parsed
    and carried but the product solver is SQP)."""

    n_intervals: int = 53
    horizon: float = 0.8
    n_iterations: int = 1              # ipmIteration
    g_max: float = 10.0
    g_min: float = 1e-6
    initial_barrier: float = 1e-4      # initialBarrierParameter
    target_barrier: float = 1e-4
    barrier_decrease_factor: float = 0.2
    barrier_superlinear_power: float = 1.5
    fraction_to_boundary: float = 0.995
    initial_slack_lower_bound: float = 1e-4
    initial_dual_lower_bound: float = 1e-4
    initial_slack_margin_rate: float = 1e-2
    initial_dual_margin_rate: float = 1e-2


class FrameworkConfig(NamedTuple):
    sqp: SqpSettings
    ocp: OcpParams
    swing: SwingConfig
    wbc: WbcParams
    kalman: KalmanParams
    contact: ContactObserverParams
    cmd_vel: CmdVelConfig
    gaits: dict            # name -> GaitTemplate
    default_joints: jnp.ndarray
    initial_state: jnp.ndarray
    # settings-parity blocks (loaded like the reference; SQP is the product
    # solver in both): ddp -> solver/ddp.py SLQ, ipm -> parsed only
    ddp: DdpSettings = DdpSettings()
    ipm: IpmSettings = IpmSettings()
    # TimeTriggeredRollout settings (task.info:131-140; LeggedInterface.cpp:156)
    rollout: RolloutSettings = RolloutSettings()


def load_task_config(model: RobotModel, task_path: str, reference_path: str | None = None,
                     gait_path: str | None = None, dtype=jnp.float32) -> FrameworkConfig:
    t = info.load(task_path)

    def g(key, default):
        v = info.get(t, key, default)
        return jnp.asarray(float(v), dtype)

    # --- solver (sqp + mpc blocks) ---
    dt = float(info.get(t, "sqp.dt", 0.015))
    horizon = float(info.get(t, "mpc.timeHorizon", 0.8))
    sqp_settings = SqpSettings(
        n_intervals=max(int(round(horizon / dt)), 2),
        horizon=horizon,
        n_iterations=int(info.get(t, "sqp.sqpIteration", 1)),
        g_max=float(info.get(t, "sqp.g_max", 1e-2)),
        g_min=float(info.get(t, "sqp.g_min", 1e-6)),
    )

    # --- ddp + ipm settings parity (LeggedInterface.cpp:93-95) ---
    ddp_dt = float(info.get(t, "ddp.timeStep", dt))
    ddp_settings = DdpSettings(
        n_intervals=max(int(round(horizon / ddp_dt)), 2),
        horizon=horizon,
        n_iterations=int(info.get(t, "ddp.maxNumIterations", 1)),
        hess_reg=float(info.get(t, "ddp.lineSearch.hessianCorrectionMultiple",
                                1e-5)),
        min_step=float(info.get(t, "ddp.lineSearch.minStepLength", 1e-2)),
    )
    # --- rollout block (TimeTriggeredRollout, task.info:131-140) ---
    rollout_settings = RolloutSettings(
        abs_tol=float(info.get(t, "rollout.AbsTolODE", 1e-5)),
        rel_tol=float(info.get(t, "rollout.RelTolODE", 1e-3)),
        time_step=float(info.get(t, "rollout.timeStep", 0.015)),
        integrator=str(info.get(t, "rollout.integratorType", "ODE45")),
        max_steps_per_second=float(
            info.get(t, "rollout.maxNumStepsPerSecond", 10000.0)),
    )
    ddp_settings = ddp_settings._replace(
        integrator=rollout_settings.integrator,
        abs_tol=rollout_settings.abs_tol,
        rel_tol=rollout_settings.rel_tol,
        max_steps_per_second=rollout_settings.max_steps_per_second,
    )

    ipm_dt = float(info.get(t, "ipm.dt", dt))
    ipm_settings = IpmSettings(
        n_intervals=max(int(round(horizon / ipm_dt)), 2),
        horizon=horizon,
        n_iterations=int(info.get(t, "ipm.ipmIteration", 1)),
        g_max=float(info.get(t, "ipm.g_max", 10.0)),
        g_min=float(info.get(t, "ipm.g_min", 1e-6)),
        initial_barrier=float(info.get(t, "ipm.initialBarrierParameter", 1e-4)),
        target_barrier=float(info.get(t, "ipm.targetBarrierParameter", 1e-4)),
        barrier_decrease_factor=float(
            info.get(t, "ipm.barrierLinearDecreaseFactor", 0.2)),
        barrier_superlinear_power=float(
            info.get(t, "ipm.barrierSuperlinearDecreasePower", 1.5)),
        fraction_to_boundary=float(
            info.get(t, "ipm.fractionToBoundaryMargin", 0.995)),
        initial_slack_lower_bound=float(
            info.get(t, "ipm.initialSlackLowerBound", 1e-4)),
        initial_dual_lower_bound=float(
            info.get(t, "ipm.initialDualLowerBound", 1e-4)),
        initial_slack_margin_rate=float(
            info.get(t, "ipm.initialSlackMarginRate", 1e-2)),
        initial_dual_margin_rate=float(
            info.get(t, "ipm.initialDualMarginRate", 1e-2)),
    )

    # --- OCP weights ---
    params = default_ocp_params(model, dtype)
    Q = info.get_matrix(t, "Q")
    if Q is not None:
        params = params._replace(Q=jnp.asarray(Q, dtype))
    params = params._replace(
        friction_coeff=g("frictionConeSoftConstraint.frictionCoefficient", 0.7),
        cone_mu=g("frictionConeSoftConstraint.mu", 0.1),
        cone_delta=g("frictionConeSoftConstraint.delta", 5.0),
        swing_weight=g("softSwingTraj.weight", 20.0),
        position_error_gain=g("model_settings.positionErrorGain", 20.0),
    )
    # R task-space block handled by make_input_cost with the initial state
    init_state = info.get_matrix(t, "initialState")
    x_init = (
        jnp.asarray(init_state[:, 0], dtype)
        if init_state is not None
        else jnp.zeros(12 + model.nj, dtype)
    )
    params = make_input_cost(model, params, x_init[6:])

    # --- swing trajectory config ---
    sw = SwingConfig(
        lift_off_velocity=g("swing_trajectory_config.liftOffVelocity", 0.05),
        touch_down_velocity=g("swing_trajectory_config.touchDownVelocity", 0.0),
        swing_height=g("swing_trajectory_config.swingHeight", 0.04),
        swing_time_scale=g("swing_trajectory_config.swingTimeScale", 0.15),
        feet_bias=jnp.asarray(
            [
                [float(info.get(t, "swing_trajectory_config.feet_bias_x1", 0.034)),
                 float(info.get(t, "swing_trajectory_config.feet_bias_y", 0.11)),
                 float(info.get(t, "swing_trajectory_config.feet_bias_z", -0.63))],
                [float(info.get(t, "swing_trajectory_config.feet_bias_x1", 0.034)),
                 -float(info.get(t, "swing_trajectory_config.feet_bias_y", 0.11)),
                 float(info.get(t, "swing_trajectory_config.feet_bias_z", -0.63))],
                [float(info.get(t, "swing_trajectory_config.feet_bias_x2", -0.056)),
                 float(info.get(t, "swing_trajectory_config.feet_bias_y", 0.11)),
                 float(info.get(t, "swing_trajectory_config.feet_bias_z", -0.63))],
                [float(info.get(t, "swing_trajectory_config.feet_bias_x2", -0.056)),
                 -float(info.get(t, "swing_trajectory_config.feet_bias_y", 0.11)),
                 float(info.get(t, "swing_trajectory_config.feet_bias_z", -0.63))],
            ],
            dtype,
        ),
        next_position_z=g("swing_trajectory_config.next_stance_position_z", 0.02),
        # not in the reference's task.info (repo extension, default 0.0 =
        # exact reference anchor); loading it here keeps the leaf an array
        # like every other SwingConfig field (weak-typed Python-float leaves
        # retrace when configs are swapped) — ADVICE r4
        foothold_yaw_lead=g("swing_trajectory_config.footholdYawLead", 0.0),
    )

    # --- WBC ---
    tlim = info.get_matrix(t, "torqueLimitsTask")
    wbc = WbcParams(
        torque_limits=jnp.asarray(
            tlim[:, 0] if tlim is not None else [28.0, 60, 60, 60, 28], dtype
        ),
        friction_coeff=g("frictionConeTask.frictionCoefficient", 0.7),
        swing_kp=g("swingLegTask.kp", 160.0),
        swing_kd=g("swingLegTask.kd", 18.0),
        base_accel_kp=g("baseAccelTask.kp", 40.0),
        base_accel_kd=g("baseAccelTask.kd", 4.0),
        base_height_kp=g("baseHeightTask.kp", 20.0),
        base_height_kd=g("baseHeightTask.kd", 3.0),
        base_angular_kp=g("baseAngularTask.kp", 20.0),
        base_angular_kd=g("baseAngularTask.kd", 3.0),
        weight_swing=g("weight.swingLeg", 100.0),
        weight_base_accel=g("weight.baseAccel", 1.0),
        weight_contact_force=g("weight.contactForce", 0.0),
    )

    # --- estimation ---
    kf = KalmanParams(
        foot_radius=g("kalmanFilter.footRadius", 0.02),
        imu_process_noise_position=g("kalmanFilter.imuProcessNoisePosition", 0.02),
        imu_process_noise_velocity=g("kalmanFilter.imuProcessNoiseVelocity", 0.02),
        foot_process_noise_position=g("kalmanFilter.footProcessNoisePosition", 0.5),
        foot_sensor_noise_position=g("kalmanFilter.footSensorNoisePosition", 0.5),
        foot_sensor_noise_velocity=g("kalmanFilter.footSensorNoiseVelocity", 0.1),
        foot_height_sensor_noise=g("kalmanFilter.footHeightSensorNoise", 0.01),
        high_suspect_number=jnp.asarray(100.0, dtype),
    )
    co = ContactObserverParams(
        cutoff_frequency=g("contactForceEsimation.cutoffFrequency", 250.0),
        contact_threshold=g("contactForceEsimation.contactThreshold", 75.0),
    )

    # --- reference.info ---
    default_joints = jnp.asarray(
        [0.10, 0., 0.40, 0.93, 0.53, -0.10, 0., -0.40, 0.93, -0.53], dtype
    )
    com_height = 0.63
    target_disp_vel, target_rot_vel = 0.5, 1.57
    if reference_path:
        r = info.load(reference_path)
        dj = info.get_matrix(r, "defaultJointState")
        if dj is not None:
            default_joints = jnp.asarray(dj[:, 0], dtype)
        com_height = float(info.get(r, "comHeight", com_height))
        target_disp_vel = float(info.get(r, "targetDisplacementVelocity", 0.5))
        target_rot_vel = float(info.get(r, "targetRotationVelocity", 1.57))

    cmd_cfg = CmdVelConfig(
        com_height=jnp.asarray(com_height, dtype),
        default_joints=default_joints,
        target_displacement_velocity=jnp.asarray(target_disp_vel, dtype),
        target_rotation_velocity=jnp.asarray(target_rot_vel, dtype),
        change_limit=jnp.asarray(0.05, dtype),
        deadband=jnp.asarray(0.05, dtype),
    )

    # --- gait.info ---
    gaits = {}
    if gait_path:
        gtree = info.load(gait_path)
        for name in info.get_list(gtree, "list") or []:
            seq = info.get_list(gtree, f"{name}.modeSequence")
            times = info.get_list(gtree, f"{name}.switchingTimes")
            if seq and times:
                gaits[name] = make_template(seq, times, dtype)

    return FrameworkConfig(
        sqp=sqp_settings,
        ocp=params,
        swing=sw,
        wbc=wbc,
        kalman=kf,
        contact=co,
        cmd_vel=cmd_cfg,
        gaits=gaits,
        default_joints=default_joints,
        initial_state=x_init,
        ddp=ddp_settings,
        ipm=ipm_settings,
        rollout=rollout_settings,
    )
