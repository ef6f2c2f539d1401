"""Full-order articulated-body physics backend (the MuJoCo/Gazebo analog).

The reference runs physics out-of-process (MuJoCo over LCM UDP,
legged_examples/legged_mujoco + mujoco/src/main.cc, or the Gazebo plugin
legged_gazebo/src/LeggedHWSim.cpp).  TPU-native, the plant lives in the
same XLA program: full 16-DoF forward dynamics (mass matrix from the model
library), spring-damper ground contacts at the 4 toe/heel points with a
Coulomb-clamped tangential force, a PD + feedforward motor model applying
the hybrid joint command each substep (mirroring ``mycontroller`` in
mujoco/src/main.cc:243-248), effort-limit clamping, and the Gazebo-style
actuation delay buffer (LeggedHWSim.cpp:166-192, default 9 ms) as a
fixed-length command ring.

Batched over scenarios via vmap — thousands of simulated robots per chip.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.dynamics import mass_matrix, nle
from ..models.kinematics import contact_jacobians, contact_positions, fk
from ..models.robot import RobotModel
from ..runtime.controller import JointCommand

NV = 16
NJ = 10
NUM_FEET = 4


class SimParams(NamedTuple):
    dt: jnp.ndarray               # physics substep (e.g. 0.00025)
    substeps: int                 # substeps per control tick
    contact_kn: jnp.ndarray       # normal spring
    contact_dn: jnp.ndarray      # normal damper
    contact_kt: jnp.ndarray       # tangential damper
    friction_mu: jnp.ndarray
    armature: jnp.ndarray         # reflected rotor/gear inertia per joint
    joint_damping: jnp.ndarray    # implicit joint viscous damping
    delay_steps: int              # actuation delay in substeps (0 = off)
    # domain-sweep knobs (BASELINE config 5); None = off (statically elided)
    gravity_delta: jnp.ndarray | None = None  # (3,) extra uniform field (terrain tilt)
    mass_scale: jnp.ndarray | None = None     # plant link-mass/inertia scale
    # Sole-surface drop below the toe/heel FRAME origins (round 5).  The
    # reference's hunter.xml contacts on the foot-sole BOX surface, whose
    # bottom sits ~1.2 cm below the contact frames (measured via MuJoCo
    # geom_xpos at the nominal stance) — contacting at the frame origins
    # was the dominant term of the ~3 cm cross-engine settled-height split
    # (docs/DESIGN.md cross-engine table; tests/test_cross_engine.py).
    sole_drop: jnp.ndarray | None = None      # scalar; None = 0 (legacy)


def default_sim_params(dtype=jnp.float32, control_dt=0.002, substeps=8,
                       delay_ms=0.0) -> SimParams:
    """Contact/armature defaults tuned for the stiff ankle chain: the foot
    link is ~30 g (URDF), so a bare explicit integrator would need ~2 kHz
    contact frequencies; armature (reflected motor inertia, what MuJoCo's
    ``armature`` models) brings the effective foot inertia to a physical
    value and keeps 4 kHz substeps stable."""
    dt = control_dt / substeps
    return SimParams(
        dt=jnp.asarray(dt, dtype),
        substeps=substeps,
        contact_kn=jnp.asarray(2.0e4, dtype),
        contact_dn=jnp.asarray(300.0, dtype),
        contact_kt=jnp.asarray(500.0, dtype),
        friction_mu=jnp.asarray(0.7, dtype),
        armature=jnp.asarray(0.05, dtype),
        joint_damping=jnp.asarray(0.2, dtype),
        delay_steps=int(round(delay_ms * 1e-3 / dt)),
        sole_drop=jnp.asarray(0.0119, dtype),
    )


MAX_DELAY = 32


class SimState(NamedTuple):
    q: jnp.ndarray           # (16,)
    v: jnp.ndarray           # (16,)
    t: jnp.ndarray
    base_acc: jnp.ndarray    # (6,) last base acceleration (for IMU synthesis)
    contact_forces: jnp.ndarray  # (4,3) last contact forces
    cmd_buffer: jnp.ndarray  # (MAX_DELAY, 5, NJ) delayed command ring
    buf_head: jnp.ndarray    # int32


def init_sim_state(q0, v0=None, t0=0.0) -> SimState:
    dtype = q0.dtype
    v0 = v0 if v0 is not None else jnp.zeros(NV, dtype)
    return SimState(
        q=q0, v=v0, t=jnp.asarray(t0, dtype),
        base_acc=jnp.zeros(6, dtype),
        contact_forces=jnp.zeros((NUM_FEET, 3), dtype),
        cmd_buffer=jnp.zeros((MAX_DELAY, 5, NJ), dtype),
        buf_head=jnp.asarray(0, jnp.int32),
    )


def _contact_force(params: SimParams, p, vp):
    """Per-point spring-damper ground force (world frame).  The contact
    surface sits ``sole_drop`` below the toe/heel frames (the sole-box
    bottom in the reference's hunter.xml); the ground plane stays z=0."""
    drop = 0.0 if params.sole_drop is None else params.sole_drop
    pen = drop - p[2]
    in_contact = pen > 0.0
    fn = jnp.where(in_contact,
                   params.contact_kn * pen - params.contact_dn * vp[2], 0.0)
    fn = jnp.maximum(fn, 0.0)
    ft = jnp.where(in_contact, -params.contact_kt * vp[0:2], jnp.zeros(2, p.dtype))
    ft_norm = jnp.linalg.norm(ft) + 1e-9
    ft_max = params.friction_mu * fn
    ft = ft * jnp.minimum(1.0, ft_max / ft_norm)
    return jnp.concatenate([ft, fn[None]])


def _motor_torque(cmd_tuple, qj, vj, effort_limit):
    """PD + feedforward motor model, clamped to URDF effort limits."""
    pos_des, vel_des, kp, kd, ff = cmd_tuple
    tau = ff + kp * (pos_des - qj) + kd * (vel_des - vj)
    return jnp.clip(tau, -effort_limit, effort_limit)


def sim_step(model: RobotModel, params: SimParams, state: SimState,
             cmd: JointCommand) -> SimState:
    """Advance one control tick = `substeps` physics substeps under one
    hybrid joint command (with optional actuation delay)."""
    dtype = state.q.dtype
    cmd_stack = jnp.stack([cmd.pos_des, cmd.vel_des, cmd.kp, cmd.kd, cmd.tau_ff])

    # push into the delay ring; read the delayed slot
    buf = state.cmd_buffer.at[state.buf_head % MAX_DELAY].set(cmd_stack)
    head = state.buf_head + 1

    if params.delay_steps > 0:
        idx = (state.buf_head - params.delay_steps) % MAX_DELAY
        # before the buffer fills, fall back to the current command
        filled = state.buf_head >= params.delay_steps
        active = jnp.where(filled, buf[idx], cmd_stack)
    else:
        active = cmd_stack

    def substep(carry, _):
        q, v = carry
        kin = fk(model, q)
        p_c = contact_positions(model, kin)
        J = contact_jacobians(model, kin)[:, 0:3, :]          # (4,3,16)
        v_c = jnp.einsum("cij,j->ci", J, v)
        f_c = jax.vmap(lambda p, vp: _contact_force(params, p, vp))(p_c, v_c)

        tau = _motor_torque(active, q[6:], v[6:], model.joint_effort.astype(dtype))
        tau_gen = jnp.zeros(NV, dtype).at[6:].set(tau)
        tau_gen = tau_gen + jnp.einsum("cij,ci->j", J, f_c)

        M = mass_matrix(model, q)
        h = nle(model, q, v)
        ms = params.mass_scale
        if ms is not None:
            # uniform link mass/inertia scale: M and the inertia-derived
            # nle/gravity terms scale exactly; contacts and motors do not
            M = ms * M
            h = ms * h
        if params.gravity_delta is not None:
            # extra uniform field (terrain-tilt): generalized force of a
            # field a on all link masses is (sum_k m_k Jlin_k)^T a — the
            # linear block of the CMM
            from ..models.kinematics import link_com_jacobians

            Jl = link_com_jacobians(model, kin)[:, 0:3, :]     # (L,3,nv)
            field = jnp.einsum("k,kiv,i->v", model.link_mass.astype(dtype),
                               Jl, params.gravity_delta)
            tau_gen = tau_gen + (field if ms is None else ms * field)
        # armature on the actuated diagonal + implicit joint damping
        # (velocity-implicit: fold dt*d into the system matrix)
        arm = jnp.zeros(NV, dtype).at[6:].set(params.armature)
        damp = jnp.zeros(NV, dtype).at[6:].set(params.joint_damping)
        A_sys = M + jnp.diag(arm + params.dt * damp)
        rhs = tau_gen - h - damp * v
        from ..ops.linalg import gj_inverse
        a = gj_inverse(A_sys) @ rhs  # SPD mass matrix: no-LU inverse
        v_new = v + params.dt * a
        q_new = q + params.dt * v_new  # semi-implicit Euler
        return (q_new, v_new), (a, f_c)

    (q, v), (accs, fcs) = jax.lax.scan(
        substep, (state.q, state.v), None, length=params.substeps
    )
    return SimState(
        q=q, v=v, t=state.t + params.dt * params.substeps,
        base_acc=accs[-1][0:6],
        contact_forces=fcs[-1],
        cmd_buffer=buf,
        buf_head=head,
    )


def synth_imu(model: RobotModel, state: SimState):
    """Synthesize IMU readings (quaternion, local angular velocity, local
    linear acceleration incl. gravity) — what LeggedHWSim::readSim exposes
    from the simulated base link (LeggedHWSim.cpp:113-131)."""
    from ..models.spatial import (
        euler_rate_map_zyx,
        global_angular_velocity_from_euler_rates,
        rotation_zyx,
        zyx_to_quat,
    )

    zyx = state.q[3:6]
    R = rotation_zyx(zyx)
    quat = zyx_to_quat(zyx)
    omega_w = global_angular_velocity_from_euler_rates(zyx, state.v[3:6])
    omega_local = R.T @ omega_w
    # accelerometer: specific force = R^T (a_lin - g)
    a_lin = state.base_acc[0:3]
    accel_local = R.T @ (a_lin + jnp.asarray([0.0, 0.0, 9.81], state.q.dtype))
    return quat, omega_local, accel_local
