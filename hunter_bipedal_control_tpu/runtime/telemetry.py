"""Telemetry & observability: timers, solver observers, trace recording.

Parity targets (SURVEY.md §5):
  - benchmark::RepeatedTimer max/average stats printed at shutdown
    (LeggedController.h:115-116, .cpp:359-366) -> RepeatedTimer
  - SolverObserver per-constraint metric streams
    (LeggedRobotSqpMpcNode.cpp:81-98) -> solver_observer (jit-able)
  - RViz trajectory/marker publishing (LeggedRobotVisualizer.cpp:140-178)
    -> TraceRecorder dumping npz/JSONL traces for offline plotting
  - odom/pose publishers at 200 Hz (StateEstimateBase.cpp:108-127)
    -> decimated odometry records
"""
from __future__ import annotations

import json
import time
from typing import Dict, List

import numpy as np


class RepeatedTimer:
    """max/average wall-clock stats, printed on demand (RepeatedTimer parity)."""

    def __init__(self, name: str):
        self.name = name
        self.count = 0
        self.total = 0.0
        self.worst = 0.0
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        dt = time.perf_counter() - self._t0
        self.count += 1
        self.total += dt
        self.worst = max(self.worst, dt)
        return dt

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, *exc):
        self.stop()

    def summary(self) -> str:
        avg = self.total / max(self.count, 1)
        return (f"[{self.name}] n={self.count} avg={avg * 1e3:.3f} ms "
                f"max={self.worst * 1e3:.3f} ms")


def solver_observer(model, params, sol, bundle):
    """Per-constraint solver metrics over the horizon — the SolverObserver
    metric streams, computed in one jit-able pass.

    Returns dict of (N,)- or (N,4)-shaped arrays:
      cone_margin, min margin of the friction cone per foot,
      eq_residual (projected equality constraints),
      force_z, joint_pos_margin, joint_vel_margin, swing_xy_err.
    """
    import jax
    import jax.numpy as jnp

    from ..ocp import problem as ocp

    N = sol.states.shape[0] - 1

    def knot(k):
        x, u = sol.states[k], sol.inputs[k]
        flags = bundle.contact_flags[k]
        fpr, fvr = bundle.foot_pos_ref[k], bundle.foot_vel_ref[k]
        f = u[0:12].reshape(4, 3)
        cone = params.friction_coeff * f[:, 2] - jnp.sqrt(
            f[:, 0] ** 2 + f[:, 1] ** 2 + params.cone_regularization
        )
        g, mask = ocp.eq_constraints(model, params, x, u, flags, fpr, fvr)
        qj = x[12:22]
        pos_margin = jnp.minimum(qj - params.joint_lower, params.joint_upper - qj)
        vel_margin = params.joint_vel_limit - jnp.abs(u[12:22])
        return {
            "cone_margin": cone,
            "eq_residual": jnp.abs(g * mask).max(),
            "force_z": f[:, 2],
            "joint_pos_margin": pos_margin.min(),
            "joint_vel_margin": vel_margin.min(),
        }

    import jax

    return jax.vmap(knot)(jnp.arange(N))


def self_collision_distances(model, xs, pairs=None):
    """Collision-pair distance stream over a state trajectory — the
    LeggedSelfCollisionVisualization parity surface (publishes pair
    distances at <=50 Hz, LeggedSelfCollisionVisualization.h:35-46).

    xs: (T, nx) centroidal states.  Returns (T, n_pairs) distances.
    """
    import jax
    import jax.numpy as jnp

    from ..models.kinematics import fk
    from ..ocp import self_collision as sc

    if pairs is None:
        pairs = sc.default_shin_pairs(model, xs.dtype)

    def one(x):
        return sc.pair_distances(model, fk(model, x[6:]), pairs)

    return jax.vmap(one)(xs)


class device_trace:
    """jax.profiler trace context for kernel-level TPU timing (the
    flamegraph-style tracing the reference lacks; SURVEY.md §5).  Usage:

        with device_trace("/tmp/jax_trace"):
            solve(...)  # then inspect with TensorBoard / xprof
    """

    def __init__(self, logdir: str):
        self.logdir = logdir

    def __enter__(self):
        import jax

        jax.profiler.start_trace(self.logdir)
        return self

    def __exit__(self, *exc):
        import jax

        jax.profiler.stop_trace()


class TraceRecorder:
    """Accumulates per-period telemetry dicts; dumps npz + JSONL summaries."""

    def __init__(self):
        self._records: List[Dict] = []

    def append(self, record: Dict):
        self._records.append(
            {k: np.asarray(v) for k, v in record.items()}
        )

    def extend_stacked(self, stacked: Dict):
        """Append a dict of stacked arrays (leading axis = periods), e.g.
        the telemetry pytree returned by run_dummy_loop/run_sim_loop."""
        n = len(next(iter(stacked.values())))
        for i in range(n):
            self.append({k: np.asarray(v)[i] for k, v in stacked.items()})

    def save_npz(self, path: str):
        if not self._records:
            return
        keys = self._records[0].keys()
        np.savez_compressed(
            path, **{k: np.stack([r[k] for r in self._records]) for k in keys}
        )

    def save_jsonl(self, path: str):
        with open(path, "w") as f:
            for r in self._records:
                f.write(json.dumps({k: np.asarray(v).tolist() for k, v in r.items()}))
                f.write("\n")

    def __len__(self):
        return len(self._records)


def odometry_record(t, x_est, v_base, covariance_diag=None):
    """Structured odometry sample (nav_msgs/Odometry analog)."""
    return {
        "t": float(t),
        "position": np.asarray(x_est[6:9]).tolist(),
        "euler_zyx": np.asarray(x_est[9:12]).tolist(),
        "linear_velocity": np.asarray(v_base[0:3]).tolist(),
        "covariance": (np.asarray(covariance_diag).tolist()
                       if covariance_diag is not None else None),
    }
