"""Physics-free closed-loop backend: integrate the solver's own dynamics.

Parity target: the reference's "dummy loop" test harness
(legged_interface/src/test/LeggedRobotDummyNode.cpp:51-100, OCS2
MRT_ROS_Dummy_Loop) — the canonical first e2e test (SURVEY.md §4): the
plant *is* the centroidal flow map driven by the policy's inputs, so any
MPC/reference/gait bug shows up as divergence.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..models.centroidal import flow_map
from ..models.robot import RobotModel


class DummyPlantState(NamedTuple):
    x: jnp.ndarray  # centroidal state (22,)
    t: jnp.ndarray


def init_dummy_plant(x0, t0=0.0) -> DummyPlantState:
    return DummyPlantState(x=x0, t=jnp.asarray(t0, x0.dtype))


def dummy_step(model: RobotModel, state: DummyPlantState, u, dt) -> DummyPlantState:
    """RK2 integration of the centroidal dynamics under the policy input."""
    k1 = flow_map(model, state.x, u)
    k2 = flow_map(model, state.x + dt * k1, u)
    return DummyPlantState(x=state.x + 0.5 * dt * (k1 + k2), t=state.t + dt)
