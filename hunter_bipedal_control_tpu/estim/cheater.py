"""Ground-truth ("cheater") state estimation.

Parity: legged_estimation/src/FromTopicEstimate.cpp:17-46 — the reference's
cheater estimator substitutes ground-truth odometry for the Kalman filter
(declared as `legged_cheater_controller`, config/controllers.yaml:7-8).
Here the ground truth comes straight from the simulation backend state.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..models.centroidal import q_v_to_rbd_state, rbd_state_to_centroidal
from ..models.robot import RobotModel


def cheater_estimate(model: RobotModel, q_true, v_true):
    """(rbd_state (32,), centroidal x (22,)) from ground-truth plant state."""
    rbd = q_v_to_rbd_state(model, q_true, v_true)
    return rbd, rbd_state_to_centroidal(model, rbd)
