"""Safety checks.

Parity: legged_controllers/include/legged_controllers/SafetyChecker.h:12-49
— orientation check |roll| > pi/2 (constructed by the reference at
LeggedController.cpp:91 but never invoked in its update loop; here it is
actually wired into the runtime tick chain), plus the position-limit trip
that the reference does enforce (LeggedController.cpp:196-209, implemented
in runtime/controller.py) and the WBC/MPC health checks.
"""
from __future__ import annotations

import jax.numpy as jnp


def check_orientation(x_centroidal, limit=jnp.pi / 2):
    """SafetyChecker::checkOrientation — True = safe."""
    roll = x_centroidal[11]
    return jnp.abs(roll) <= limit


def check_state_finite(x_centroidal):
    return jnp.isfinite(x_centroidal).all()


def check(x_centroidal) -> jnp.ndarray:
    """SafetyChecker::check — True = safe to continue."""
    return check_orientation(x_centroidal) & check_state_finite(x_centroidal)
