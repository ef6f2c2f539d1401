"""hunter_bipedal_control_tpu — TPU-native NMPC + WBC framework for the
Hunter biped (JAX / XLA / Pallas / pjit).

Numerical-control workloads (Riccati recursions, KKT solves, Kalman
updates) need true float32 matmuls: the TPU default (bfloat16 passes on the
MXU) silently destroys the conditioning of the 22x22/38x38 factorizations
and the closed loop diverges.  We therefore force 'highest' matmul
precision on import; set HUNTER_TPU_FAST_MATMUL=1 to opt out for
throughput experiments on paths that tolerate it.
"""
import os

import jax

if os.environ.get("HUNTER_TPU_FAST_MATMUL") != "1":
    jax.config.update("jax_default_matmul_precision", "highest")

__version__ = "0.1.0"
