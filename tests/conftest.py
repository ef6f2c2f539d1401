"""Test configuration: force CPU with an 8-device virtual mesh so sharding
tests run without TPU hardware, and enable x64 for numerical golden checks."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402  (import after env setup)
import pytest  # noqa: E402

# The axon TPU plugin can override JAX_PLATFORMS from the environment, so
# force the CPU backend through the config API as well (f64 golden tests
# need real float64, which the TPU backend silently truncates).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent compile cache: the big jitted graphs (MPC step, closed loops)
# dominate suite wall time; caching them across runs cuts full-suite time
_cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture(scope="session")
def hunter_model():
    import jax.numpy as jnp
    from hunter_bipedal_control_tpu.models.robot import load_model

    return load_model(dtype=jnp.float64)


@pytest.fixture(scope="session")
def hunter_model_f32():
    import jax.numpy as jnp
    from hunter_bipedal_control_tpu.models.robot import load_model

    return load_model(dtype=jnp.float32)
