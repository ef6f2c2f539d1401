"""Pallas Riccati kernel vs the XLA scan (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from hunter_bipedal_control_tpu.ops.riccati_kernel import riccati_backward_pallas
from hunter_bipedal_control_tpu.solver.riccati import StageLQ, backward_scan


def test_pallas_riccati_matches_scan():
    rng = np.random.default_rng(0)
    Bb, N, nx, nu = 256, 7, 6, 5  # 2 lane-blocks
    mk = lambda s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    A = mk((Bb, N, nx, nx)) * 0.2 + jnp.eye(nx, dtype=jnp.float32)[None, None]
    B = mk((Bb, N, nx, nu)) * 0.3
    d = mk((Bb, N, nx)) * 0.05
    Qxx = jnp.tile(jnp.eye(nx, dtype=jnp.float32)[None, None], (Bb, N, 1, 1))
    Qww = jnp.tile(jnp.eye(nu, dtype=jnp.float32)[None, None], (Bb, N, 1, 1))
    Qwx = mk((Bb, N, nu, nx)) * 0.05
    qx, qw = mk((Bb, N, nx)), mk((Bb, N, nu))

    K, kff = riccati_backward_pallas(A, B, d, Qxx, Qww, Qwx, qx, qw,
                                     reg=1e-6, interpret=True)
    S0 = jnp.zeros((nx, nx), jnp.float32)
    s0 = jnp.zeros(nx, jnp.float32)
    lq = StageLQ(A, B, d, Qxx, Qww, Qwx, qx, qw)
    Kr, kr, _, _ = jax.vmap(
        lambda l: backward_scan(l, S0, s0, 1e-6, use_ns=False)
    )(lq)
    np.testing.assert_allclose(np.asarray(K), np.asarray(Kr), atol=1e-4)
    np.testing.assert_allclose(np.asarray(kff), np.asarray(kr), atol=1e-4)
