"""SoA (scalarized structure-of-arrays) core vs the dense oracles.

The SoA core (models/soa.py) re-expresses FK / CMM / constraint rows /
closed-form linearization with every scalar as its own batch-shaped array
(the TPU hot-path layout).  These tests pin it, at f64, to the vectorized
implementations — which are themselves oracle-tested against pure AD.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hunter_bipedal_control_tpu.models import soa
from hunter_bipedal_control_tpu.models.centroidal import flow_map
from hunter_bipedal_control_tpu.models.robot import load_model
from hunter_bipedal_control_tpu.ocp import problem as ocp

DJ = np.array([0.10, 0., 0.40, 0.93, 0.53, -0.10, 0., -0.40, 0.93, -0.53])


@pytest.fixture(scope="module")
def setup():
    m = load_model(dtype=jnp.float64)
    qnom = jnp.asarray(np.concatenate([[0., 0., 0.63], np.zeros(3), DJ]))
    params = ocp.make_input_cost(m, ocp.default_ocp_params(m, jnp.float64), qnom)
    rng = np.random.RandomState(11)
    B, K = 2, 3
    x = jnp.asarray(np.concatenate(
        [0.3 * rng.randn(B, K, 6), 0.05 * rng.randn(B, K, 3) + [0, 0, 0.63],
         0.3 * rng.randn(B, K, 3), DJ[None, None] + 0.2 * rng.randn(B, K, 10)],
        axis=2))
    u = jnp.asarray(rng.randn(B, K, 22) * np.r_[np.full(12, 30.0), np.full(10, 2.0)])
    fl = jnp.asarray(rng.randint(0, 2, (B, K, 4)).astype(np.float64))
    fpr = jnp.asarray(0.1 * rng.randn(B, K, 4, 3))
    fvr = jnp.asarray(0.1 * rng.randn(B, K, 4, 3))
    return m, params, x, u, fl, fpr, fvr


def test_combined_rows_matches_dense(setup):
    m, params, x, u, fl, fpr, fvr = setup
    ref = jax.vmap(jax.vmap(
        lambda a, b, c, d, e: ocp.combined_rows(m, params, a, b, c, d, e)
    ))(x, u, fl, fpr, fvr)
    got = soa.combined_rows_arrays(m, params, x, u, fl, fpr, fvr)
    for a, b in zip(ref, got):
        assert float(jnp.abs(a - b).max()) < 1e-11


def test_flow_matches_dense(setup):
    m, params, x, u, *_ = setup
    ref = jax.vmap(jax.vmap(lambda a, b: flow_map(m, a, b)))(x, u)
    got = soa.flow_arrays(m, x, u)
    assert float(jnp.abs(ref - got).max()) < 1e-11


def test_stage_merit_batch_matches_fused(setup):
    m, params, x, u, fl, fpr, fvr = setup
    dt = 0.015
    ref = jax.vmap(jax.vmap(
        lambda a, b, c, d, e, f: ocp.stage_merit_fused(
            m, params, a, b, c, d, e, f, dt)
    ))(x, u, x + 0.01, fl, fpr, fvr)
    got = ocp.stage_merit_batch(m, params, x, u, x + 0.01, fl, fpr, fvr, dt)
    for a, b in zip(ref, got):
        rel = float(jnp.abs(a - b).max()) / (float(jnp.abs(a).max()) + 1.0)
        assert rel < 1e-12


def test_knot_linearization_batch_matches_ad_oracle(setup):
    m, params, x, u, fl, fpr, fvr = setup
    dt = 0.015
    ref = jax.vmap(jax.vmap(
        lambda a, b, c, d, e, f: ocp.knot_linearization_fused_ad(
            m, params, a, b, c, d, e, f, dt)
    ))(x, u, x + 0.01, fl, fpr, fvr)
    got = ocp.knot_linearization_batch(m, params, x, u, x + 0.01, fl, fpr, fvr, dt)
    for a, b in zip(ref, got):
        rel = float(jnp.abs(a - b).max()) / (float(jnp.abs(a).max()) + 1.0)
        assert rel < 1e-11


def test_soa_jit_with_closure_model(setup):
    """build_consts must not trace model leaves under jit (regression:
    indexing a concrete jnp closure array inside a trace yields a tracer)."""
    m, params, x, u, fl, fpr, fvr = setup
    soa._CONSTS_CACHE.clear()
    f = jax.jit(lambda a: ocp.stage_merit_batch(
        m, params, a, u, a, fl, fpr, fvr, 0.015)[0])
    out = f(x)
    assert bool(jnp.all(jnp.isfinite(out)))
