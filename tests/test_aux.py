"""Auxiliary subsystems: safety, cheater estimator, telemetry, checkpoint,
external odom fusion, self-collision."""
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

F32 = jnp.float32
DJ = jnp.array([0.10, 0., 0.40, 0.93, 0.53, -0.10, 0., -0.40, 0.93, -0.53], F32)


def test_safety_checker():
    from hunter_bipedal_control_tpu.runtime import safety

    x = jnp.zeros(22)
    assert bool(safety.check(x))
    assert not bool(safety.check(x.at[11].set(2.0)))     # rolled over
    assert not bool(safety.check(x.at[0].set(jnp.nan)))  # non-finite


def test_cheater_estimator(hunter_model_f32):
    from hunter_bipedal_control_tpu.estim.cheater import cheater_estimate

    q = jnp.concatenate([jnp.array([0.1, 0.2, 0.63], F32), jnp.zeros(3, F32), DJ])
    v = jnp.zeros(16, F32).at[0].set(0.3)
    rbd, x = cheater_estimate(hunter_model_f32, q, v)
    np.testing.assert_allclose(np.asarray(x[6:9]), [0.1, 0.2, 0.63], atol=1e-6)
    np.testing.assert_allclose(float(x[0]), 0.3, atol=1e-5)  # vcom ~ vx


def test_telemetry_roundtrip():
    from hunter_bipedal_control_tpu.runtime.telemetry import RepeatedTimer, TraceRecorder

    t = RepeatedTimer("x")
    with t:
        pass
    assert t.count == 1 and "avg" in t.summary()

    rec = TraceRecorder()
    rec.extend_stacked({"a": np.arange(3.0), "b": np.ones((3, 2))})
    assert len(rec) == 3
    with tempfile.TemporaryDirectory() as d:
        rec.save_npz(os.path.join(d, "t.npz"))
        data = np.load(os.path.join(d, "t.npz"))
        assert data["a"].shape == (3,)
        rec.save_jsonl(os.path.join(d, "t.jsonl"))
        assert os.path.getsize(os.path.join(d, "t.jsonl")) > 0


def test_checkpoint_roundtrip():
    from hunter_bipedal_control_tpu.parallel.checkpoint import (
        restore_sweep_state,
        save_sweep_state,
    )

    state = {"x": jnp.arange(8.0), "k": jnp.asarray(3)}
    with tempfile.TemporaryDirectory() as d:
        save_sweep_state(d, state, step=5)
        restored, step = restore_sweep_state(d, jax.tree.map(np.asarray, state))
        assert step == 5
        np.testing.assert_allclose(np.asarray(restored["x"]), np.arange(8.0))


def test_external_odom_fusion(hunter_model_f32):
    from hunter_bipedal_control_tpu.estim.kalman import (
        default_kalman_params,
        fuse_external_position,
        init_kalman_state,
    )

    ks = init_kalman_state()
    kp = default_kalman_params()
    new_pos = jnp.array([1.0, 2.0, 0.63], F32)
    ks2 = fuse_external_position(hunter_model_f32, ks, kp, new_pos,
                                 jnp.zeros(3, F32), DJ, jnp.ones(4, F32))
    np.testing.assert_allclose(np.asarray(ks2.x_hat[0:3]), [1.0, 2.0, 0.63], atol=1e-6)
    # feet moved with the base
    assert abs(float(ks2.x_hat[6]) - 1.0) < 0.2


def test_self_collision(hunter_model_f32):
    from hunter_bipedal_control_tpu.ocp.self_collision import (
        default_shin_pairs,
        pair_distances,
        self_collision_cost,
    )
    from hunter_bipedal_control_tpu.models.kinematics import fk

    m = hunter_model_f32
    q = jnp.concatenate([jnp.array([0., 0., 0.63], F32), jnp.zeros(3, F32), DJ])
    pairs = default_shin_pairs(m)
    d = pair_distances(m, fk(m, q), pairs)
    assert float(d.min()) > 0.0, "default stance should be collision-free"
    # roll both hips to one side -> legs approach each other
    d2a = pair_distances(m, fk(m, q.at[6].set(-0.2).at[11].set(0.2)), pairs)
    d2b = pair_distances(m, fk(m, q.at[6].set(0.2).at[11].set(-0.2)), pairs)
    assert min(float(d2a.min()), float(d2b.min())) < float(d.min())
    c = self_collision_cost(m, jnp.concatenate([jnp.zeros(6, F32), q]), pairs)
    assert np.isfinite(float(c))


def test_linalg_primitives(hunter_model_f32):
    """inv3 / gj_inverse / base_block_solve match LAPACK references."""
    from hunter_bipedal_control_tpu.ops.linalg import gj_inverse, inv3
    from hunter_bipedal_control_tpu.models.kinematics import fk
    from hunter_bipedal_control_tpu.models.centroidal import (
        base_block_solve, centroidal_momentum_matrix)

    rng = np.random.default_rng(11)
    # inv3: batched closed form
    M = jnp.asarray(rng.standard_normal((7, 3, 3)) + 3 * np.eye(3), jnp.float32)
    np.testing.assert_allclose(np.asarray(inv3(M) @ M),
                               np.broadcast_to(np.eye(3), (7, 3, 3)),
                               atol=2e-5)
    # gj_inverse: SPD batch, well-conditioned
    A = rng.standard_normal((5, 16, 16))
    A = jnp.asarray(A @ np.swapaxes(A, -1, -2) + 16 * np.eye(16), jnp.float32)
    np.testing.assert_allclose(np.asarray(gj_inverse(A) @ A),
                               np.broadcast_to(np.eye(16), (5, 16, 16)),
                               atol=5e-4)
    # base_block_solve: exact vs generic solve on the real CMM base block
    m = hunter_model_f32
    q = jnp.asarray(np.concatenate([rng.normal(0, 0.2, 6), rng.normal(0, 0.4, 10)]),
                    jnp.float32)
    Acmm = centroidal_momentum_matrix(m, fk(m, q))
    Ab = Acmm[:, :6]
    rhs = jnp.asarray(rng.standard_normal((6, 4)), jnp.float32)
    x_ref = jnp.linalg.solve(Ab, rhs)
    x_new = base_block_solve(m, Ab, rhs)
    np.testing.assert_allclose(np.asarray(x_new), np.asarray(x_ref),
                               atol=1e-4, rtol=1e-4)


def test_collision_distance_stream(hunter_model_f32):
    from hunter_bipedal_control_tpu.runtime.telemetry import self_collision_distances

    m = hunter_model_f32
    dj = jnp.array([0.10, 0., 0.40, 0.93, 0.53, -0.10, 0., -0.40, 0.93, -0.53],
                   jnp.float32)
    x = jnp.concatenate([jnp.zeros(6, jnp.float32),
                         jnp.array([0, 0, 0.63], jnp.float32),
                         jnp.zeros(3, jnp.float32), dj])
    xs = jnp.tile(x[None], (4, 1))
    d = self_collision_distances(m, xs)
    assert d.shape[0] == 4 and d.shape[1] >= 1
    # shins are apart at the default pose
    assert float(d.min()) > 0.05


def test_device_trace_context(tmp_path):
    from hunter_bipedal_control_tpu.runtime.telemetry import device_trace

    with device_trace(str(tmp_path)):
        jnp.ones(8).sum().block_until_ready()
    assert len(list(tmp_path.rglob("*"))) > 0
