"""Momentum-observer validation against simulated ground truth: standing on
the physics backend, the estimated per-leg contact wrench must converge to
the true contact forces (Bledt-observer correctness end to end)."""
import jax
import jax.numpy as jnp
import numpy as np

from hunter_bipedal_control_tpu.backends.fullorder import (
    default_sim_params,
    init_sim_state,
    sim_step,
)
from hunter_bipedal_control_tpu.estim.contact import (
    default_contact_params,
    init_contact_observer,
    momentum_observer_update,
)
from hunter_bipedal_control_tpu.models.centroidal import q_v_to_rbd_state
from hunter_bipedal_control_tpu.runtime.controller import JointCommand

F32 = jnp.float32
DJ = jnp.array([0.10, 0., 0.40, 0.93, 0.53, -0.10, 0., -0.40, 0.93, -0.53], F32)


def test_observer_recovers_contact_forces(hunter_model_f32):
    m = hunter_model_f32
    q0 = jnp.concatenate([jnp.array([0., 0., 0.624], F32), jnp.zeros(3, F32), DJ])
    sp = default_sim_params()
    st = init_sim_state(q0)
    cmd = JointCommand(pos_des=DJ, vel_des=jnp.zeros(10, F32),
                       kp=jnp.full(10, 40., F32), kd=jnp.full(10, 2., F32),
                       tau_ff=jnp.zeros(10, F32))
    step = jax.jit(lambda s: sim_step(m, sp, s, cmd))
    obs = init_contact_observer()
    op = default_contact_params()
    upd = jax.jit(lambda o, rbd, tau: momentum_observer_update(m, op, o, rbd, tau, 0.002))
    for _ in range(400):  # 0.8 s settle
        st = step(st)
        tau = (cmd.tau_ff + cmd.kp * (cmd.pos_des - st.q[6:])
               + cmd.kd * (cmd.vel_des - st.v[6:]))
        rbd = q_v_to_rbd_state(m, st.q, st.v)
        obs, _ = upd(obs, rbd, tau)

    true_l = float(st.contact_forces[0, 2] + st.contact_forces[2, 2])
    true_r = float(st.contact_forces[1, 2] + st.contact_forces[3, 2])
    est_l = float(obs.est_forces[2])   # wrench L, z component
    est_r = float(obs.est_forces[8])
    np.testing.assert_allclose(est_l, true_l, atol=3.0)
    np.testing.assert_allclose(est_r, true_r, atol=3.0)
    # force norms used by contact classification are in the same range
    assert 40.0 < float(obs.est_forces[12]) < 80.0
    assert 40.0 < float(obs.est_forces[13]) < 80.0
