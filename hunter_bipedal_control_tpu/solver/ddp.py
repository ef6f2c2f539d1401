"""SLQ/DDP solver — the reference's alternative solver family.

Parity: the reference loads `ddp` settings (SLQ algorithm, 1 iteration,
LINE_SEARCH strategy, task.info:36-75) alongside SQP; its product path
instantiates SQP only, but the capability exists.  This is the TPU-native
single-shooting counterpart: identical per-knot linearization + projected
constraints + Riccati backward pass as solver/sqp.py, but the forward pass
is a *nonlinear closed-loop rollout*

    u_k = u_bar_k + alpha kff_k + K_k (x_k - x_bar_k)

so iterates stay dynamically feasible (the defining SLQ/DDP property), with
all line-search step sizes rolled out in one vmap.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.robot import RobotModel
from ..ocp import problem as ocp
from . import riccati
from .sqp import ReferenceBundle, SqpSettings, SqpSolution, rk2_step


class DdpSettings(NamedTuple):
    """ddp block of task.info (:36-75)."""

    n_intervals: int = 53
    horizon: float = 0.8
    n_iterations: int = 1          # maxNumIterations
    hess_reg: float = 1e-5         # DIAGONAL_SHIFT hessianCorrection
    proj_reg: float = 1e-6
    min_step: float = 1e-2         # lineSearch.minStepLength
    alphas: tuple = (1.0, 0.5, 0.25, 0.1, 0.03, 0.01)
    # TimeTriggeredRollout integrator for the nonlinear (line-search and
    # feasibility) rollouts — the reference configures ODE45 here
    # (task.info:131-140) while the SQP sensitivity integrator stays RK2.
    # 'RK2' (default, fastest) | 'ODE45' | 'RK4'; see solver/rollout.py.
    integrator: str = "RK2"
    abs_tol: float = 1e-5          # AbsTolODE
    rel_tol: float = 1e-3          # RelTolODE
    max_steps_per_second: float = 10000.0
    max_substeps: int = 16         # static bound on ODE45 slots per interval


def solve(model: RobotModel, settings: DdpSettings, params: ocp.OcpParams,
          refs: ReferenceBundle, x_init, xs_ws, us_ws) -> SqpSolution:
    """One SLQ solve from a (feasible or not) warm start.  The first
    rollout re-closes feasibility; subsequent iterations are standard SLQ
    backward/forward sweeps."""
    N = settings.n_intervals
    dt = settings.horizon / N
    nx = xs_ws.shape[1]
    nu = us_ws.shape[1]
    dtype = xs_ws.dtype

    if settings.integrator.upper() == "RK2":
        integ = lambda x, u: rk2_step(model, x, u, dt)  # noqa: E731
    else:
        from .rollout import RolloutSettings, rollout_step

        rs = RolloutSettings(
            abs_tol=settings.abs_tol, rel_tol=settings.rel_tol,
            time_step=dt, integrator=settings.integrator,
            max_steps_per_second=settings.max_steps_per_second,
            max_substeps=settings.max_substeps)
        integ = lambda x, u: rollout_step(model, x, u, dt, rs)  # noqa: E731

    def stage_cost(k, x, u):
        return ocp.stage_cost_value(
            model, params, x, u, refs.x_nom[k], refs.contact_flags[k],
            refs.foot_pos_ref[k], refs.foot_vel_ref[k],
        )

    def rollout_closed(xs_bar, us_bar, Ks, kffs, alpha):
        """Nonlinear rollout with feedback; returns (xs, us, cost, eq_metric)."""
        def step(x, inp):
            k, xb, ub, K, kff = inp
            u = ub + alpha * kff + K @ (x - xb)
            c = stage_cost(k, x, u) * dt
            g, mask = ocp.eq_constraints(
                model, params, x, u, refs.contact_flags[k],
                refs.foot_pos_ref[k], refs.foot_vel_ref[k],
            )
            x_next = integ(x, u)
            return x_next, (x, u, c, jnp.abs(g * mask).sum())

        ks = jnp.arange(N)
        x_last, (xs, us, cs, gs) = jax.lax.scan(
            step, x_init, (ks, xs_bar[:-1], us_bar, Ks, kffs)
        )
        xs_full = jnp.concatenate([xs, x_last[None]], axis=0)
        return xs_full, us, cs.sum(), gs.sum() / N

    def iteration(carry, _):
        xs, us = carry

        # --- linearize along the trajectory (one batched SoA pass) ---
        (xnext, A, B, cost_k, qx, qu, Qxx, Quu, Qux, g, C, D, gmask) = (
            ocp.knot_linearization_batch(
                model, params, xs[:N], us, refs.x_nom[:N],
                refs.contact_flags[:N], refs.foot_pos_ref[:N],
                refs.foot_vel_ref[:N], dt,
            )
        )
        qx, qu, Qxx, Quu, Qux = jax.tree.map(
            lambda a: dt * a, (qx, qu, Qxx, Quu, Qux)
        )
        C = C * gmask[..., None]
        D = D * gmask[..., None]

        # --- projection (same fixed-shape scheme as sqp) ---
        eye_u = jnp.eye(nu, dtype=dtype)

        def project(A_, B_, qx_, qu_, Qxx_, Quu_, Qux_, g_, C_, D_, m_):
            DDt = (D_ @ D_.T + jnp.diag(1.0 - m_)
                   + settings.proj_reg * jnp.eye(D_.shape[0], dtype=dtype))
            from ..ops.linalg import gj_inverse
            Dp = D_.T @ gj_inverse(DDt)  # SPD: no-pivot GJ, TPU-friendly
            P = eye_u - Dp @ D_
            E = -Dp @ C_
            e = -Dp @ g_
            Qe = Quu_ @ e + qu_
            qx_t = qx_ + E.T @ Qe + Qux_.T @ e
            qw = P @ Qe
            Qxx_t = Qxx_ + E.T @ Quu_ @ E + E.T @ Qux_ + Qux_.T @ E
            sigma = 1.0 + jnp.trace(Quu_) / nu
            Qww = P @ Quu_ @ P + sigma * (eye_u - P) + settings.hess_reg * eye_u
            Qwx = P @ (Quu_ @ E + Qux_)
            A_t = A_ + B_ @ E
            B_t = B_ @ P
            return A_t, B_t, qx_t, qw, Qxx_t, Qww, Qwx, E, e, P

        (A_t, B_t, qx_t, qw, Qxx_t, Qww, Qwx, E, e0, P) = jax.vmap(project)(
            A, B, qx, qu, Qxx, Quu, Qux, g, C, D, gmask
        )

        # DDP: no defects (single shooting) -> d = 0
        lq = riccati.StageLQ(
            A=A_t, B=B_t, d=jnp.zeros((N, nx), dtype), Qxx=Qxx_t, Qww=Qww,
            Qwx=Qwx, qx=qx_t, qw=qw,
        )
        S0 = jnp.zeros((nx, nx), dtype)
        s0 = jnp.zeros(nx, dtype)
        Kw, kw, _, _ = riccati.backward_scan(lq, S0, s0, settings.hess_reg)

        # map the w-space policy back to u-space:
        #   du = e + E dx + P (Kw dx + kw)  ->  K = E + P Kw, kff = e + P kw
        Ks = E + jnp.einsum("kij,kjl->kil", P, Kw)
        kffs = e0 + jnp.einsum("kij,kj->ki", P, kw)

        # --- multi-alpha nonlinear rollouts in parallel ---
        alphas = jnp.asarray(settings.alphas, dtype)
        roll = jax.vmap(lambda a: rollout_closed(xs, us, Ks, kffs, a))
        xs_a, us_a, cost_a, eq_a = roll(alphas)
        cost0, eq0 = stage_total(xs, us)

        merit_a = cost_a + 10.0 * eq_a
        merit0 = cost0 + 10.0 * eq0
        finite = jnp.isfinite(merit_a)
        accept = (merit_a < merit0) & finite
        idx = jnp.argmax(accept)
        any_ok = jnp.any(accept)
        best = jnp.where(any_ok, idx, jnp.argmin(jnp.where(finite, merit_a, jnp.inf)))
        xs_new = jax.tree.map(lambda a: a[best], xs_a)
        us_new = jax.tree.map(lambda a: a[best], us_a)
        # keep old trajectory if nothing improved and nothing is finite
        keep = ~jnp.any(finite)
        xs_new = jnp.where(keep, xs, xs_new)
        us_new = jnp.where(keep, us, us_new)
        return (xs_new, us_new), alphas[best] * jnp.where(any_ok, 1.0, 0.0)

    def stage_total(xs, us):
        cs = jax.vmap(lambda k: stage_cost(k, xs[k], us[k]) * dt)(jnp.arange(N))
        gs = jax.vmap(
            lambda k: jnp.abs(
                ocp.eq_constraints(
                    model, params, xs[k], us[k], refs.contact_flags[k],
                    refs.foot_pos_ref[k], refs.foot_vel_ref[k],
                )[0]
            ).sum()
        )(jnp.arange(N))
        return cs.sum(), gs.sum() / N

    # re-close feasibility from the warm start: open-loop rollout of us_ws
    def reroll(x, inp):
        u = inp
        return integ(x, u), x

    x_last, xs0 = jax.lax.scan(reroll, x_init, us_ws)
    xs_feasible = jnp.concatenate([xs0, x_last[None]], axis=0)

    (xs_fin, us_fin), alphas_hist = jax.lax.scan(
        iteration, (xs_feasible, us_ws), None, length=settings.n_iterations
    )
    cost_fin, eq_fin = stage_total(xs_fin, us_fin)
    return SqpSolution(
        times=refs.times,
        states=xs_fin,
        inputs=jnp.concatenate([us_fin, us_fin[-1:]], axis=0),
        cost=cost_fin,
        constraint_violation=eq_fin,
        step_size=alphas_hist[-1],
    )
