"""Batched dense convex QP solver (primal-dual interior point).

TPU-native replacement for qpOASES' active-set solver used by the WBC
(legged_wbc/src/WeightedWbc.cpp:44-55, HoQp.cpp:170-186).  Active-set
methods are branchy and sequential; an interior-point method with a FIXED
iteration count is branch-free, fixed-shape, and batches perfectly under
vmap — thousands of 38-var WBC QPs become one batched dense factorization
stream on the MXU.

Problem form:
    min 0.5 x'Hx + g'x   s.t.  Aeq x = beq,   Ain x <= bin

Masked rows are supported: a zero row with bin=BIG (inequality) or
beq=0 (equality; plus the dual regularization below) is inert.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class QpSolution(NamedTuple):
    x: jnp.ndarray
    eq_dual: jnp.ndarray
    ineq_dual: jnp.ndarray
    iterations: jnp.ndarray
    primal_residual: jnp.ndarray


def solve_qp(H, g, Aeq, beq, Ain, bin, n_iters: int = 18, eq_reg: float = 1e-8,
             frac_to_boundary: float = 0.99, mu_min: float | None = None,
             x0=None, lam0=None, nu0=None, warm_margin: float = 1e-2):
    """Mehrotra-free path-following PDIP with fixed iteration count.

    All shapes static: H (n,n), Aeq (me,n), Ain (mi,n).  Returns QpSolution.
    Designed to run under vmap (no data-dependent control flow).

    ``mu_min`` floors the barrier parameter so the complementarity scaling
    stays representable — essential in f32, where driving mu below ~1e-6
    corrupts the Newton system (lam/s overflows against rounding noise).

    Warm start (the qpOASES ``setToMPC`` analog, WeightedWbc.cpp:44-55):
    pass the previous solve's primal/duals as ``x0``/``lam0``/``nu0``.
    Slacks are rebuilt from the (possibly slightly infeasible) primal and
    both members of each complementarity pair are floored at
    ``warm_margin`` — a strictly interior restart near the old central
    path, so a handful of iterations re-converges when the QP data moved
    only a tick's worth.  ``warm_margin`` may be a traced scalar (e.g.
    ``where(has_warm, 1e-2, 1.0)``) so cold and warm starts share one trace.
    """
    n = H.shape[0]
    me = Aeq.shape[0]
    mi = Ain.shape[0]
    dtype = H.dtype
    if mu_min is None:
        mu_min = float(jnp.finfo(dtype).eps) * 50.0

    # initial point: x=0, slacks from residuals (clamped), duals 1 — or a
    # recentred warm start from the previous tick's solution
    x = jnp.zeros(n, dtype) if x0 is None else x0
    s = jnp.maximum(bin - Ain @ x, 1.0 if x0 is None else warm_margin)
    lam = (jnp.ones(mi, dtype) if lam0 is None
           else jnp.maximum(lam0, warm_margin))
    nu_eq = jnp.zeros(me, dtype) if nu0 is None else nu0
    lam = lam.astype(dtype)
    s = s.astype(dtype)

    eye_e = jnp.eye(me, dtype=dtype)

    def kkt_solve(x, s, lam, nu_eq, sigma_mu):
        """One Newton step on the perturbed KKT system, eliminating (s, lam)."""
        # residuals
        r_dual = H @ x + g + Aeq.T @ nu_eq + Ain.T @ lam
        r_eq = Aeq @ x - beq
        r_ineq = Ain @ x + s - bin
        # complementarity target
        r_cent = lam * s - sigma_mu

        # eliminate (ds, dlam):  ds = -r_ineq - Ain dx,
        #   dlam = ((lam r_ineq - r_cent) + lam Ain dx)/s
        s_safe = jnp.maximum(s, 1e-12)
        w = lam / s_safe
        Hbar = H + Ain.T @ (w[:, None] * Ain)
        rbar = r_dual + Ain.T @ ((lam * r_ineq - r_cent) / s_safe)

        # block elimination via two Cholesky factorizations (TPU-friendly:
        # SPD 38x38 + SPD me x me instead of an indefinite (n+me) LU):
        #   Hbar dx + Aeq' dnu = -rbar
        #   Aeq dx - eq_reg dnu = -r_eq
        L = jnp.linalg.cholesky(Hbar + 1e-7 * jnp.trace(Hbar) / n * jnp.eye(n, dtype=dtype))
        solve_h = lambda r: jax.scipy.linalg.cho_solve((L, True), r)
        HiA = solve_h(Aeq.T)                        # (n, me)
        Hir = solve_h(rbar)                         # (n,)
        Schur = Aeq @ HiA + eq_reg * eye_e
        Ls = jnp.linalg.cholesky(Schur)
        dnu = jax.scipy.linalg.cho_solve((Ls, True), r_eq - Aeq @ Hir)
        dx = -Hir - HiA @ dnu
        ds = -r_ineq - Ain @ dx
        dlam = -(r_cent + lam * ds) / s_safe
        return dx, ds, dlam, dnu

    def body(carry, _):
        x, s, lam, nu_eq, it = carry
        mu = jnp.dot(s, lam) / mi
        sigma = 0.2
        dx, ds, dlam, dnu = kkt_solve(x, s, lam, nu_eq, jnp.maximum(sigma * mu, mu_min))

        # fraction-to-boundary step length (vector-safe, branch-free)
        neg_s = jnp.where(ds < 0, -frac_to_boundary * s / jnp.minimum(ds, -1e-12), 1.0)
        neg_l = jnp.where(dlam < 0, -frac_to_boundary * lam / jnp.minimum(dlam, -1e-12), 1.0)
        alpha = jnp.minimum(1.0, jnp.minimum(neg_s.min(), neg_l.min()))

        x = x + alpha * dx
        s = jnp.maximum(s + alpha * ds, 1e-12)
        lam = jnp.maximum(lam + alpha * dlam, 1e-12)
        nu_eq = nu_eq + alpha * dnu
        return (x, s, lam, nu_eq, it + 1), None

    (x, s, lam, nu_eq, its), _ = jax.lax.scan(
        body, (x, s, lam, nu_eq, jnp.asarray(0, jnp.int32)), None, length=n_iters
    )
    primal_res = jnp.maximum(
        jnp.abs(Aeq @ x - beq).max() if me > 0 else 0.0,
        jnp.maximum(Ain @ x - bin, 0.0).max() if mi > 0 else 0.0,
    )
    return QpSolution(x=x, eq_dual=nu_eq, ineq_dual=lam, iterations=its,
                      primal_residual=primal_res)
