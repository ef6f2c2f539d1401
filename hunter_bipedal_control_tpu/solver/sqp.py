"""Multiple-shooting SQP over the centroidal OCP — the TPU-native engine
replacing OCS2's SqpSolver + HPIPM (reference configuration
task.info:79-96: dt 0.015, 1 iteration, RK2 sensitivity integrator,
projectStateInputEqualityConstraints=true, relaxed-barrier inequalities).

Design (SURVEY.md §2.3 "SqpMpc" row):
  - per-knot linearization of dynamics/cost/constraints via jax.jacfwd,
    vmapped across the horizon (the reference uses 4 CPU threads; here one
    fused batched kernel),
  - state-input equality constraints eliminated by a fixed-shape *projection*
    (masked pseudo-inverse + null-space projector, instead of OCS2's
    variable-size QR basis — see §7.4 of SURVEY.md),
  - LQ subproblem solved by a Riccati backward pass under lax.scan,
  - parallel-evaluated line search (all step sizes tried in one vmap, OCS2's
    FilterLinesearch acceptance logic).

Everything is fixed-shape: one jit compiles the entire solve; vmap over the
leading axis batches thousands of scenarios onto the MXU.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.centroidal import flow_map
from ..models.robot import RobotModel
from ..ocp import problem as ocp
from . import riccati

# ---------------------------------------------------------------------------
# settings / containers
# ---------------------------------------------------------------------------


class SqpSettings(NamedTuple):
    """Static solver configuration (sqp block of task.info)."""

    n_intervals: int = 53          # ~0.8 s / 0.015
    horizon: float = 0.8
    n_iterations: int = 1
    proj_reg: float = 1e-6         # projection pseudo-inverse regularization
    hess_reg: float = 1e-6         # Levenberg shift on Quu
    riccati_parallel: bool = False  # associative-scan (O(log N) depth) Riccati
    g_max: float = 1e-2
    g_min: float = 1e-6
    alphas: tuple = (1.0, 0.5, 0.25, 0.125, 0.0625, 0.03125)
    armijo_factor: float = 1e-4
    # 'model' (default): pre-select alpha on the free Gauss-Newton quadratic
    # model (predicted cost) + linear contraction (predicted violation), then
    # exact-evaluate only the chosen alpha and a quarter-step fallback —
    # 2 merit rollouts instead of 6.  'model1': drop the fallback probe too
    # (1 rollout; the exact filter guards the single candidate — a rejected
    # step degenerates to alpha=0, keeping the warm start, and the next
    # 10 ms re-solve retries).  'exhaustive': exact merit at every alpha
    # (strict OCS2 FilterLinesearch parity; tests assert the modes accept
    # the same steps on the MPC path).
    # ROUND-4 MEASUREMENT NOTE (the 1-rollout variant was VERDICT r3 #5):
    # with the SoA fused merit the rollouts are nearly free IN CONTEXT —
    # chained B=128 TPU A/B (tools/phase_bench.py sqp_solve_* phases):
    # model1 65.16 ms, model 65.73, exhaustive 66.67; a standalone SoA
    # merit rollout is 6.3 ms but overlaps almost entirely inside the
    # solve.  The round-3 "merit = 34 ms of 73.4" attribution measured the
    # standalone DENSE merit kernel, not the in-solve SoA cost.  'model'
    # therefore stays the default (the fallback probe is robustness at
    # ~0.6 ms); the residual headroom is the projection/Riccati/forward
    # chain (~32 ms of the 65 ms solve), not the line search.
    # When the model rejects every alpha, the exact evaluation probes the
    # model-best alpha rather than alpha_min; a mid-range step the
    # exhaustive filter would accept can still be missed in pathological
    # cases — tests/test_linesearch_parity.py bounds the divergence on
    # randomized scenarios (including the 1-rollout mode).
    linesearch: str = "model"
    # Riccati Huu-solve knobs (round 5; see riccati.backward_scan):
    #   riccati_solver    'ns' = Newton-Schulz + refinement (matmul chain),
    #                     'gj' = no-pivot Gauss-Jordan tableau (VPU rank-1
    #                     updates, zero matmuls — SPD-stable).
    #   riccati_ns_iters / riccati_ns_refine: NS iteration/refinement counts.
    #   riccati_ns_precision: matmul precision of the NS ITERATION only
    #     ('highest' = ambient 6-pass f32; 'high' = 3-pass — safe because
    #     the refinement residuals stay at ambient precision).
    riccati_solver: str = "ns"
    riccati_ns_iters: int = 20
    riccati_ns_refine: int = 2
    riccati_ns_precision: str = "highest"
    # Small-matmul routing for the projection + Riccati chain: 'mxu'
    # (lax.dot_general) or 'vpu' (ops.linalg.bsmm broadcast contraction —
    # exact f32, avoids 128-lane tile padding + 6-pass bf16 on 22-dim
    # operands).  Round-5 TPU A/B (tools/phase_bench.py, B=128, 66 knots):
    # projection 52.8 -> 4.7 ms, Riccati scan 21.1 -> 6.4 ms, full
    # sqp_solve 69.8 -> 12.5 ms — 'vpu' is the default.
    small_mm: str = "vpu"
    # Projection Gram inverse pivoting: the DDt Gram is SPD with unit
    # diagonal on masked rows (O(1) conditioned), so no-pivot GJ is
    # bitwise-stable here (CPU equivalence check: identical outputs) and
    # default; diagonal pivoting remains available for ill-conditioned
    # row sets.
    proj_pivot: bool = False
    # Linearization/merit kernel implementation.  'soa': the scalarized
    # SoA core (models/soa.py) — fastest on TPU (full-width elementwise
    # fusion) but emits ~600k lines of HLO, which the CPU backend compiles
    # for minutes; 'dense': vmapped knot_linearization_fused /
    # stage_merit_fused over (3,)/(3,3) tiles — identical outputs
    # (oracle-tested), ~10x smaller HLO.  The multichip CPU dryrun and
    # CPU-tier tests can select 'dense'; TPU benches keep 'soa'.
    lin_backend: str = "soa"


class ReferenceBundle(NamedTuple):
    """Per-knot reference data prepared outside the solver (N+1 knots)."""

    times: jnp.ndarray          # (N+1,)
    x_nom: jnp.ndarray          # (N+1, nx)
    contact_flags: jnp.ndarray  # (N+1, 4)
    foot_pos_ref: jnp.ndarray   # (N+1, 4, 3)
    foot_vel_ref: jnp.ndarray   # (N+1, 4, 3)


class SqpSolution(NamedTuple):
    times: jnp.ndarray     # (N+1,)
    states: jnp.ndarray    # (N+1, nx)
    inputs: jnp.ndarray    # (N+1, nu)  (last row repeats N-1)
    cost: jnp.ndarray      # scalar
    constraint_violation: jnp.ndarray  # scalar (defect + eq residual 1-norm)
    step_size: jnp.ndarray  # accepted alpha of last iteration


# ---------------------------------------------------------------------------
# discretization
# ---------------------------------------------------------------------------


def rk2_step(model: RobotModel, x, u, dt):
    """Explicit trapezoidal RK2 (OCS2 SensitivityIntegratorType::RK2)."""
    k1 = flow_map(model, x, u)
    k2 = flow_map(model, x + dt * k1, u)
    return x + 0.5 * dt * (k1 + k2)


# ---------------------------------------------------------------------------
# constraint projection
# ---------------------------------------------------------------------------


def project_knot(settings: SqpSettings, A_, B_, d_, qx_, qu_, Qxx_, Quu_,
                 Qux_, g_, C_, D_, mask_):
    """Eliminate the state-input equality rows at one knot by a fixed-shape
    projection (OCS2's projectStateInputEqualityConstraints, QR basis
    replaced by a masked pseudo-inverse; SURVEY.md §7.4).

    du = e + E dx + P w with P = I - D^+ D (symmetric null-space
    projector), and the LQ data is rewritten in the reduced variable w.
    Masked (inactive) rows carry a unit diagonal so the m x m Gram inverse
    stays O(1)-conditioned in f32.

    Round-5 structure: the dozen nx/nu-sized products are grouped into
    FOUR wide matmuls —
      X  = D^+ @ [g C D]           -> e, E, P in one product
      YQ = Quu @ [e E P]           -> all Quu-weighted columns
      BU = B   @ [e E P]           -> d_t, A_t, B_t updates
      T  = [E P]' @ [Qe QuuE Qux QuuP] -> every Gram block (qx_t, qw,
                                          Qxx_t, Qwx, Qww) at once
    — same flops, ~3x fewer MXU dispatches on tile-padded 22-dim operands
    (docs/DESIGN.md round-5 measurement).  settings.small_mm='vpu' routes
    them through ops.linalg.bsmm instead (broadcast contraction)."""
    from ..ops.linalg import bsmm, gj_inverse

    dot = bsmm if settings.small_mm == "vpu" else jnp.matmul
    nu = B_.shape[1]
    nx = A_.shape[0]
    eye_u = jnp.eye(nu, dtype=A_.dtype)
    DDt = (
        dot(D_, D_.T)
        + jnp.diag(1.0 - mask_)
        + settings.proj_reg * jnp.eye(D_.shape[0], dtype=D_.dtype)
    )
    # unrolled diagonal-pivot Gauss-Jordan: DDt is SPD by construction
    Dpinv = dot(D_.T, gj_inverse(DDt, pivot=settings.proj_pivot))  # (nu, m)
    X = dot(Dpinv, jnp.concatenate([g_[:, None], C_, D_], axis=1))
    e = -X[:, 0]
    E = -X[:, 1:1 + nx]                               # (nu, nx)
    P = eye_u - X[:, 1 + nx:]                         # symmetric projector

    U = jnp.concatenate([e[:, None], E, P], axis=1)   # (nu, 1+nx+nu)
    YQ = dot(Quu_, U)
    Qe = YQ[:, 0] + qu_                               # Quu e + qu
    QuuE = YQ[:, 1:1 + nx]
    QuuP = YQ[:, 1 + nx:]
    BU = dot(B_, U)
    d_t = d_ + BU[:, 0]
    A_t = A_ + BU[:, 1:1 + nx]
    B_t = BU[:, 1 + nx:]

    R1 = jnp.concatenate([Qe[:, None], QuuE, Qux_, QuuP], axis=1)
    T = dot(jnp.concatenate([E, P], axis=1).T, R1)    # (nx+nu, 1+2nx+nu)
    TE, TP = T[:nx], T[nx:]
    qx_t = qx_ + TE[:, 0] + dot(Qux_.T, e[:, None])[:, 0]
    qw = TP[:, 0]                                     # P Qe
    EQux = TE[:, 1 + nx:1 + 2 * nx]                   # E' Qux
    Qxx_t = Qxx_ + TE[:, 1:1 + nx] + EQux + EQux.T
    Qwx = TP[:, 1:1 + nx] + TP[:, 1 + nx:1 + 2 * nx]  # P (Quu E + Qux)
    sigma = 1.0 + jnp.trace(Quu_) / nu
    Qww = TP[:, 1 + 2 * nx:] + sigma * (eye_u - P) + settings.hess_reg * eye_u
    return A_t, B_t, d_t, qx_t, qw, Qxx_t, Qww, Qwx, E, e, P


# ---------------------------------------------------------------------------
# solver
# ---------------------------------------------------------------------------


def initializer_trajectories(model: RobotModel, settings: SqpSettings, refs: ReferenceBundle,
                             x_init):
    """LeggedRobotInitializer parity (:49-80): carry the measured state
    forward, weight-compensating inputs from the contact schedule."""
    N = settings.n_intervals
    nx = x_init.shape[0]
    nu = 12 + model.nj
    xs = jnp.tile(x_init[None], (N + 1, 1))
    us = jax.vmap(
        lambda flags: ocp.weight_compensating_input(model, flags, nu, x_init.dtype)
    )(refs.contact_flags[:N])
    return xs, us


def solve(model: RobotModel, settings: SqpSettings, params: ocp.OcpParams,
          refs: ReferenceBundle, x_init, xs_ws, us_ws):
    """One MPC solve: `n_iterations` SQP iterations from the warm start.
    Pure function — jit a closure over (model, settings) at the call site,
    vmap over a leading batch axis for scenario sweeps."""
    N = settings.n_intervals
    dt = settings.horizon / N
    nx = xs_ws.shape[1]
    nu = us_ws.shape[1]

    def knot_linearization_all(xs, us):
        """All per-knot LQ data over the horizon in ONE batched SoA pass
        (ocp.knot_linearization_batch) with dt-scaled cost quadratics.
        lin_backend='dense' swaps in the vmapped dense-tile kernel with
        identical outputs (oracle-tested) but ~10x smaller HLO."""
        if settings.lin_backend == "dense":
            (xnext, A, B, cost, qx, qu, Qxx, Quu, Qux, g, C, D, mask) = jax.vmap(
                lambda x_, u_, xn_, f_, fp_, fv_: ocp.knot_linearization_fused(
                    model, params, x_, u_, xn_, f_, fp_, fv_, dt)
            )(xs[:N], us, refs.x_nom[:N], refs.contact_flags[:N],
              refs.foot_pos_ref[:N], refs.foot_vel_ref[:N])
        else:
            (xnext, A, B, cost, qx, qu, Qxx, Quu, Qux, g, C, D, mask) = (
                ocp.knot_linearization_batch(
                    model, params, xs[:N], us, refs.x_nom[:N],
                    refs.contact_flags[:N], refs.foot_pos_ref[:N],
                    refs.foot_vel_ref[:N], dt,
                )
            )
        if params.collision is not None:
            # self-collision soft term (state-only), assembled at the
            # problem level like the reference (LeggedInterface.cpp:452-490)
            from ..ocp import self_collision as sc
            p_c, qx_c, Qxx_c = sc.collision_quadratic_batch(
                model, params.collision, xs[:N])
            cost, qx, Qxx = cost + p_c, qx + qx_c, Qxx + Qxx_c
        cost, qx, qu, Qxx, Quu, Qux = jax.tree.map(
            lambda a: dt * a, (cost, qx, qu, Qxx, Quu, Qux)
        )
        C = C * mask[..., None]
        D = D * mask[..., None]
        return xnext, A, B, cost, qx, qu, Qxx, Quu, Qux, g, C, D, mask

    def eval_merit(xs, us):
        """(total cost, constraint 1-norm metric) of a trajectory — one
        batched SoA kinematics pass over all N knots (ocp.stage_merit_batch;
        scalarized layout, see models/soa.py)."""
        if settings.lin_backend == "dense":
            costs, xnext, eq_res = jax.vmap(
                lambda x_, u_, xn_, f_, fp_, fv_: ocp.stage_merit_fused(
                    model, params, x_, u_, xn_, f_, fp_, fv_, dt)
            )(xs[:N], us, refs.x_nom[:N], refs.contact_flags[:N],
              refs.foot_pos_ref[:N], refs.foot_vel_ref[:N])
        else:
            costs, xnext, eq_res = ocp.stage_merit_batch(
                model, params, xs[:N], us, refs.x_nom[:N], refs.contact_flags[:N],
                refs.foot_pos_ref[:N], refs.foot_vel_ref[:N], dt,
            )
        if params.collision is not None:
            from ..ocp import self_collision as sc
            costs = costs + sc.collision_penalty_batch(
                model, params.collision, xs[:N])
        defects = xs[1:] - xnext
        g_metric = jnp.abs(defects).sum() / N + jnp.abs(eq_res).sum() / N
        return dt * costs.sum(), g_metric

    def sqp_iteration(carry, _):
        xs, us = carry
        (xnext, A, B, cost_k, qx, qu, Qxx, Quu, Qux, g, C, D, gmask) = (
            knot_linearization_all(xs, us)
        )
        defects = xnext - xs[1:]  # d_k = Phi(x_k,u_k) - x_{k+1}

        # ---- constraint projection (fixed shape; see project_knot) ----
        (A_t, B_t, d_t, qx_t, qw, Qxx_t, Qww, Qwx, E, e0, P) = jax.vmap(
            lambda *a: project_knot(settings, *a)
        )(A, B, defects, qx, qu, Qxx, Quu, Qux, g, C, D, gmask)

        # ---- Riccati backward pass (sequential or parallel-in-time) ----
        lq = riccati.StageLQ(A=A_t, B=B_t, d=d_t, Qxx=Qxx_t, Qww=Qww,
                             Qwx=Qwx, qx=qx_t, qw=qw)
        S_term = jnp.zeros((nx, nx), xs.dtype)  # no terminal cost (ref parity)
        s_term = jnp.zeros(nx, xs.dtype)
        if settings.riccati_parallel:
            Ks, kffs, _, _ = riccati.backward_associative(
                lq, S_term, s_term, settings.hess_reg, mm=settings.small_mm
            )
        else:
            Ks, kffs, _, _ = riccati.backward_scan(
                lq, S_term, s_term, settings.hess_reg,
                ns_iters=settings.riccati_ns_iters,
                ns_refine=settings.riccati_ns_refine,
                precision=(None if settings.riccati_ns_precision == "highest"
                           else settings.riccati_ns_precision),
                solver=settings.riccati_solver,
                mm=settings.small_mm,
            )

        # ---- forward sweep: linear rollout of deltas ----
        dx0 = x_init - xs[0]
        if settings.riccati_parallel:
            # closed-loop affine maps, composed in O(log N) depth
            A_cl = A_t + jnp.einsum("kij,kjl->kil", B_t, Ks)
            b_cl = d_t + jnp.einsum("kij,kj->ki", B_t, kffs)
            dxs_full = riccati.forward_associative(A_cl, b_cl, dx0,
                                                   mm=settings.small_mm)
            ws = jnp.einsum("kij,kj->ki", Ks, dxs_full[:-1]) + kffs
            dus = e0 + jnp.einsum("kij,kj->ki", E, dxs_full[:-1]) + jnp.einsum(
                "kij,kj->ki", P, ws
            )
        else:
            # fused forward rollout: the six per-step matvecs stack into two
            # ([K;E;A] dx and [P;B] w) — same flops, 3x fewer dispatches on
            # tile-padded operands; small_mm='vpu' additionally routes them
            # through the broadcast contraction (see SqpSettings.small_mm)
            from ..ops.linalg import bsmm
            dotv = ((lambda M_, v_: bsmm(M_, v_[..., None])[..., 0])
                    if settings.small_mm == "vpu" else
                    (lambda M_, v_: M_ @ v_))
            KEA = jnp.concatenate([Ks, E, A_t], axis=1)  # (N, 2nu+nx, nx)
            PB = jnp.concatenate([P, B_t], axis=1)       # (N, nu+nx, nu)

            def forward(dx, inp):
                kea, pb, d_, kff, e_ = inp
                r = dotv(kea, dx)                        # [K dx, E dx, A dx]
                w = r[:nu] + kff
                pbw = dotv(pb, w)                        # [P w, B w]
                du = e_ + r[nu:2 * nu] + pbw[:nu]
                dx_next = r[2 * nu:] + pbw[nu:] + d_
                return dx_next, (dx, du)

            dx_last, (dxs, dus) = jax.lax.scan(
                forward, dx0, (KEA, PB, d_t, kffs, e0)
            )
            dxs_full = jnp.concatenate([dxs, dx_last[None]], axis=0)  # (N+1, nx)

        # ---- line search ----
        # baseline merit comes free from the linearization byproducts
        # (stage costs are dt-scaled in knot_linearization, defects/eq
        # residuals are exact primal values)
        cost0 = cost_k.sum()
        g0 = jnp.abs(defects).sum() / N + jnp.abs(g).sum() / N

        def filter_accept(cost_a, g_a, alphas_v):
            """FilterLinesearch acceptance (OCS2 sqp logic):
              high violation  -> must reduce violation
              low violation   -> armijo cost decrease
              medium          -> either"""
            finite = jnp.isfinite(cost_a) & jnp.isfinite(g_a)
            reduce_g = g_a < (1.0 - 1e-3) * g0
            armijo = cost_a < cost0 - settings.armijo_factor * alphas_v * jnp.abs(cost0)
            accept = jnp.where(
                g0 > settings.g_max, reduce_g,
                jnp.where(g0 < settings.g_min, armijo, reduce_g | (cost_a < cost0)),
            )
            return accept & finite

        def candidate(alpha):
            xs_a = xs + alpha * dxs_full
            us_a = us + alpha * dus
            c, g = eval_merit(xs_a, us_a)
            return c, g

        if settings.linesearch in ("model", "model1"):
            # Quadratic (Gauss-Newton) model of the cost along the step and
            # linear contraction of the violation — both free byproducts of
            # the LQ data — pre-select alpha; then exact-evaluate only the
            # chosen alpha and a quarter-step fallback.
            alphas_all = jnp.asarray(settings.alphas, xs.dtype)
            dx_ = dxs_full[:-1]
            c1 = jnp.einsum("ki,ki->", qx, dx_) + jnp.einsum("ki,ki->", qu, dus)
            c2 = (
                jnp.einsum("ki,kij,kj->", dx_, Qxx, dx_)
                + 2.0 * jnp.einsum("ki,kij,kj->", dus, Qux, dx_)
                + jnp.einsum("ki,kij,kj->", dus, Quu, dus)
            )
            cost_m = cost0 + alphas_all * c1 + 0.5 * alphas_all**2 * c2
            g_m = (1.0 - alphas_all) * g0
            accept_m = filter_accept(cost_m, g_m, alphas_all)
            idx_m = jnp.argmax(accept_m)
            # if the model rejects EVERY alpha (essentially only the pure-
            # armijo regime with a model-ascent direction), probe the alpha
            # the model scores best (violation when g0 is high, cost
            # otherwise) instead of blindly taking alpha_min — a mid-range
            # alpha the exhaustive filter would accept is then reachable;
            # the exact filter_accept below still guards acceptance
            score_m = jnp.where(g0 > settings.g_max, g_m, cost_m)
            score_m = jnp.where(jnp.isfinite(score_m), score_m, jnp.inf)
            alpha_hat = jnp.where(jnp.any(accept_m), alphas_all[idx_m],
                                  alphas_all[jnp.argmin(score_m)])
            if settings.linesearch == "model1":
                alphas = alpha_hat[None]
            else:
                alphas = jnp.stack([alpha_hat, 0.25 * alpha_hat])
        else:
            alphas = jnp.asarray(settings.alphas, xs.dtype)

        cost_a, g_a = jax.vmap(candidate)(alphas)
        finite = jnp.isfinite(cost_a) & jnp.isfinite(g_a)
        accept = filter_accept(cost_a, g_a, alphas)
        # pick the largest accepted alpha; fall back to the smallest *finite*
        # alpha, and to a zero step if every candidate diverged (keeps the
        # previous solution — WeightedWbc-style last-solution fallback).
        # 'model1' has no fallback candidate: a rejected step IS the zero
        # step (the exact filter guards the single rollout).
        idx = jnp.argmax(accept)  # first True in order (alphas descending)
        any_ok = jnp.any(accept)
        if settings.linesearch == "model1":
            smallest_finite = jnp.asarray(0.0, xs.dtype)
        else:
            smallest_finite = jnp.where(jnp.any(finite),
                                        alphas[-1] * finite[-1], 0.0)
        alpha = jnp.where(any_ok, alphas[idx], smallest_finite)

        xs_new = xs + alpha * dxs_full
        us_new = us + alpha * dus
        # merit of the accepted point: the chosen candidate's values (or the
        # baseline when the step degenerated to zero) — no extra rollout
        cost_acc = jnp.where(
            alpha > 0.0, jnp.where(any_ok, cost_a[idx], cost_a[-1]), cost0)
        g_acc = jnp.where(
            alpha > 0.0, jnp.where(any_ok, g_a[idx], g_a[-1]), g0)
        return (xs_new, us_new), (alpha, cost_acc, g_acc)

    # statically unrolled iteration loop (n_iterations is 1 in the product
    # config): a lax.scan here compiles to an XLA while loop whose body
    # boundary forces rematerialization copies of the badly-padded
    # small-tensor intermediates (measured 10G+ of padded HLO temps at
    # B=512); straight-line code lets XLA fuse across the iteration
    carry = (xs_ws, us_ws)
    hist = []
    for _ in range(settings.n_iterations):
        carry, h = sqp_iteration(carry, None)
        hist.append(h)
    xs_fin, us_fin = carry
    alphas_hist, costs_hist, gs_hist = (jnp.stack([h[i] for h in hist])
                                        for i in range(3))
    cost_fin, g_fin = costs_hist[-1], gs_hist[-1]

    inputs_full = jnp.concatenate([us_fin, us_fin[-1:]], axis=0)
    return SqpSolution(
        times=refs.times,
        states=xs_fin,
        inputs=inputs_full,
        cost=cost_fin,
        constraint_violation=g_fin,
        step_size=alphas_hist[-1],
    )
