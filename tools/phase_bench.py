"""Phase-level TPU timing of the batched MPC step — CHAINED measurement.

Round-3 correction: the round-2 numbers in this tool's history were taken
with one device dispatch per repetition, which through the axon tunnel adds
~25 ms of host-RPC wall time to EVERY phase (tools/planner_prof.py measured
24.5-27.4 ms for planner sub-stages whose device compute differs by an order
of magnitude — the constant IS the dispatch).  Every phase is now timed as a
K-step data-dependent chain inside one jit (the carry feeds the next step's
inputs, so XLA cannot hoist the body), and the per-step time is the chained
wall divided by K — the same discipline CLAUDE.md mandates for single-solve
latency, applied to the phase profile.

Phases at BENCH_B (default 128), 66 knots:
  - full_mpc_step      : prepare_references + warm start + SQP solve
  - prepare_references : gait/swing/IK/interp reference pipeline alone
  - sqp_solve          : solve alone (fixed reference bundles)
  - linearization      : the fused per-knot jacobian pass alone
  - merit_x2           : the model-preselected line search's 2 exact merit
                         rollouts (the production configuration)
Residual = sqp_solve - linearization - merit_x2 ~ projection + Riccati +
forward sweep.  Prints one JSON line per phase.

Usage: python tools/phase_bench.py   (run in background; new HLOs compile
slowly through the axon tunnel — results stream as they finish).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from __graft_entry__ import _build  # noqa: E402
from hunter_bipedal_control_tpu.ocp import problem as ocp  # noqa: E402
from hunter_bipedal_control_tpu.solver import mpc as mpc_mod, sqp  # noqa: E402

B = int(os.environ.get("BENCH_B", "128"))
REPS = int(os.environ.get("BENCH_REPS", "5"))
K = int(os.environ.get("BENCH_CHAIN", "8"))

m, settings, params, pcfg, dj, x0, sched, target = _build(n_intervals=66, horizon=1.0)
state = mpc_mod.init_mpc_state(m, settings)
N = settings.n_intervals
dt = settings.horizon / N
xs_b = jnp.tile(x0[None], (B, 1)) + 0.001 * jnp.arange(B, dtype=x0.dtype)[:, None]


PHASES = os.environ.get("BENCH_PHASES", "").split(",") if \
    os.environ.get("BENCH_PHASES") else None


def timeit_chain(name, step, carry0):
    """step: carry -> (carry, scalar).  Times K chained steps in one jit."""
    if PHASES is not None and name not in PHASES:
        return

    @jax.jit
    def run(c):
        def body(c, _):
            return step(c)
        c, outs = jax.lax.scan(body, c, None, length=K)
        return outs.sum()

    # vary the input per repetition: the axon tunnel has been observed to
    # serve a stale future for REPEATED identical (executable, buffer)
    # calls (measures ~0.01 ms/step, physically impossible through a
    # ~25 ms-dispatch tunnel) — a fresh leading leaf per rep defeats it
    def perturbed(i):
        leaves, treedef = jax.tree.flatten(carry0)
        leaves = [leaves[0] + jnp.asarray(1e-9 * (i + 1), leaves[0].dtype)] \
            + leaves[1:]
        return jax.tree.unflatten(treedef, leaves)

    jax.block_until_ready(run(carry0))
    inputs = [perturbed(i) for i in range(REPS)]
    jax.block_until_ready(inputs)
    t0 = time.perf_counter()
    for c in inputs:
        jax.block_until_ready(run(c))
    ms = (time.perf_counter() - t0) / (REPS * K) * 1e3
    print(json.dumps({"phase": name, "ms_per_batch": round(ms, 2),
                      "B": B, "chain": K}), flush=True)


# ---- full step: next initial state = one-step-ahead policy state ----
def full_step(xs):
    def one(x):
        sol, _, _ = mpc_mod.mpc_step(
            m, settings, params, pcfg, state, sched, target, 0.0, x,
            jnp.zeros(6, x.dtype), dj)
        return sol.states[1], sol.cost
    nxt, costs = jax.vmap(one)(xs)
    return nxt, costs.sum()


timeit_chain("full_mpc_step", full_step, xs_b)


# ---- prepare_references alone (carry: x perturbed by the bundle) ----
def prep_step(xs):
    def one(x):
        bundle, _, _, _ = mpc_mod.prepare_references(
            m, settings, pcfg, state.planner, sched, target, 0.0, x,
            jnp.zeros(6, x.dtype), dj)
        return bundle
    bundles = jax.vmap(one)(xs)
    s = jnp.sum(bundles.x_nom) + jnp.sum(bundles.foot_pos_ref)
    return xs + 1e-12 * s, s


timeit_chain("prepare_references", prep_step, xs_b)


# ---- fixed bundles + warm starts for the solver-side phases ----
def one_prep(x):
    bundle, _, _, _ = mpc_mod.prepare_references(
        m, settings, pcfg, state.planner, sched, target, 0.0, x,
        jnp.zeros(6, x.dtype), dj)
    return bundle


bundles = jax.jit(jax.vmap(one_prep))(xs_b)
xs_ws, us_ws = jax.jit(jax.vmap(
    lambda b, x: sqp.initializer_trajectories(m, settings, b, x)))(bundles, xs_b)
jax.block_until_ready((xs_ws, us_ws))


def solve_step_with(s):
    def solve_step(xs):
        def one(b, x, xw, uw):
            return sqp.solve(m, s, params, b, x, xw, uw).cost
        costs = jax.vmap(one)(bundles, xs, xs_ws, us_ws)
        return xs + 1e-12 * costs[:, None], costs.sum()
    return solve_step


timeit_chain("sqp_solve", solve_step_with(settings), xs_b)
# line-search ablation: 2-rollout 'model' and 6-rollout 'exhaustive'
# variants of the same solve (the production default is settings.linesearch)
timeit_chain("sqp_solve_model2",
             solve_step_with(settings._replace(linesearch="model")), xs_b)
timeit_chain("sqp_solve_exh6",
             solve_step_with(settings._replace(linesearch="exhaustive")), xs_b)
timeit_chain("sqp_solve_rpar",
             solve_step_with(settings._replace(riccati_parallel=True)), xs_b)


def lin_step(carry):
    xw, uw = carry

    def one(xw_, uw_):
        out = jax.vmap(
            lambda k: ocp.knot_linearization_fused(
                m, params, xw_[k], uw_[k], bundles.x_nom[0, k],
                bundles.contact_flags[0, k], bundles.foot_pos_ref[0, k],
                bundles.foot_vel_ref[0, k], dt)
        )(jnp.arange(N))
        return sum(jnp.sum(o) for o in out)

    s = jax.vmap(one)(xw, uw).sum()
    return (xw + 1e-15 * s, uw + 1e-15 * s), s


timeit_chain("linearization", lin_step, (xs_ws, us_ws))


def merit_step(carry):
    """2 exact merit rollouts — the model-preselected line search's cost."""
    xw, uw = carry

    def em(b, xs_, us_):
        costs, xnext, eq = jax.vmap(
            lambda k: ocp.stage_merit_fused(
                m, params, xs_[k], us_[k], b.x_nom[k], b.contact_flags[k],
                b.foot_pos_ref[k], b.foot_vel_ref[k], dt)
        )(jnp.arange(N))
        return dt * costs.sum() + jnp.abs(xs_[1:] - xnext).sum() + jnp.abs(eq).sum()

    def one(b, xw_, uw_):
        m1 = em(b, xw_, uw_)
        m2 = em(b, xw_ * 0.999, uw_ * 0.999)
        return m1 + m2

    s = jax.vmap(one)(bundles, xw, uw).sum()
    return (xw + 1e-15 * s, uw + 1e-15 * s), s


timeit_chain("merit_x2", merit_step, (xs_ws, us_ws))


def merit_soa_step(carry):
    """ONE SoA-backend merit rollout — what the production solve
    (lin_backend='soa') actually evaluates per line-search candidate."""
    xw, uw = carry

    def one(b, xs_, us_):
        costs, xnext, eq = ocp.stage_merit_batch(
            m, params, xs_[:N], us_, b.x_nom[:N], b.contact_flags[:N],
            b.foot_pos_ref[:N], b.foot_vel_ref[:N], dt)
        return dt * costs.sum() + jnp.abs(xs_[1:] - xnext).sum() + jnp.abs(eq).sum()

    s = jax.vmap(one)(bundles, xw, uw).sum()
    return (xw + 1e-15 * s, uw + 1e-15 * s), s


timeit_chain("merit_soa_x1", merit_soa_step, (xs_ws, us_ws))


# ---- planner + IK sub-split of prepare_references ----
from hunter_bipedal_control_tpu.refs import swing_planner as swp  # noqa: E402


def planner_step(xs):
    def one(x):
        feet = mpc_mod._current_feet(m, x)
        refs, _ = swp.update_planner(pcfg, state.planner, sched, target, 0.0,
                                     settings.horizon, jnp.zeros(6, x.dtype),
                                     feet)
        return sum(jnp.sum(leaf) for leaf in jax.tree.leaves(refs))
    s = jax.vmap(one)(xs).sum()
    return xs + 1e-12 * s, s


timeit_chain("prep_swing_planner", planner_step, xs_b)


def jref_step(xs):
    def one(x):
        feet = mpc_mod._current_feet(m, x)
        refs, _ = swp.update_planner(pcfg, state.planner, sched, target, 0.0,
                                     settings.horizon, jnp.zeros(6, x.dtype),
                                     feet)
        n_samples = int(settings.horizon / mpc_mod.JOINT_REF_STEP) + 1
        tt = mpc_mod._joint_reference(m, target, refs, 0.0, settings.horizon,
                                      x, dj, n_samples)
        return jnp.sum(tt.states)
    s = jax.vmap(one)(xs).sum()
    return xs + 1e-12 * s, s


timeit_chain("prep_planner_plus_ik", jref_step, xs_b)


# ============ round-5 sub-phases: projection & Riccati chain ============
# The round-4 corrected attribution left ~31 ms of the 65 ms B=128 solve in
# "projection + Riccati + forward sweep + model selection".  These phases
# split that residual and A/B the round-5 candidates (fused wide matmuls,
# NS iteration budget, NS 3-pass precision, GJ tableau solve).
_R5 = ("proj_only", "proj_nopivot", "proj_vpu", "riccati_ns20",
       "riccati_ns12", "riccati_ns12_high", "riccati_gj", "riccati_ns12_vpu",
       "riccati_ns8_vpu", "riccati_ns20_vpu", "sqp_solve_gj",
       "sqp_solve_ns12h", "sqp_solve_fast", "sqp_solve_vpu")
if PHASES is None or any(p in PHASES for p in _R5):
    from hunter_bipedal_control_tpu.solver import riccati as ric

    def _lin_one(b, xw, uw):
        # dense-tile kernel: same outputs as the SoA pass (oracle-tested),
        # far smaller HLO — this is measurement SETUP, not a timed phase
        out = jax.vmap(
            lambda k: ocp.knot_linearization_fused(
                m, params, xw[k], uw[k], b.x_nom[k], b.contact_flags[k],
                b.foot_pos_ref[k], b.foot_vel_ref[k], dt)
        )(jnp.arange(N))
        return out

    LIN = jax.jit(jax.vmap(_lin_one))(bundles, xs_ws, us_ws)
    (xn_l, A_l, B_l, c_l, qx_l, qu_l, Qxx_l, Quu_l, Qux_l, g_l, C_l, D_l,
     mask_l) = LIN
    defects_l = xn_l - xs_ws[:, 1:]
    qx_l, qu_l, Qxx_l, Quu_l, Qux_l = jax.tree.map(
        lambda a: dt * a, (qx_l, qu_l, Qxx_l, Quu_l, Qux_l))
    C_l = C_l * mask_l[..., None]
    D_l = D_l * mask_l[..., None]
    jax.block_until_ready(A_l)

    def proj_variant(name, s_):
        def proj_step(qx_c):
            out = jax.vmap(jax.vmap(lambda *a: sqp.project_knot(s_, *a)))(
                A_l, B_l, defects_l, qx_c, qu_l, Qxx_l, Quu_l, Qux_l, g_l,
                C_l, D_l, mask_l)
            s = sum(jnp.sum(o) for o in out[:8])
            return qx_c + 1e-15 * s, s
        timeit_chain(name, proj_step, qx_l)

    proj_variant("proj_only", settings)
    proj_variant("proj_nopivot", settings._replace(proj_pivot=False))
    proj_variant("proj_vpu", settings._replace(small_mm="vpu",
                                               proj_pivot=False))

    PROJ = jax.jit(jax.vmap(jax.vmap(
        lambda *a: sqp.project_knot(settings, *a))))(
        A_l, B_l, defects_l, qx_l, qu_l, Qxx_l, Quu_l, Qux_l, g_l, C_l, D_l,
        mask_l)
    (A_t, B_t, d_t, qx_t, qw_t, Qxx_t, Qww_t, Qwx_t, E_t, e_t, P_t) = PROJ
    jax.block_until_ready(A_t)
    nxd = A_t.shape[-1]

    def riccati_variant(name, **kw):
        def step(d_c):
            def one(A_, B_, d_, Qxx_, Qww_, Qwx_, qx_, qw_):
                lq = ric.StageLQ(A=A_, B=B_, d=d_, Qxx=Qxx_, Qww=Qww_,
                                 Qwx=Qwx_, qx=qx_, qw=qw_)
                Ks, kffs, _, _ = ric.backward_scan(
                    lq, jnp.zeros((nxd, nxd), d_.dtype),
                    jnp.zeros(nxd, d_.dtype), settings.hess_reg, **kw)
                return jnp.sum(Ks) + jnp.sum(kffs)
            s = jax.vmap(one)(A_t, B_t, d_c, Qxx_t, Qww_t, Qwx_t, qx_t,
                              qw_t).sum()
            return d_c + 1e-15 * s, s
        timeit_chain(name, step, d_t)

    riccati_variant("riccati_ns20")
    riccati_variant("riccati_ns12", ns_iters=12)
    riccati_variant("riccati_ns12_high", ns_iters=12, precision="high")
    riccati_variant("riccati_gj", solver="gj")
    riccati_variant("riccati_ns12_vpu", ns_iters=12, mm="vpu")
    riccati_variant("riccati_ns8_vpu", ns_iters=8, mm="vpu")
    riccati_variant("riccati_ns20_vpu", mm="vpu")

    timeit_chain("sqp_solve_gj",
                 solve_step_with(settings._replace(riccati_solver="gj")),
                 xs_b)
    timeit_chain("sqp_solve_ns12h",
                 solve_step_with(settings._replace(
                     riccati_ns_iters=12, riccati_ns_precision="high")),
                 xs_b)
    timeit_chain("sqp_solve_fast",
                 solve_step_with(settings._replace(
                     small_mm="vpu", proj_pivot=False, riccati_ns_iters=12,
                     riccati_ns_precision="high")),
                 xs_b)
    # full NS accuracy, VPU routing (bsmm iterations are cheap)
    timeit_chain("sqp_solve_vpu",
                 solve_step_with(settings._replace(
                     small_mm="vpu", proj_pivot=False)),
                 xs_b)

print("done", flush=True)
