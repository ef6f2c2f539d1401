"""Riccati backward sweeps: sequential scan and parallel associative scan.

The reference's HPIPM solves the LQ subproblem with a sequential Riccati
recursion (SURVEY.md §2.3).  TPU-native, the recursion is expressed two
ways:

  * `backward_scan` — lax.scan, O(N) depth: best for large scenario
    batches (each step is a well-utilized batched matmul).
  * `backward_associative` — jax.lax.associative_scan over Redheffer
    star-products of per-stage value-function maps, O(log N) depth: the
    "ring-attention analog" for the horizon axis (SURVEY.md §5), cutting
    the sequential-latency floor for the real-time single-scenario path.

Derivation of the element algebra (standard discrete-time scattering form):
stage k defines the affine two-point relation between (x_k, lambda_k) and
(x_{k+1}, lambda_{k+1}):

    x_{k+1}  = F x_k - C lambda_{k+1} + c
    lambda_k = X x_k + F' lambda_{k+1} + q

with F = A - B Qww^-1 Qwx, C = B Qww^-1 B', X = Qxx - Qwx' Qww^-1 Qwx,
c = d - B Qww^-1 qw, q = qx - Qwx' Qww^-1 qw  (cross terms and linear input
cost eliminated by completing the square).  Composition of two adjacent
relations eliminates the interior (x, lambda) pair and is associative:

    W  = (I + C1 X2)^-1
    F  = F2 W F1
    C  = C2 + F2 W C1 F2'
    X  = X1 + F1' X2 W F1
    c  = c2 + F2 W (c1 - C1 q2)
    q  = q1 + F1' (I + X2 C1)^-1 (q2 + X2 c1)

The value function then reads off as S_k = X, s_k = q of the suffix
composite (terminal element: F=0, C=0, X=S_N, q=s_N).  Gains are recovered
per-knot in parallel from (S_{k+1}, s_{k+1}).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.linalg import bsmm, gj_solve, spd_solve


class StageLQ(NamedTuple):
    """Per-knot LQ data after projection (leading axis = knots)."""

    A: jnp.ndarray     # (N, nx, nx)
    B: jnp.ndarray     # (N, nx, nu)
    d: jnp.ndarray     # (N, nx)
    Qxx: jnp.ndarray   # (N, nx, nx)
    Qww: jnp.ndarray   # (N, nu, nu)  (PD)
    Qwx: jnp.ndarray   # (N, nu, nx)
    qx: jnp.ndarray    # (N, nx)
    qw: jnp.ndarray    # (N, nu)


def backward_scan(lq: StageLQ, S_term, s_term, reg: float, use_ns: bool = True,
                  ns_iters: int = 20, ns_refine: int = 2, precision=None,
                  solver: str = "ns", mm: str = "mxu"):
    """Sequential Riccati (lax.scan), returns (Ks, kffs, Ss, ss).

    ``use_ns`` replaces the TPU-hostile LU solve of Huu with the
    Newton-Schulz matmul iteration (ops/linalg.py) — the Jacobi-equilibrated
    Huu of this problem sits at condition ~1e2 (measured), well inside NS
    range, and the swap removes the dominant per-step latency.

    Scan-body structure (round 5): all S-propagation products are fused
    into two WIDE matmuls per step — SM = S @ [A B d|s] (nx x nx+nu+1)
    and H = [A B]^T @ SM — instead of six nx-by-nx ones: fewer, better-
    utilized MXU dispatches for the same flops (the 22-dim operands pad to
    (8,128) tiles either way; the wide grouping amortizes that padding).
    ``solver`` selects the Huu solve: 'ns' (Newton-Schulz + refinement,
    knobs ns_iters/ns_refine/precision — see ops/linalg.spd_solve) or
    'gj' (no-pivot Gauss-Jordan tableau: n VPU rank-1 updates, zero
    matmuls — SPD-stable since the Schur diagonals stay positive).
    ``mm='vpu'`` routes the scan-body products through ops.linalg.bsmm
    (broadcast contraction — exact f32, no MXU tile padding)."""
    nx = lq.A.shape[1]
    nu = lq.B.shape[2]

    # per-knot constants of the fused products, built once outside the scan
    M_all = jnp.concatenate([lq.A, lq.B, lq.d[..., None]], axis=2)  # (N,nx,nx+nu+1)
    ABt_all = jnp.concatenate(
        [jnp.swapaxes(lq.A, -1, -2), jnp.swapaxes(lq.B, -1, -2)], axis=1
    )  # (N, nx+nu, nx)

    dot = bsmm if mm == "vpu" else jnp.matmul

    def backward(carry, inp):
        S, s = carry
        M_, ABt_, Qxx_, Qww_, Qwx_, qx_, qw_ = inp
        SM = dot(S, M_)                                # [SA, SB, Sd]
        SM = SM.at[:, -1].add(s)                       # last col -> Sd + s
        H = dot(ABt_, SM)                              # (nx+nu, nx+nu+1)
        Huu = Qww_ + H[nx:, nx:nx + nu]
        shift = reg * (1.0 + jnp.trace(Huu) / nu)
        Huu = Huu + shift * jnp.eye(nu, dtype=S.dtype)
        Hux = Qwx_ + H[nx:, :nx]
        hu = qw_ + H[nx:, -1]
        rhs = jnp.concatenate([Hux, hu[:, None]], axis=1)
        if solver == "gj":
            Kk = -gj_solve(Huu, rhs)
        elif use_ns:
            Kk = -spd_solve(Huu, rhs, iters=ns_iters, refine=ns_refine,
                            precision=precision, mm=mm)
        else:
            Kk = -jnp.linalg.solve(Huu, rhs)
        K, kff = Kk[:, :nx], Kk[:, nx]
        HK = dot(Hux.T, Kk)                            # [Hux'K, Hux'kff]
        S_new = Qxx_ + H[:nx, :nx] + HK[:, :nx]
        S_new = 0.5 * (S_new + S_new.T)
        s_new = qx_ + H[:nx, -1] + HK[:, nx]
        return (S_new, s_new), (K, kff, S, s)

    (_, _), (Ks, kffs, Ss_next, ss_next) = jax.lax.scan(
        backward, (S_term, s_term),
        (M_all, ABt_all, lq.Qxx, lq.Qww, lq.Qwx, lq.qx, lq.qw),
        reverse=True,
    )
    return Ks, kffs, Ss_next, ss_next


def _stage_elements(lq: StageLQ, reg: float, mm: str = "mxu"):
    """Build scattering elements (F, C, X, c, q) per stage (vmapped)."""
    nu = lq.B.shape[2]
    dot = bsmm if mm == "vpu" else jnp.matmul

    def one(A, B, d, Qxx, Qww, Qwx, qx, qw):
        shift = reg * (1.0 + jnp.trace(Qww) / nu)
        Qr = Qww + shift * jnp.eye(nu, dtype=A.dtype)
        rhs = jnp.concatenate([Qwx, qw[:, None], B.T], axis=1)
        if mm == "vpu":
            iQ = spd_solve(Qr, rhs, mm="vpu")
        else:
            L = jnp.linalg.cholesky(Qr)
            iQ = jax.scipy.linalg.cho_solve((L, True), rhs)
        iQwx = iQ[:, : A.shape[0]]
        iqw = iQ[:, A.shape[0]]
        iBt = iQ[:, A.shape[0] + 1:]
        F = A - dot(B, iQwx)
        C = dot(B, iBt)
        X = Qxx - dot(Qwx.T, iQwx)
        X = 0.5 * (X + X.T)
        c = d - dot(B, iqw[:, None])[:, 0]
        q = qx - dot(Qwx.T, iqw[:, None])[:, 0]
        return F, C, X, c, q

    return jax.vmap(one)(lq.A, lq.B, lq.d, lq.Qxx, lq.Qww, lq.Qwx, lq.qx, lq.qw)


def _combine(e2, e1, use_ns: bool = True, mm: str = "mxu"):
    """Star product combine.  NOTE: with associative_scan(reverse=True) the
    operator receives (later, earlier) suffix pieces; e1 is the earlier
    (left) element, e2 the later (right) composite.

    (I + C1 X2) has eigenvalues >= 1 (product of PSD matrices), so the
    matmul-only Newton-Schulz inverse applies; it keeps every combine round
    factorization-free (7 parallel rounds for a 66-knot horizon)."""
    from ..ops.linalg import ns_inverse

    dot = bsmm if mm == "vpu" else jnp.matmul
    F1, C1, X1, c1, q1 = e1
    F2, C2, X2, c2, q2 = e2
    n = F1.shape[-1]
    eye = jnp.eye(n, dtype=F1.dtype)
    M = eye + dot(C1, X2)
    if use_ns:
        W = ns_inverse(M, iters=18, spd=False, mm=mm)
        # two refinement rounds (quadratic cleanup of the truncated iteration)
        W = W + dot(W, eye - dot(M, W))
        W = W + dot(W, eye - dot(M, W))
    else:
        W = jnp.linalg.solve(M, eye)
    F2W = dot(F2, W)
    F = dot(F2W, F1)
    C = C2 + dot(dot(F2W, C1), F2.T)
    X2W = dot(X2, W)
    X = X1 + dot(F1.T, dot(X2W, F1))
    X = 0.5 * (X + X.T)
    c = c2 + dot(F2W, (c1 - dot(C1, q2[..., None])[..., 0])[..., None])[..., 0]
    q = q1 + dot(F1.T, dot(W.T, (q2 + dot(X2, c1[..., None])[..., 0])[..., None]))[..., 0]
    return (F, C, X, c, q)


def backward_associative(lq: StageLQ, S_term, s_term, reg: float,
                         mm: str = "mxu"):
    """Parallel-in-time Riccati via associative scan. Same outputs as
    backward_scan (up to regularization-path differences).  mm='vpu'
    routes every product through ops.linalg.bsmm — at B=1 this made the
    O(log N)-depth path WIN over the sequential scan for the first time
    (2.91 vs 3.85 ms chained solve, docs/DESIGN.md round 5)."""
    N, nx = lq.A.shape[0], lq.A.shape[1]
    nu = lq.B.shape[2]
    dtype = lq.A.dtype

    F, C, X, c, q = _stage_elements(lq, reg, mm=mm)
    # append the terminal element
    Fz = jnp.concatenate([F, jnp.zeros((1, nx, nx), dtype)])
    Cz = jnp.concatenate([C, jnp.zeros((1, nx, nx), dtype)])
    Xz = jnp.concatenate([X, S_term[None]])
    cz = jnp.concatenate([c, jnp.zeros((1, nx), dtype)])
    qz = jnp.concatenate([q, s_term[None]])

    def comb(a, b):
        # reverse scan: a is the later suffix composite, b the earlier
        # element.  The combine itself stays on the MXU regardless of mm:
        # the B=1 A/B measured 2.91 ms (mxu combine) vs 3.61 (vpu combine)
        # — the star products are (66, 22, 22) batched matmul chains deep
        # inside a log-depth scan, where the broadcast form's extra
        # reduction latency outweighs the padding saving.
        return jax.vmap(lambda a_, b_: _combine(a_, b_, mm="mxu"))(a, b)

    Fs, Cs, Xs, cs, qs = jax.lax.associative_scan(
        comb, (Fz, Cz, Xz, cz, qz), reverse=True
    )
    # suffix composite starting at knot k -> value function at knot k
    Ss = Xs  # (N+1, nx, nx); Ss[k] = S_k
    ss = qs

    # recover gains in parallel from S_{k+1}, s_{k+1}
    dot = bsmm if mm == "vpu" else jnp.matmul

    def gains(A, B, d, Qww, Qwx, qw, S_next, s_next):
        SM = dot(S_next, jnp.concatenate([A, B, d[:, None]], axis=1))
        SM = SM.at[:, -1].add(s_next)
        H = dot(B.T, SM)
        Huu = Qww + H[:, nx:nx + nu]
        shift = reg * (1.0 + jnp.trace(Huu) / nu)
        Huu = Huu + shift * jnp.eye(nu, dtype=dtype)
        Hux = Qwx + H[:, :nx]
        hu = qw + H[:, -1]
        Kk = -spd_solve(Huu, jnp.concatenate([Hux, hu[:, None]], axis=1),
                        mm=mm)
        return Kk[:, :nx], Kk[:, nx]

    Ks, kffs = jax.vmap(gains)(
        lq.A, lq.B, lq.d, lq.Qww, lq.Qwx, lq.qw, Ss[1:], ss[1:]
    )
    return Ks, kffs, Ss[1:], ss[1:]


def forward_associative(A_cl, b_cl, dx0, mm: str = "mxu"):
    """Parallel-in-time linear rollout: dx_{k+1} = A_cl[k] dx_k + b_cl[k]
    via associative composition of affine maps (O(log N) depth).

    Returns dxs (N+1, nx) including dx0."""
    dot = bsmm if mm == "vpu" else jnp.matmul

    def combine(e1, e2):
        # e1 earlier, e2 later (forward scan order)
        M1, v1 = e1
        M2, v2 = e2
        return (dot(M2, M1), dot(M2, v1[..., None])[..., 0] + v2)

    Ms, vs = jax.lax.associative_scan(
        lambda a, b: jax.vmap(combine)(a, b), (A_cl, b_cl)
    )
    dxs_tail = jnp.einsum("kij,j->ki", Ms, dx0) + vs
    return jnp.concatenate([dx0[None], dxs_tail], axis=0)
