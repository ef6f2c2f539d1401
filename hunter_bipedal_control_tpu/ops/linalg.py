"""TPU-friendly small dense linear algebra.

XLA's LU/Cholesky on TPU are row-sequential and dominate the runtime of
every small (16-44 dim) factorization in the control stack (measured:
one batched 22x22 `jnp.linalg.solve` costs ~1 ms at B=128 — more than the
entire surrounding arithmetic).  These routines replace factorizations with
pure matmul iterations that the MXU executes at full rate:

  * `ns_inverse`   — Newton-Schulz iteration X <- X(2I - AX), quadratic
                     convergence from the classic ||A||_1 ||A||_inf init.
  * `spd_solve`    — NS inverse + one iterative-refinement step (recovers
                     f32 accuracy even if the iteration is truncated).

For well-conditioned SPD systems (everything in this framework is
regularized to kappa <~ 1e6) 12-16 iterations reach f32 roundoff.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def ns_inverse(A, iters: int = 16, spd: bool = True, precision=None,
               mm: str = "mxu"):
    """Approximate inverse of a (batched) square matrix via Newton-Schulz.

    For SPD inputs a symmetric Jacobi equilibration D^-1/2 A D^-1/2 is
    applied first — the control stack's matrices (Huu, KKT Schur blocks)
    owe most of their condition number to diagonal scale disparity, and the
    scaled iterate then converges in ~16 iterations.  Init
    X0 = A~^T/(||A~||_1 ||A~||_inf) guarantees contraction; each iteration
    squares the residual.

    ``precision`` overrides the matmul precision of the ITERATION only
    (e.g. 'high' = 3-pass bf16): the iteration is self-correcting, so
    callers that follow with f32-'highest' iterative refinement
    (spd_solve) can run it cheaper without losing solve accuracy.
    """
    n = A.shape[-1]
    if spd:
        d = jnp.clip(jnp.diagonal(A, axis1=-2, axis2=-1), 1e-12, None)
        s = 1.0 / jnp.sqrt(d)                      # (..., n)
        As = A * s[..., :, None] * s[..., None, :]
    else:
        s = None
        As = A
    a1 = jnp.sum(jnp.abs(As), axis=-2, keepdims=True).max(axis=-1, keepdims=True)
    ainf = jnp.sum(jnp.abs(As), axis=-1, keepdims=True).max(axis=-2, keepdims=True)
    X = jnp.swapaxes(As, -1, -2) / (a1 * ainf + 1e-30)
    eye2 = 2.0 * jnp.eye(n, dtype=A.dtype)
    dot = bsmm if mm == "vpu" else (
        lambda a, b: jnp.matmul(a, b, precision=precision))
    for _ in range(iters):
        X = dot(X, eye2 - dot(As, X))
    if spd:
        X = X * s[..., :, None] * s[..., None, :]
    return X


def spd_solve(A, b, iters: int = 20, refine: int = 2, precision=None,
              mm: str = "mxu"):
    """Solve A x = b for SPD (batched) A via NS inverse + iterative
    refinement.  b may be a vector (..., n) or matrix (..., n, k).

    ``precision`` applies to the NS iteration only; the refinement
    residuals stay at the ambient ('highest') matmul precision — they are
    the accuracy anchor that recovers f32 solves from a cheap inverse.
    ``mm='vpu'`` routes every product through bsmm (exact f32 broadcast
    contraction — see bsmm); refinement then needs no separate anchor."""
    X = ns_inverse(A, iters, precision=precision, mm=mm)
    dot = bsmm if mm == "vpu" else jnp.matmul
    vec = b.ndim == A.ndim - 1
    if vec:
        b = b[..., None]
    x = dot(X, b)
    for _ in range(refine):
        x = x + dot(X, b - dot(A, x))
    return x[..., 0] if vec else x


def gj_solve(A, b):
    """Solve A x = b for (batched) SPD A by unrolled NO-PIVOT Gauss-Jordan
    on the augmented tableau [A | b] — n rank-1 updates of pure vectorized
    arithmetic, zero matmuls, zero factorizations.

    For SPD matrices elimination without pivoting is backward-stable (the
    Schur-complement diagonals stay positive), so no argmax/one-hot
    bookkeeping is needed — inside a lax.scan body (the Riccati backward
    recursion) this trades the Newton-Schulz matmul chain (~40 small
    padded matmuls) for n cheap VPU steps.  b: (..., n) or (..., n, k)."""
    n = A.shape[-1]
    vec = b.ndim == A.ndim - 1
    if vec:
        b = b[..., None]
    M = jnp.concatenate([A, b], axis=-1)  # (..., n, n+k)
    for k in range(n):
        piv_row = M[..., k, :] / M[..., k, k:k + 1]
        col = M[..., :, k]
        col = col.at[..., k].set(0.0)
        M = M - col[..., :, None] * piv_row[..., None, :]
        M = M.at[..., k, :].set(piv_row)
    x = M[..., :, n:]
    return x[..., 0] if vec else x


def bsmm(a, b):
    """Batched SMALL matmul on the VPU: broadcast-multiply + reduce instead
    of lax.dot_general.

    For operand dims <= ~48 the MXU path pads each (22-dim) operand to
    128-lane tiles and, at f32-'highest', runs 6 bf16 passes per product —
    a batched (8448, 22, 16)@(16, 45) matmul measures ~7 ms on v5e while
    its actual flops are ~0.1 ms of VPU work.  The broadcast form keeps the
    contraction in full-width elementwise lanes (XLA fuses the multiply
    into the reduce) and is exact f32 (no bf16 passes).  Use ONLY for
    small trailing dims; MXU wins as dims approach tile size."""
    return jnp.sum(a[..., :, :, None] * b[..., None, :, :], axis=-2)


def inv3(M):
    """Closed-form (batched) 3x3 inverse via the adjugate — zero
    factorizations, pure elementwise/MXU arithmetic."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    cof = jnp.stack(
        [
            jnp.stack([A, -(b * i - c * h), b * f - c * e], axis=-1),
            jnp.stack([B, a * i - c * g, -(a * f - c * d)], axis=-1),
            jnp.stack([C, -(a * h - b * g), a * e - b * d], axis=-1),
        ],
        axis=-2,
    )
    return cof / det[..., None, None]


def gj_inverse(A, pivot: bool = True):
    """(Batched) SPD inverse by unrolled Gauss-Jordan with DIAGONAL
    pivoting.

    For symmetric positive (semi)definite matrices, choosing the largest
    remaining Schur-complement diagonal is equivalent to complete pivoting
    (the max element of an SPD matrix sits on the diagonal), so this matches
    LAPACK-grade stability on the near-singular projection Grams while
    staying pure vectorized arithmetic: XLA's `jnp.linalg.inv` lowers to
    row-sequential pivoted LU + two triangular solves on TPU, whereas this
    is n (argmax + rank-1 tableau update) steps that batch perfectly.

    Because the pivot (row p, col p) is always diagonal, each step consumes
    row p and column p together and the left block converges to the exact
    identity with NO permutation bookkeeping."""
    n = A.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)
    M = jnp.concatenate([A, eye], axis=-1)  # (..., n, 2n)
    if not pivot:
        for k in range(n):
            piv_row = M[..., k, :] / M[..., k, k:k + 1]
            col = M[..., :, k]
            col = col.at[..., k].set(0.0)
            M = M - col[..., :, None] * piv_row[..., None, :]
            M = M.at[..., k, :].set(piv_row)
        return M[..., :, n:]

    done = jnp.zeros(A.shape[:-2] + (n,), dtype=A.dtype)  # 1 = already pivoted
    tiny = jnp.asarray(1e-30, A.dtype)
    for _ in range(n):
        diag = jnp.diagonal(M[..., :, :n], axis1=-2, axis2=-1)  # (..., n)
        score = jnp.abs(diag) - done * jnp.inf
        p = jnp.argmax(score, axis=-1)
        oh = jax.nn.one_hot(p, n, dtype=A.dtype)               # (..., n)
        prow = jnp.einsum("...i,...ij->...j", oh, M)            # row p
        pval = jnp.einsum("...i,...i->...", oh, prow[..., :n])  # M[p, p]
        prow = prow / (pval[..., None] + tiny)
        col = jnp.einsum("...ij,...j->...i", M[..., :, :n], oh)  # column p
        col = col * (1.0 - oh)                                   # skip pivot row
        M = M - col[..., :, None] * prow[..., None, :]
        M = M * (1.0 - oh[..., :, None]) + oh[..., :, None] * prow[..., None, :]
        done = done + oh
    return M[..., :, n:]


def spd_inverse(A, iters: int = 14, refine: int = 1):
    """Refined inverse (for projector construction)."""
    X = ns_inverse(A, iters)
    n = A.shape[-1]
    eye = jnp.eye(n, dtype=A.dtype)
    for _ in range(refine):
        X = X + X @ (eye - A @ X)
    return X
